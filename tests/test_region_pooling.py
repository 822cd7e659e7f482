"""Parity tests for patchioner_tpu.ops.region_pooling.

Each oracle below re-executes the *semantics* of the reference math
(src/bbox_utils.py, src/model.py:45-94,1049-1054) as literal per-box Python
loops in torch, then we assert the vectorized JAX ops match.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from patchioner_tpu.ops import region_pooling as rp


# ---------------------------------------------------------------- oracles


def oracle_bbox_feats(
    patch_embeddings,
    bboxes,
    gaussian_avg=False,
    gaussian_bbox_variance=0.5,
    single=False,
    patch_size=14,
    attention_map=None,
):
    """Literal re-execution of the reference per-box loop semantics."""
    N = patch_embeddings.shape[0]
    n_boxes = bboxes.shape[1]
    grid = int(patch_embeddings.shape[1] ** 0.5)
    bboxes = torch.div(bboxes, patch_size, rounding_mode="floor").int()
    pe = patch_embeddings.view(N, grid, grid, -1)
    if attention_map is not None:
        attention_map = attention_map.clone().view(N, grid, grid)
    total_w = torch.zeros(N, grid, grid)
    x1, y1, w, h = bboxes.unbind(-1)
    x2, y2 = x1 + w, y1 + h
    means = []
    for i in range(N):
        row = []
        for j in range(n_boxes):
            if bboxes[i, j].sum().item() < 0 and single:
                continue
            region = pe[i, y1[i, j] : y2[i, j] + 1, x1[i, j] : x2[i, j] + 1, :]
            hs, ws = region.shape[:2]
            if attention_map is not None:
                pw = attention_map[i, y1[i, j] : y2[i, j] + 1, x1[i, j] : x2[i, j] + 1]
                pw /= pw.sum()  # in-place: later overlapping boxes see this
                total_w[i, y1[i, j] : y2[i, j] + 1, x1[i, j] : x2[i, j] + 1] += pw
                m = (region * pw.unsqueeze(-1)).sum(dim=(0, 1))
            elif gaussian_avg:
                yc, xc = torch.meshgrid(
                    torch.linspace(-1, 1, hs), torch.linspace(-1, 1, ws), indexing="ij"
                )
                if gaussian_bbox_variance == 0:
                    pw = torch.zeros(hs, ws)
                    cy = hs // 2 if hs % 2 == 1 else hs // 2 - 1  # 'low' choice
                    cx = ws // 2 if ws % 2 == 1 else ws // 2 - 1
                    pw[cy, cx] = 1.0
                else:
                    pw = torch.exp(-(xc**2 + yc**2) / gaussian_bbox_variance)
                    pw = pw / pw.sum()
                total_w[i, y1[i, j] : y2[i, j] + 1, x1[i, j] : x2[i, j] + 1] += pw
                m = (region * pw.unsqueeze(-1)).sum(dim=(0, 1))
            else:
                pw = torch.ones(hs, ws) / (hs * ws)
                total_w[i, y1[i, j] : y2[i, j] + 1, x1[i, j] : x2[i, j] + 1] += pw
                m = region.mean(dim=(0, 1))
            row.append(m)
        if not single:
            means.append(torch.stack(row))
    total_w = total_w / total_w.sum(dim=(1, 2), keepdim=True)
    if not single:
        return torch.stack(means)
    return (total_w.unsqueeze(-1) * pe).sum(dim=(1, 2))


def oracle_region_means(patch_embeddings, variance):
    N = patch_embeddings.shape[0]
    grid = int(patch_embeddings.shape[1] ** 0.5)
    pe = patch_embeddings.view(N, grid, grid, -1)
    y = torch.linspace(-1, 1, grid)
    yy, xx = torch.meshgrid(y, y, indexing="ij")
    if variance == 0:
        w = torch.zeros(N, grid, grid)
        c = grid // 2 if grid % 2 == 1 else grid // 2 - 1  # 'low' choice
        w[:, c, c] = 1.0
    elif variance >= 100:
        w = torch.full((N, grid, grid), 1.0 / (grid * grid))
    else:
        ww = torch.exp(-(xx**2 + yy**2) / variance)
        w = (ww / ww.sum()).unsqueeze(0).expand(N, -1, -1)
    return (pe * w.unsqueeze(-1)).sum(dim=(1, 2))


def oracle_trace_grid(traces, n_patch):
    grid = torch.zeros((n_patch, n_patch))
    for t in traces:
        x, y = t["x"], t["y"]
        if 0 <= x <= 1 and 0 <= y <= 1:
            gx, gy = int(x * n_patch), int(y * n_patch)
            grid[min(gy, n_patch - 1), min(gx, n_patch - 1)] += 1
    return grid


# ----------------------------------------------------------------- helpers

G = 9  # small grid for tests
D = 16
PATCH = 14


def random_boxes(rng, b, nb, grid=G, patch=PATCH):
    """Pixel-space [x1, y1, w, h] boxes inside a grid*patch image."""
    img = grid * patch
    x1 = rng.uniform(0, img - patch, (b, nb))
    y1 = rng.uniform(0, img - patch, (b, nb))
    w = rng.uniform(1, img - x1 - 1, (b, nb))
    h = rng.uniform(1, img - y1 - 1, (b, nb))
    return np.stack([x1, y1, w, h], -1).astype(np.float32)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((3, G * G, D)).astype(np.float32)
    boxes = random_boxes(rng, 3, 4)
    attn = rng.uniform(0.01, 1.0, (3, G * G)).astype(np.float32)
    return tokens, boxes, attn


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.5),
        dict(gaussian_avg=True, gaussian_bbox_variance=2.0),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.0),
    ],
)
def test_bbox_features_parity(data, kwargs):
    tokens, boxes, _ = data
    want = oracle_bbox_feats(
        torch.from_numpy(tokens), torch.from_numpy(boxes.copy()), patch_size=PATCH, **kwargs
    ).numpy()
    got = rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH, **kwargs
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.5),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.0),
    ],
)
def test_bbox_features_parity_edge_clipped_boxes(kwargs):
    """Boxes touching the image edge get their weight span CLIPPED at the
    grid like the reference's torch slicing (src/bbox_utils.py:44 slices
    region_patches, :57-62 builds linspace over the CLIPPED shape). The
    reference's own adjust_bbox_for_transform clamps w = crop - x1, so
    edge-touching boxes are common in real evals."""
    rng = np.random.default_rng(7)
    tokens = rng.standard_normal((2, G * G, D)).astype(np.float32)
    img = G * PATCH
    boxes = np.array(
        [
            # x1+w == img and y1+h == img: nominal grid span G+1, clipped G
            [[0.0, 0.0, img, img],
             [20.0, 30.0, img - 20.0, img - 30.0]],
            # clip on one axis only; and a 1-patch sliver at the far edge
            [[0.0, 14.0, img, 28.0],
             [img - 14.0, img - 14.0, 14.0, 14.0]],
        ],
        dtype=np.float32,
    )
    want = oracle_bbox_feats(
        torch.from_numpy(tokens), torch.from_numpy(boxes.copy()),
        patch_size=PATCH, **kwargs
    ).numpy()
    got = rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH, **kwargs
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_bbox_features_attention_parity_with_overlap(data):
    tokens, boxes, attn = data
    # Force overlaps: duplicate box 0 into slot 1 so the in-place
    # normalization aliasing is exercised.
    boxes = boxes.copy()
    boxes[:, 1] = boxes[:, 0]
    want = oracle_bbox_feats(
        torch.from_numpy(tokens),
        torch.from_numpy(boxes.copy()),
        patch_size=PATCH,
        attention_map=torch.from_numpy(attn.copy()),
    ).numpy()
    got = rp.extract_bbox_features(
        jnp.asarray(tokens),
        jnp.asarray(boxes),
        patch_size=PATCH,
        attention_map=jnp.asarray(attn),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("gaussian", [False, True])
def test_bbox_single_embedding_parity(data, gaussian):
    tokens, boxes, _ = data
    # Add a dummy (negative) box that must be skipped.
    boxes = boxes.copy()
    boxes[:, 2] = np.array([-100.0, -100.0, -1.0, -1.0], np.float32)
    want = oracle_bbox_feats(
        torch.from_numpy(tokens),
        torch.from_numpy(boxes.copy()),
        patch_size=PATCH,
        gaussian_avg=gaussian,
        single=True,
    ).numpy()
    got = rp.extract_bbox_features_single(
        jnp.asarray(tokens),
        jnp.asarray(boxes),
        patch_size=PATCH,
        gaussian_avg=gaussian,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_bbox_single_attention_parity_with_overlap_and_dummy(data):
    """The single+attention path (forward(get_controllable_capts=True,
    use_attn_map_for_bboxes=True) — bbox_utils.py's merged
    total_patch_weights with attention weights) vs the literal oracle,
    with a forced overlap (exercises the in-place per-box normalization
    aliasing) and a trailing dummy row (must contribute nothing)."""
    tokens, boxes, attn = data
    boxes = boxes.copy()
    boxes[:, 1] = boxes[:, 0]  # overlap: slot 1 duplicates slot 0
    want = oracle_bbox_feats(
        torch.from_numpy(tokens),
        torch.from_numpy(boxes.copy()),
        patch_size=PATCH,
        single=True,
        attention_map=torch.from_numpy(attn.copy()),
    ).numpy()
    got = rp.extract_bbox_features_single(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH,
        attention_map=jnp.asarray(attn),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    # dummy padding row on top must not change the merged embedding
    padded = np.concatenate(
        [boxes, np.full((boxes.shape[0], 1, 4), -1.0, np.float32)], axis=1
    )
    got_pad = rp.extract_bbox_features_single(
        jnp.asarray(tokens), jnp.asarray(padded), patch_size=PATCH,
        attention_map=jnp.asarray(attn),
    )
    np.testing.assert_allclose(np.asarray(got_pad), want, rtol=2e-4,
                               atol=2e-5)


def test_even_center_high_and_random_variants(data):
    """even_center='high' picks the other central patch; 'random' draws the
    two axes INDEPENDENTLY (reference random.choice per axis,
    bbox_utils.py:70-71) — every draw must be one of the four (low/high ×
    low/high) centers, and across keys both axes must vary."""
    tokens, _, _ = data
    # grid span = w//patch + 1 (inclusive slice), so w = 3·PATCH gives an
    # EVEN span of 4: grid box y∈[2,5], x∈[1,4]; the two central candidates
    # per axis are start+1 ('low') and start+2 ('high')
    boxes = np.tile(
        np.array([[14.0, 28.0, 3 * PATCH, 3 * PATCH]], np.float32),
        (tokens.shape[0], 1, 1),
    )
    kwargs = dict(patch_size=PATCH, gaussian_avg=True,
                  gaussian_bbox_variance=0.0)
    lo = np.asarray(rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), even_center="low", **kwargs))
    hi = np.asarray(rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), even_center="high", **kwargs))
    pe = tokens.reshape(tokens.shape[0], G, G, -1)
    y0, x0 = 28 // PATCH, 14 // PATCH  # grid starts: 2, 1
    np.testing.assert_allclose(lo[:, 0], pe[:, y0 + 1, x0 + 1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hi[:, 0], pe[:, y0 + 2, x0 + 2],
                               rtol=1e-5, atol=1e-6)
    assert np.abs(lo - hi).max() > 1e-3  # the two centers genuinely differ
    import jax as _jax

    cands = {
        (dy, dx): pe[:, y0 + 1 + dy, x0 + 1 + dx]
        for dy in (0, 1) for dx in (0, 1)
    }
    seen = set()
    for s in range(12):
        r = np.asarray(rp.extract_bbox_features(
            jnp.asarray(tokens), jnp.asarray(boxes), even_center="random",
            key=_jax.random.PRNGKey(s), **kwargs))
        # per-image draws may differ; check each image row independently
        for i in range(tokens.shape[0]):
            mi = next(
                (k for k, v in cands.items()
                 if np.allclose(r[i, 0], v[i], rtol=1e-5, atol=1e-6)),
                None,
            )
            assert mi is not None, (s, i)
            seen.add(mi)
    # both axes vary across draws (independent per-axis choice)
    assert {d for d, _ in seen} == {0, 1}, seen
    assert {d for _, d in seen} == {0, 1}, seen


@pytest.mark.parametrize("variance", [0.0, 1.0, 150.0, 0.5])
def test_region_means_parity(data, variance):
    tokens, _, _ = data
    want = oracle_region_means(torch.from_numpy(tokens), variance).numpy()
    got = rp.compute_region_means(jnp.asarray(tokens), variance)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_traces_to_grid_parity():
    rng = np.random.default_rng(1)
    # Include out-of-range points that must be dropped, and boundary 1.0.
    pts = rng.uniform(-0.2, 1.2, (40, 2)).astype(np.float32)
    pts[0] = [1.0, 1.0]
    traces = [{"x": float(x), "y": float(y)} for x, y in pts]
    want = oracle_trace_grid(traces, G).numpy()
    got = rp.traces_to_grid(
        jnp.asarray(pts)[None], jnp.ones((1, len(pts))), G
    )[0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_trace_pool_matches_reference_mean_semantics(data):
    tokens, _, attn = data
    rng = np.random.default_rng(2)
    grid = rng.integers(0, 3, (3, G, G)).astype(np.float32)
    # Reference: (w.unsqueeze(-1) * patches.view(b,g,g,d)).mean(dim=(1,2))
    pe = torch.from_numpy(tokens).view(3, G, G, D)
    want = (torch.from_numpy(grid).unsqueeze(-1) * pe).mean(dim=(1, 2)).numpy()
    got = rp.trace_pool(jnp.asarray(tokens), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    # With attention weighting
    want2 = (
        (torch.from_numpy(grid * attn.reshape(3, G, G)).unsqueeze(-1) * pe)
        .mean(dim=(1, 2))
        .numpy()
    )
    got2 = rp.trace_pool(jnp.asarray(tokens), jnp.asarray(grid), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=2e-5, atol=2e-5)


def test_ctx_cleaner():
    rng = np.random.default_rng(3)
    d = rng.standard_normal((2, 5, 8)).astype(np.float32)
    c = rng.standard_normal((2, 8)).astype(np.float32)
    dt, ct = torch.from_numpy(d), torch.from_numpy(c).unsqueeze(1)
    proj = (dt @ ct.transpose(-1, -2)) / (torch.norm(ct, dim=-1, keepdim=True) ** 2)
    want = (dt - 0.7 * proj * ct).numpy()
    got = rp.ctx_cleaner(jnp.asarray(d), jnp.asarray(c), "orthogonal_projection", 0.7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    mask = 1 - ct / (torch.norm(ct, p=2, dim=2, keepdim=True) + 1e-6)
    want2 = (dt * mask).numpy()
    got2 = rp.ctx_cleaner(jnp.asarray(d), jnp.asarray(c), "contrastive_mask")
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-5, atol=1e-5)


def test_bbox_single_attention_mode_dummy_boxes_finite(data):
    """Attention-weighted region-set pooling with the fixed-shape dummy
    padding ([-1]*4 rows): a dummy (or fully-outside) box has an empty
    inside-mask; its weight map must be ZERO, not 0/0=NaN — a NaN map
    poisons the merged map through 0*NaN in the valid-mask einsum and
    corrupts the caption of every padded image."""
    tokens, boxes, attn = data
    boxes = boxes.copy()
    boxes[:, 2] = np.array([-1.0, -1.0, -1.0, -1.0], np.float32)  # dummy
    got = rp.extract_bbox_features_single(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH,
        attention_map=jnp.asarray(attn),
    )
    assert np.isfinite(np.asarray(got)).all()
    # dummy rows contribute nothing: same result without them
    got_clean = rp.extract_bbox_features_single(
        jnp.asarray(tokens), jnp.asarray(boxes[:, [0, 1, 3]]),
        patch_size=PATCH, attention_map=jnp.asarray(attn),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(got_clean),
                               rtol=1e-5, atol=1e-6)


def test_trace_pool_padded_matches_unpadded():
    """trace_pool_padded over a lane-padded token axis is bitwise the
    unpadded trace_pool: the zero-extended pooling weights absorb the
    unpad slice the fusedqkv encoder path otherwise pays (PERF.md r5)."""
    import jax.numpy as jnp
    import numpy as np

    from patchioner_tpu.ops import region_pooling as rp

    rng = np.random.default_rng(0)
    b, g, d, pad = 3, 4, 16, 128 - 16  # 16 real patches padded to a lane
    tokens = rng.standard_normal((b, g * g, d)).astype(np.float32)
    garbage = rng.standard_normal((b, pad, d)).astype(np.float32) * 100
    padded = np.concatenate([tokens, garbage], axis=1)
    grid = rng.random((b, g, g)).astype(np.float32)
    attn = rng.random((b, g * g)).astype(np.float32)

    want = rp.trace_pool(jnp.asarray(tokens), jnp.asarray(grid),
                         jnp.asarray(attn))
    got = rp.trace_pool_padded(jnp.asarray(padded), jnp.asarray(grid),
                               jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # and without attention weighting
    want0 = rp.trace_pool(jnp.asarray(tokens), jnp.asarray(grid))
    got0 = rp.trace_pool_padded(jnp.asarray(padded), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               rtol=1e-6, atol=1e-6)
