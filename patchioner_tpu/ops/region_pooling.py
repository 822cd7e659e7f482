"""Patch-grid region aggregation ops — the functional core of Patchioner-TPU.

Every spatial query (bbox, trace, whole image) reduces to a weighted sum over a
square grid of patch embeddings. The reference implements these as Python
double-loops over (image, box) with dynamic per-box slices
(reference: src/bbox_utils.py:8-109, src/model.py:45-94, src/bbox_utils.py:158-168).
Here each mode is a single batched masked reduction over the full grid — fixed
shapes, one einsum, XLA-fusable, and `vmap`/`shard_map`-friendly.

Semantics notes (validated by tests/test_region_pooling.py against a literal
re-execution of the reference math):

* Boxes are pixel-space ``[x1, y1, w, h]``; grid coords are ``floor(v / patch)``
  and box ends are *inclusive* (``x2 = x1 + w``), so a box spans ``w_grid + 1``
  columns (reference: src/bbox_utils.py:19-34).
* Gaussian weights use ``linspace(-1, 1, span)`` per box axis; a span of 1 maps
  to coordinate ``-1`` (exactly like ``torch.linspace(-1, 1, 1)``)
  (reference: src/bbox_utils.py:57-82).
* Attention-map weighting normalizes the attention *in place* in the reference,
  so later boxes that overlap earlier boxes see already-normalized values
  (reference: src/bbox_utils.py:46-52 — `patch_weights` aliases
  `attention_map`). We reproduce this with a `lax.scan` over boxes.
* Trace pooling divides by the full grid size (``mean`` over all patches), not
  by the weight sum (reference: src/model.py:1054).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "bboxes_to_grid",
    "bbox_weight_maps",
    "extract_bbox_features",
    "extract_bbox_features_single",
    "compute_region_means",
    "traces_to_grid",
    "trace_pool",
    "boxes_to_pixel_masks",
    "ctx_cleaner",
]


def bboxes_to_grid(bboxes: jax.Array, patch_size: int) -> jax.Array:
    """Convert pixel-space ``[x1, y1, w, h]`` boxes to integer grid coords.

    Matches the reference's ``bboxes //= patch_size; bboxes.int()``
    (floor-divide, then truncate) for non-negative boxes; negative (dummy)
    boxes keep a negative sum so they stay detectable.
    """
    return jnp.floor(bboxes / patch_size).astype(jnp.int32)


def _box_inside_mask(grid_boxes: jax.Array, grid_size: int) -> jax.Array:
    """(..., 4) int grid boxes -> (..., G, G) boolean inside-box masks."""
    x1 = grid_boxes[..., 0]
    y1 = grid_boxes[..., 1]
    x2 = x1 + grid_boxes[..., 2]
    y2 = y1 + grid_boxes[..., 3]
    ys = jnp.arange(grid_size, dtype=jnp.int32)
    xs = jnp.arange(grid_size, dtype=jnp.int32)
    in_y = (ys >= y1[..., None]) & (ys <= y2[..., None])  # (..., G)
    in_x = (xs >= x1[..., None]) & (xs <= x2[..., None])  # (..., G)
    return in_y[..., :, None] & in_x[..., None, :]  # (..., G, G)


def _gaussian_box_weights(
    grid_boxes: jax.Array,
    grid_size: int,
    variance: float,
    *,
    even_center: str = "low",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-box Gaussian weight maps over the full grid, normalized per box.

    ``variance == 0`` degenerates to a one-hot at the box center; for
    even spans the reference picks one of the two central patches uniformly at
    random (src/bbox_utils.py:64-72) — here controlled by ``even_center``
    ('low' | 'high' | 'random', 'random' requires ``key``).
    """
    x1 = grid_boxes[..., 0]
    y1 = grid_boxes[..., 1]
    # inclusive end -> span, CLIPPED at the grid edge: the reference slices
    # region_patches with torch indexing (which clips at grid_size) and
    # builds linspace/centers over region_patches.shape — the clipped span
    # (src/bbox_utils.py:44,57-62). A box whose nominal end passes the last
    # row must weight its rows over the clipped extent, not the nominal one.
    wspan = jnp.minimum(grid_boxes[..., 2] + 1, grid_size - x1)
    hspan = jnp.minimum(grid_boxes[..., 3] + 1, grid_size - y1)
    ys = jnp.arange(grid_size, dtype=jnp.float32)
    xs = jnp.arange(grid_size, dtype=jnp.float32)
    inside = _box_inside_mask(grid_boxes, grid_size)

    if variance == 0:
        # One-hot at the central patch.
        def center(start, span, k):
            lo = start + span // 2 - 1
            hi = start + span // 2
            odd = start + (span - 1) // 2
            if even_center == "low":
                even = lo
            elif even_center == "high":
                even = hi
            else:
                if k is None:
                    raise ValueError("even_center='random' requires a PRNG key")
                pick = jax.random.bernoulli(k, 0.5, span.shape)
                even = jnp.where(pick, hi, lo)
            return jnp.where(span % 2 == 1, odd, even)

        # independent per-axis picks (the reference calls random.choice
        # once per axis, src/bbox_utils.py:70-71)
        ky, kx = jax.random.split(key) if key is not None else (None, None)
        cy = center(y1, hspan, ky)
        cx = center(x1, wspan, kx)
        return (
            (ys[:, None] == cy[..., None, None]).astype(jnp.float32)
            * (xs[None, :] == cx[..., None, None]).astype(jnp.float32)
        )

    # linspace(-1, 1, span) evaluated at offset (coord - start):
    #   span > 1: -1 + 2 * offset / (span - 1);  span == 1: -1.
    def norm_coord(coord, start, span):
        off = coord - start[..., None].astype(jnp.float32)
        denom = jnp.maximum(span[..., None].astype(jnp.float32) - 1.0, 1.0)
        c = -1.0 + 2.0 * off / denom
        return jnp.where(span[..., None] == 1, -1.0, c)

    yn = norm_coord(ys, y1, hspan)  # (..., G)
    xn = norm_coord(xs, x1, wspan)  # (..., G)
    dist = yn[..., :, None] ** 2 + xn[..., None, :] ** 2
    w = jnp.exp(-dist / variance) * inside
    return w / jnp.maximum(jnp.sum(w, axis=(-2, -1), keepdims=True), 1e-30)


def _uniform_box_weights(grid_boxes: jax.Array, grid_size: int) -> jax.Array:
    inside = _box_inside_mask(grid_boxes, grid_size).astype(jnp.float32)
    area = jnp.sum(inside, axis=(-2, -1), keepdims=True)
    return inside / jnp.maximum(area, 1.0)


def _attention_box_weights(
    grid_boxes: jax.Array, attention_map: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Sequential attention-weighted box maps, reproducing the reference's
    in-place normalization aliasing (src/bbox_utils.py:46-52).

    Args:
      grid_boxes: (B, NB, 4) int grid boxes.
      attention_map: (B, G, G) CLS->patch attention.

    Returns:
      (B, NB, G, G) per-box weights and the final (mutated) attention map.
    """
    grid_size = attention_map.shape[-1]

    def per_image(attn, boxes):
        def step(attn, box):
            inside = _box_inside_mask(box, grid_size).astype(attn.dtype)
            s = jnp.sum(attn * inside)
            # An empty inside-mask (the [-1]*4 dummy rows of the
            # fixed-shape batching convention, or a box fully outside the
            # grid) must yield a ZERO weight map, not 0/0=NaN — the NaN
            # would poison the merged map through `0 * NaN` in the
            # valid-mask einsum. The reference never sees this case (it
            # loops over real boxes only, src/bbox_utils.py:46-52).
            safe = jnp.where(s > 0, s, 1.0)
            normalized = attn * inside / safe
            # The reference divides the attention slice in place, so
            # subsequent overlapping boxes observe the normalized values.
            attn = jnp.where(inside > 0, attn / safe, attn)
            return attn, normalized

        return jax.lax.scan(step, attn, boxes)

    final_attn, weights = jax.vmap(per_image)(attention_map, grid_boxes)
    return weights, final_attn


def bbox_weight_maps(
    bboxes: jax.Array,
    grid_size: int,
    patch_size: int,
    *,
    gaussian_avg: bool = False,
    gaussian_bbox_variance: float = 0.5,
    attention_map: Optional[jax.Array] = None,
    even_center: str = "low",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, NB, 4) pixel boxes -> (B, NB, G, G) per-box weight maps.

    Mode priority matches the reference: attention > gaussian > uniform
    (src/bbox_utils.py:46-97).
    """
    gb = bboxes_to_grid(bboxes, patch_size)
    if attention_map is not None:
        w, _ = _attention_box_weights(gb, attention_map.reshape(-1, grid_size, grid_size))
        return w
    if gaussian_avg:
        return _gaussian_box_weights(
            gb, grid_size, gaussian_bbox_variance, even_center=even_center, key=key
        )
    return _uniform_box_weights(gb, grid_size)


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "gaussian_avg", "gaussian_bbox_variance", "even_center"),
)
def extract_bbox_features(
    patch_tokens: jax.Array,
    bboxes: jax.Array,
    *,
    patch_size: int,
    gaussian_avg: bool = False,
    gaussian_bbox_variance: float = 0.5,
    attention_map: Optional[jax.Array] = None,
    even_center: str = "low",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-box weighted patch means. (B, N, D) x (B, NB, 4) -> (B, NB, D).

    Replaces the reference's per-(image, box) Python loop
    (src/bbox_utils.py:37-97) with one masked einsum over the full grid.
    """
    b, n, d = patch_tokens.shape
    g = int(round(n**0.5))
    w = bbox_weight_maps(
        bboxes,
        g,
        patch_size,
        gaussian_avg=gaussian_avg,
        gaussian_bbox_variance=gaussian_bbox_variance,
        attention_map=attention_map,
        even_center=even_center,
        key=key,
    )
    grid = patch_tokens.reshape(b, g, g, d)
    return jnp.einsum("bkyx,byxd->bkd", w, grid)


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "gaussian_avg", "gaussian_bbox_variance", "even_center"),
)
def extract_bbox_features_single(
    patch_tokens: jax.Array,
    bboxes: jax.Array,
    *,
    patch_size: int,
    gaussian_avg: bool = False,
    gaussian_bbox_variance: float = 0.5,
    attention_map: Optional[jax.Array] = None,
    even_center: str = "low",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """One embedding per image from the union of its boxes (controllable
    captioning). Per-box weight maps are summed, dummy boxes (negative
    coordinate sum after grid conversion) are skipped, and the merged map is
    renormalized to 1 (reference: src/bbox_utils.py:100-109, 40-42).

    (B, N, D) x (B, NB, 4) -> (B, D).
    """
    b, n, d = patch_tokens.shape
    g = int(round(n**0.5))
    gb = bboxes_to_grid(bboxes, patch_size)
    valid = (jnp.sum(gb, axis=-1) >= 0).astype(jnp.float32)  # (B, NB)
    w = bbox_weight_maps(
        bboxes,
        g,
        patch_size,
        gaussian_avg=gaussian_avg,
        gaussian_bbox_variance=gaussian_bbox_variance,
        attention_map=attention_map,
        even_center=even_center,
        key=key,
    )
    total = jnp.einsum("bk,bkyx->byx", valid, w)
    total = total / jnp.maximum(jnp.sum(total, axis=(-2, -1), keepdims=True), 1e-30)
    grid = patch_tokens.reshape(b, g, g, d)
    return jnp.einsum("byx,byxd->bd", total, grid)


@functools.partial(jax.jit, static_argnames=("variance", "even_center"))
def compute_region_means(
    patch_tokens: jax.Array,
    variance: float,
    *,
    even_center: str = "low",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Whole-image weighted patch mean (reference: src/model.py:45-94).

    variance == 0 -> one-hot center patch; variance >= 100 -> uniform;
    else a Gaussian over the full grid (normalized once, shared per image).
    (B, N, D) -> (B, D).
    """
    b, n, d = patch_tokens.shape
    g = int(round(n**0.5))
    grid = patch_tokens.reshape(b, g, g, d)
    coords = jnp.linspace(-1.0, 1.0, g)
    variance = float(variance)
    if variance == 0.0:
        lo, hi = g // 2 - 1, g // 2
        if g % 2 == 1:
            cy = cx = jnp.full((b,), g // 2)
        elif even_center == "low":
            cy = cx = jnp.full((b,), lo)
        elif even_center == "high":
            cy = cx = jnp.full((b,), hi)
        else:
            if key is None:
                raise ValueError("even_center='random' requires a PRNG key")
            ky, kx = jax.random.split(key)
            cy = jnp.where(jax.random.bernoulli(ky, 0.5, (b,)), hi, lo)
            cx = jnp.where(jax.random.bernoulli(kx, 0.5, (b,)), hi, lo)
        idx = jnp.arange(g)
        w = (
            (idx[:, None] == cy[:, None, None]).astype(jnp.float32)
            * (idx[None, :] == cx[:, None, None]).astype(jnp.float32)
        )
    elif variance >= 100.0:
        w = jnp.full((b, g, g), 1.0 / (g * g))
    else:
        dist = coords[:, None] ** 2 + coords[None, :] ** 2
        w = jnp.exp(-dist / variance)
        w = w / jnp.sum(w)
        w = jnp.broadcast_to(w[None], (b, g, g))
    return jnp.einsum("byx,byxd->bd", w, grid)


@functools.partial(jax.jit, static_argnames=("grid_size",))
def traces_to_grid(
    points: jax.Array, valid: jax.Array, grid_size: int
) -> jax.Array:
    """Rasterize normalized trace points into per-patch hit counts.

    Args:
      points: (B, P, 2) ``(x, y)`` in [0, 1] (padded).
      valid: (B, P) mask of real points.
      grid_size: patches per side.

    Returns:
      (B, G, G) float hit counts (reference: src/bbox_utils.py:158-168 —
      points outside [0, 1] are dropped; indices clamp to the last patch).
    """
    x = points[..., 0]
    y = points[..., 1]
    in_range = (x >= 0) & (x <= 1) & (y >= 0) & (y <= 1) & (valid > 0)
    gx = jnp.minimum(jnp.floor(x * grid_size).astype(jnp.int32), grid_size - 1)
    gy = jnp.minimum(jnp.floor(y * grid_size).astype(jnp.int32), grid_size - 1)
    gx = jnp.clip(gx, 0, grid_size - 1)
    gy = jnp.clip(gy, 0, grid_size - 1)
    flat = gy * grid_size + gx

    def per_image(flat_idx, mask):
        return jnp.zeros((grid_size * grid_size,), jnp.float32).at[flat_idx].add(
            mask.astype(jnp.float32)
        )

    grids = jax.vmap(per_image)(flat, in_range)
    return grids.reshape(-1, grid_size, grid_size)


@jax.jit
def trace_pool(
    patch_tokens: jax.Array,
    trace_grid: jax.Array,
    self_attn: Optional[jax.Array] = None,
) -> jax.Array:
    """Trace-conditioned patch aggregation (reference: src/model.py:1049-1054).

    Note the division by the *full grid size*, not the weight sum — the
    reference takes ``.mean`` over all patches, so the embedding scale depends
    on trace length. (B, N, D) x (B, G, G) -> (B, D).
    """
    b, n, d = patch_tokens.shape
    g = trace_grid.shape[-1]
    w = trace_grid
    if self_attn is not None:
        w = w * self_attn.reshape(b, g, g)
    grid = patch_tokens.reshape(b, g, g, d)
    return jnp.einsum("byx,byxd->bd", w, grid) / (g * g)


def trace_pool_padded(
    patch_tokens: jax.Array,
    trace_grid: jax.Array,
    self_attn: Optional[jax.Array] = None,
) -> jax.Array:
    """`trace_pool` over a PADDED patch-token axis (P >= G*G; the fusedqkv
    encoder's lane-padded tokens, vit_forward(keep_tokens_padded=True)).

    The grid weights are zero-extended over the padding rows, so the
    pooling contraction itself masks them out — bitwise the same result as
    slicing the tokens first, without materializing the (B, N, D) unpad
    copy (~3.3 ms/batch at flagship scale, PERF.md round-3 profile)."""
    b, p, d = patch_tokens.shape
    g = trace_grid.shape[-1]
    w = trace_grid.reshape(b, g * g)
    if self_attn is not None:
        w = w * self_attn[:, : g * g]
    if p > g * g:
        w = jnp.pad(w, ((0, 0), (0, p - g * g)))
    return jnp.einsum("bp,bpd->bd", w, patch_tokens) / (g * g)


def boxes_to_pixel_masks(bboxes: jax.Array, size: int) -> jax.Array:
    """Pixel-resolution binary masks for AlphaCLIP region conditioning.

    Matches the reference's bbox_to_alpha_mask with patch_size=1
    (src/alphaclip/alpha_mask_utils.py:9-45): start = floor(x1) clamped to
    [0, size-1], end = floor(x1+w) clamped to [0, size], EXCLUSIVE end.
    Dummy boxes (negative coordinate sum) produce all-zero masks.

    (..., 4) -> (..., size, size).
    """
    x1 = jnp.clip(jnp.floor(bboxes[..., 0]), 0, size - 1)
    y1 = jnp.clip(jnp.floor(bboxes[..., 1]), 0, size - 1)
    x2 = jnp.clip(jnp.floor(bboxes[..., 0] + bboxes[..., 2]), 0, size)
    y2 = jnp.clip(jnp.floor(bboxes[..., 1] + bboxes[..., 3]), 0, size)
    valid = jnp.sum(bboxes, axis=-1) >= 0
    xs = jnp.arange(size, dtype=jnp.float32)
    in_x = (xs >= x1[..., None]) & (xs < x2[..., None])
    in_y = (xs >= y1[..., None]) & (xs < y2[..., None])
    mask = in_y[..., :, None] & in_x[..., None, :]
    return mask.astype(jnp.float32) * valid[..., None, None]


def ctx_cleaner(
    dirty_embeds: jax.Array,
    ctx_embed: jax.Array,
    cleaning_type: str = "orthogonal_projection",
    alpha: float = 1.0,
    epsilon: float = 1e-6,
) -> jax.Array:
    """Remove global-context bias from patch embeddings
    (reference: src/model.py:1425-1436).

    dirty_embeds: (B, N, D); ctx_embed: (B, D).
    """
    ctx = ctx_embed[:, None, :]
    if cleaning_type == "orthogonal_projection":
        denom = jnp.sum(ctx * ctx, axis=-1, keepdims=True)
        proj = jnp.sum(dirty_embeds * ctx, axis=-1, keepdims=True) / denom
        return dirty_embeds - alpha * proj * ctx
    if cleaning_type == "contrastive_mask":
        norm = jnp.linalg.norm(ctx, axis=-1, keepdims=True) + epsilon
        return dirty_embeds * (1.0 - ctx / norm)
    raise ValueError(f"unknown cleaning_type: {cleaning_type}")
