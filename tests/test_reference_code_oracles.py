"""Fuzz-parity against the REFERENCE'S OWN CODE, imported by path.

The transcription oracles elsewhere re-execute the reference math by hand;
these tests remove even that indirection for the reference's importable
host-side math modules (pure torch/numpy, no checkpoints):

  * src/bbox_utils.py       — extract_bboxes_feats (uniform / gaussian /
                              attention-weighted / single-embedding merge),
                              map_traces_to_grid
  * src/dino_extraction.py  — process_self_attention
  * src/embedding_utils.py  — get_pseudo_inverse + revert_transformation

Each module loads straight from /root/reference (existence/deps-guarded —
tests may load reference files as data/oracles; the package never imports
reference code) and randomized inputs sweep the package against it.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.models import talk2dino, vit
from patchioner_tpu.ops import region_pooling as rp

REF_SRC = "/root/reference/Patch-ioner/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference tree not present"
)


def _load(name: str, rel: str, stub_modules: tuple = ()):
    """Import a reference module by path. `stub_modules` are import names
    satisfied with empty placeholder modules — dino_extraction imports
    torchvision (absent in this image) at module level but
    process_self_attention never touches it."""
    import sys
    import types

    path = os.path.join(REF_SRC, rel)
    injected = []
    for sm in stub_modules:
        if sm not in sys.modules:
            sys.modules[sm] = types.ModuleType(sm)
            injected.append(sm)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except ImportError as e:
        pytest.skip(f"reference oracle deps unavailable: {e}")
    finally:
        for sm in injected:
            sys.modules.pop(sm, None)
    return mod


@pytest.fixture(scope="module")
def ref_bbox():
    return _load("_ref_bbox_utils", "bbox_utils.py")


@pytest.fixture(scope="module")
def ref_dino():
    return _load("_ref_dino_extraction", "dino_extraction.py",
                 stub_modules=("torchvision", "torchvision.transforms"))


@pytest.fixture(scope="module")
def ref_embed():
    return _load("_ref_embedding_utils", "embedding_utils.py")


G, D, PATCH = 9, 16, 14


def _boxes(rng, b, nb):
    img = G * PATCH
    x1 = rng.uniform(0, img - PATCH, (b, nb))
    y1 = rng.uniform(0, img - PATCH, (b, nb))
    w = rng.uniform(1, img - x1 - 1, (b, nb))
    h = rng.uniform(1, img - y1 - 1, (b, nb))
    return np.stack([x1, y1, w, h], -1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.5),
        dict(gaussian_avg=True, gaussian_bbox_variance=2.0),
    ],
)
def test_bbox_feats_fuzz_vs_reference_code(ref_bbox, seed, kwargs):
    rng = np.random.default_rng(seed)
    tokens = rng.standard_normal((3, G * G, D)).astype(np.float32)
    boxes = _boxes(rng, 3, 4)
    # the reference mutates bboxes in place (//= patch_size) — copy
    want = ref_bbox.extract_bboxes_feats(
        torch.from_numpy(tokens), torch.from_numpy(boxes.copy()),
        patch_size=PATCH, **kwargs,
    ).numpy()
    got = rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH, **kwargs
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [3, 4])
def test_bbox_feats_attention_map_vs_reference_code(ref_bbox, seed):
    rng = np.random.default_rng(seed)
    tokens = rng.standard_normal((2, G * G, D)).astype(np.float32)
    boxes = _boxes(rng, 2, 3)
    attn = rng.uniform(0.01, 1.0, (2, G * G)).astype(np.float32)
    # the reference normalizes patch_weights in place THROUGH the
    # attention_map view — feed it a copy
    want = ref_bbox.extract_bboxes_feats(
        torch.from_numpy(tokens), torch.from_numpy(boxes.copy()),
        patch_size=PATCH, attention_map=torch.from_numpy(attn.copy()),
    ).numpy()
    got = rp.extract_bbox_features(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH,
        attention_map=jnp.asarray(attn),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [5, 6])
def test_region_set_single_embedding_vs_reference_code(ref_bbox, seed):
    """get_single_embedding_per_image=True with the region-set [-1]*4
    padding boxes the eval feeds (skipped by the negative-sum check)."""
    rng = np.random.default_rng(seed)
    tokens = rng.standard_normal((2, G * G, D)).astype(np.float32)
    boxes = _boxes(rng, 2, 4)
    boxes[0, 3] = [-1, -1, -1, -1]
    boxes[1, 2:] = [-1, -1, -1, -1]
    want = ref_bbox.extract_bboxes_feats(
        torch.from_numpy(tokens), torch.from_numpy(boxes.copy()),
        patch_size=PATCH, gaussian_avg=True, gaussian_bbox_variance=1.0,
        get_single_embedding_per_image=True,
    ).numpy()
    got = rp.extract_bbox_features_single(
        jnp.asarray(tokens), jnp.asarray(boxes), patch_size=PATCH,
        gaussian_avg=True, gaussian_bbox_variance=1.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_traces_grid_vs_reference_code(ref_bbox):
    rng = np.random.default_rng(11)
    pts = rng.uniform(-0.2, 1.2, (40, 2))  # includes out-of-range points
    trace = [{"x": float(x), "y": float(y)} for x, y in pts]
    want = ref_bbox.map_traces_to_grid(trace, G).numpy()
    got = rp.traces_to_grid(
        jnp.asarray(pts, jnp.float32)[None],
        jnp.ones((1, len(pts)), jnp.float32),
        G,
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


@pytest.mark.parametrize("heads,scale", [(16, 0.125), (4, 0.25)])
def test_process_self_attention_vs_reference_code(ref_dino, heads, scale):
    rng = np.random.default_rng(13)
    b, n_tok, d = 2, 1 + 4 + G * G, 32
    qkv = rng.standard_normal((b, n_tok, 3 * d)).astype(np.float32)
    want = ref_dino.process_self_attention(
        torch.from_numpy(qkv), b, n_tok, heads, d, scale,
        num_global_tokens=5,
    ).numpy()
    got, _maps = vit.process_self_attention(
        jnp.asarray(qkv), num_heads=heads, num_global_tokens=5, scale=scale
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_inversion_vs_reference_code(ref_embed):
    rng = np.random.default_rng(17)
    w_torch = rng.standard_normal((24, 12)).astype(np.float32)  # (out, in)
    b_vec = rng.standard_normal((24,)).astype(np.float32)
    feats = rng.standard_normal((5, 24)).astype(np.float32)
    lin = torch.nn.Linear(12, 24)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w_torch))
        lin.bias.copy_(torch.from_numpy(b_vec))
    want = ref_embed.revert_transformation(
        torch.from_numpy(feats), linear_layer=lin
    ).detach().numpy()
    inv = talk2dino.build_inversion(
        {"linear": {"w": w_torch.T, "b": b_vec}}  # our layout: (in, out)
    )
    got = talk2dino.revert_transformation(jnp.asarray(feats), inv)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_adjust_bbox_vs_reference_code(ref_bbox, seed):
    """Both resize+center-crop remaps, over portrait/landscape originals and
    boxes that land partially outside the crop (the reference's clip-to-crop
    branch). The reference only reads image.size — a stand-in suffices."""
    from types import SimpleNamespace

    from patchioner_tpu.utils import geometry

    rng = np.random.default_rng(seed)
    for _ in range(20):
        ow = int(rng.integers(80, 900))
        oh = int(rng.integers(80, 900))
        img = SimpleNamespace(size=(ow, oh))
        bbox = [float(rng.uniform(0, ow * 0.9)), float(rng.uniform(0, oh * 0.9)),
                float(rng.uniform(1, ow)), float(rng.uniform(1, oh))]
        resize, crop = 140, 126
        want = ref_bbox.adjust_bbox_for_transform(img, list(bbox), resize, crop)
        got = geometry.adjust_bbox_for_transform(ow, oh, bbox, resize, crop)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        want2 = ref_bbox.adjust_bbox_for_transform_no_scale(
            img, list(bbox), resize, resize
        )
        got2 = geometry.adjust_bbox_for_transform_no_scale(
            ow, oh, bbox, resize, resize
        )
        np.testing.assert_allclose(got2, want2, rtol=1e-6, atol=1e-6)
