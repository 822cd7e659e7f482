"""Talk2DINO projection + inversion parity, using the real in-tree weights
(src/viecap/training/talk2dino/weights/vitb_mlp_infonce.pth is the only
pretrained artifact shipped with the reference) when available, else synthetic.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import talk2dino

REAL_WEIGHTS = (
    "/root/reference/Patch-ioner/src/viecap/training/talk2dino/weights/"
    "vitb_mlp_infonce.pth"
)


def synthetic_state_dict(clip_dim=32, dino_dim=48):
    torch.manual_seed(0)
    return {
        "linear_layer.weight": torch.randn(dino_dim, clip_dim),
        "linear_layer.bias": torch.randn(dino_dim),
        "hidden_layers.0.weight": torch.randn(dino_dim, dino_dim) * 0.1,
        "hidden_layers.0.bias": torch.randn(dino_dim) * 0.1,
    }


def load_sd():
    if os.path.exists(REAL_WEIGHTS):
        return torch.load(REAL_WEIGHTS, map_location="cpu")
    return synthetic_state_dict()


def oracle_project(sd, x):
    x = torch.from_numpy(x).float()
    x = x @ sd["linear_layer.weight"].T + sd["linear_layer.bias"]
    x = torch.tanh(x)
    x = x @ sd["hidden_layers.0.weight"].T + sd["hidden_layers.0.bias"]
    return x.numpy()


def test_projection_parity():
    sd = load_sd()
    params = torch_port.port_talk2dino(sd)
    clip_dim = sd["linear_layer.weight"].shape[1]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, clip_dim)).astype(np.float32)
    want = oracle_project(sd, x)
    got = talk2dino.project_clip_txt(params, jnp.asarray(x), act="tanh")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_legacy_linear_layer2_alias():
    sd = synthetic_state_dict()
    legacy = {
        "linear_layer.weight": sd["linear_layer.weight"],
        "linear_layer.bias": sd["linear_layer.bias"],
        "linear_layer2.weight": sd["hidden_layers.0.weight"],
        "linear_layer2.bias": sd["hidden_layers.0.bias"],
    }
    a = torch_port.port_talk2dino(sd)
    b = torch_port.port_talk2dino(legacy)
    np.testing.assert_array_equal(a["hidden"][0]["w"], b["hidden"][0]["w"])


def test_inversion_roundtrip():
    """revert_transformation must invert the *linear* part: for y = W x + b,
    (y - b) @ pinv(W).T == x when W has full column rank
    (reference: src/model.py:618-625, 1421)."""
    sd = load_sd()
    params = torch_port.port_talk2dino(sd)
    inv = talk2dino.build_inversion(params)
    clip_dim = sd["linear_layer.weight"].shape[1]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, clip_dim)).astype(np.float32)
    y = x @ np.asarray(params["linear"]["w"]) + np.asarray(params["linear"]["b"])
    back = talk2dino.revert_transformation(jnp.asarray(y), inv)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=1e-3)


def test_inversion_matches_torch_pinv():
    sd = load_sd()
    params = torch_port.port_talk2dino(sd)
    inv = talk2dino.build_inversion(params)
    w = sd["linear_layer.weight"].float()
    u, s, vh = torch.linalg.svd(w, full_matrices=False)
    s_pinv = torch.where(s > 1e-10, 1.0 / s, torch.zeros_like(s))
    want = (vh.T @ torch.diag(s_pinv) @ u.T).numpy()
    np.testing.assert_allclose(np.asarray(inv["A_pinv"]), want, rtol=1e-3, atol=1e-4)
