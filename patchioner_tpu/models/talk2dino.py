"""Talk2DINO projection (CLIP-text -> DINO space) and its pseudo-inverse.

Reference: src/talk2dino/talk2dino.py:6-97 (linear + optional tanh-activated
hidden layers; `project_clip_txt` is the only path the captioner uses) and
src/embedding_utils.py:3-25 (SVD pseudo-inverse of the first linear layer,
used to map DINO-space embeddings back into CLIP space before decoding).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

__all__ = [
    "project_clip_txt",
    "build_inversion",
    "revert_transformation",
    "talk2dino_config_from_yaml",
]

_ACTS: dict[Optional[str], Optional[Callable]] = {
    None: None,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
}


def talk2dino_config_from_yaml(path_or_dict) -> dict:
    """Parse a Talk2DINO YAML config (configs_talk2dino/*.yaml schema:
    top-level `model:` block with act/hidden_layer/dino_embed_dim...)."""
    if isinstance(path_or_dict, str):
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)["model"]
    else:
        cfg = dict(path_or_dict)
    act = cfg.get("act")
    if act not in _ACTS:
        raise ValueError(f"unknown activation: {act}")
    return {
        "act": act,
        "hidden_layer": cfg.get("hidden_layer", False),
        "dino_embed_dim": cfg.get("dino_embed_dim", 1024),
        "clip_embed_dim": cfg.get("clip_embed_dim", 512),
    }


def project_clip_txt(params: dict, x: jax.Array, act: Optional[str] = "tanh") -> jax.Array:
    """CLIP text embedding -> DINO space.

    params: {'linear': {w, b}, 'hidden': [{w, b}, ...]} (io.torch_port layout).
    Activation is applied *before* each hidden layer, matching the reference
    (talk2dino.py:78-81: act then hidden_layer, per layer).
    """
    x = x.astype(jnp.float32)
    x = x @ params["linear"]["w"] + params["linear"]["b"]
    fn = _ACTS[act]
    for h in params.get("hidden", []):
        if fn is not None:
            x = fn(x)
        x = x @ h["w"] + h["b"]
    return x


def build_inversion(params: dict) -> dict:
    """Precompute the SVD pseudo-inverse of the first linear layer
    (reference: src/embedding_utils.py:3-15, tolerance 1e-10).

    Our `linear.w` is (clip_dim, dino_dim) = torch W.T, so pinv(W) here is
    computed on w.T to match the reference's (dino->clip) inverse map.
    """
    w = np.asarray(params["linear"]["w"], np.float64).T  # torch layout (out, in)
    u, s, vh = np.linalg.svd(w, full_matrices=False)
    s_pinv = np.where(s > 1e-10, 1.0 / np.where(s > 1e-10, s, 1.0), 0.0)
    a_pinv = (vh.T * s_pinv) @ u.T  # (in, out) = (clip, dino)
    return {
        "A_pinv": jnp.asarray(a_pinv, jnp.float32),
        "b": jnp.asarray(params["linear"]["b"], jnp.float32),
    }


def revert_transformation(features: jax.Array, inv: dict) -> jax.Array:
    """DINO-space -> CLIP-space: (x - b) @ A_pinv.T
    (reference: src/embedding_utils.py:17-25)."""
    return (features.astype(jnp.float32) - inv["b"]) @ inv["A_pinv"].T
