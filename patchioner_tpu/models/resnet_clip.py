"""CLIP ModifiedResNet (RegionCLIP backbone), functional JAX.

Reference: src/regionclip/clip_backbone.py:14-300 — the CLIP ResNet variant:
3-conv stem with an average pool, anti-aliased strided bottlenecks (avgpool
before stride>1 convs), frozen batch norms, and a QKV attention pool whose
CLS query is the spatial mean. RegionCLIP's `forward_return_spatial_feats`
(:243-300) emits a DINOv2-style dict: attnpool CLS token + attnpool-projected
local features (or raw c_proj'ed layer4 features), both L2-normalized.

Effective patch size 32 (stride of layer4) — src/model.py:453-457.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ResNetClipConfig",
    "resnet_spatial_forward",
    "init_resnet_clip",
    "port_clip_resnet",
]


@dataclasses.dataclass(frozen=True)
class ResNetClipConfig:
    layers: tuple = (3, 4, 6, 3)  # RN50
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    img_size: int = 224
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dim(self) -> int:
        return self.width * 32  # layer4 channels

    @property
    def patch_size(self) -> int:
        return 32  # layer4 stride (src/model.py:453-457)

    @property
    def grid_size(self) -> int:
        return self.img_size // 32


def _conv(x, w, stride=1):
    # torch-style symmetric padding ((k-1)//2 each side) — NOT XLA 'SAME',
    # whose asymmetric pads differ at borders for stride-2 3x3 convs.
    p = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _frozen_bn(x, p, eps):
    scale = p["w"] / jnp.sqrt(p["var"] + eps)
    return x * scale + (p["b"] - p["mean"] * scale)


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _bottleneck(x, p, stride, eps):
    out = jax.nn.relu(_frozen_bn(_conv(x, p["conv1"]), p["bn1"], eps))
    out = jax.nn.relu(_frozen_bn(_conv(out, p["conv2"]), p["bn2"], eps))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _frozen_bn(_conv(out, p["conv3"]), p["bn3"], eps)
    identity = x
    if "down_conv" in p:
        if stride > 1:
            identity = _avgpool(identity, stride)
        identity = _frozen_bn(_conv(identity, p["down_conv"]), p["down_bn"], eps)
    return jax.nn.relu(out + identity)


def _attnpool(x, p, heads):
    """QKV attention pool (clip_backbone.py:73-110): tokens = [mean, HW],
    + pos embed, one MHA step with separate projections; returns
    (cls (B, out), locals (B, HW, out))."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate(
        [jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1
    )
    tokens = tokens + p["pos_embed"][None]
    q = tokens @ p["q"]["w"] + p["q"]["b"]
    k = tokens @ p["k"]["w"] + p["k"]["b"]
    v = tokens @ p["v"]["w"] + p["v"]["b"]
    hd = c // heads
    n = tokens.shape[1]

    def split(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", split(q) * (hd**-0.5), split(k)
    ).astype(jnp.float32)
    wgt = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", wgt, split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    out = out @ p["c"]["w"] + p["c"]["b"]
    return out[:, 0], out[:, 1:]


@functools.partial(jax.jit, static_argnames=(
    "cfg", "use_attnpool_for_spatial_feats", "use_layer3", "res5_out"))
def resnet_spatial_forward(
    params: dict,
    pixels: jax.Array,
    cfg: ResNetClipConfig,
    use_attnpool_for_spatial_feats: bool = True,
    use_layer3: bool = False,
    res5_out: bool = True,
) -> dict:
    """(B, H, W, 3) -> {'x_norm_clstoken', 'x_norm_patchtokens'} (normalized),
    matching forward_return_spatial_feats (clip_backbone.py:243-300).

    Precedence mirrors the reference exactly: when `res5_out` (res5 in
    `_out_features`, the standard RegionCLIP config) the spatial features
    come from the layer4 attnpool (or its c_proj) and `use_layer3` has NO
    effect — raw layer3 features (stride 16, width*16 channels, no
    projection to output_dim) surface only when `res5_out=False`
    (clip_backbone.py:265-293). The CLS token is always the layer4
    attnpool output."""
    eps = cfg.bn_eps
    if cfg.dtype != jnp.float32:
        # cast weights once (vit.py's pattern): lax.conv requires matching
        # operand dtypes — f32 params against bf16 pixels CRASH the first
        # stem conv, and f32 params would promote the matmuls anyway
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    x = pixels.astype(cfg.dtype)
    # 3-conv stem (conv1 stride 2) + avgpool 2
    x = jax.nn.relu(_frozen_bn(_conv(x, params["stem"]["conv1"], stride=2),
                               params["stem"]["bn1"], eps))
    x = jax.nn.relu(_frozen_bn(_conv(x, params["stem"]["conv2"]),
                               params["stem"]["bn2"], eps))
    x = jax.nn.relu(_frozen_bn(_conv(x, params["stem"]["conv3"]),
                               params["stem"]["bn3"], eps))
    x = _avgpool(x, 2)
    x3 = None
    for li, blocks in enumerate(params["layers"]):
        stride = 1 if li == 0 else 2
        for bi, blk in enumerate(blocks):
            x = _bottleneck(x, blk, stride if bi == 0 else 1, eps)
        if li == 2:
            x3 = x  # layer3 output, stride 16

    cls_tok, locals_ = _attnpool(x, params["attnpool"], cfg.heads)
    if res5_out:
        if not use_attnpool_for_spatial_feats:
            b, h, w, c = x.shape
            flat = x.reshape(b, h * w, c)
            locals_ = (flat @ params["attnpool"]["c"]["w"]
                       + params["attnpool"]["c"]["b"])
    else:
        # with res5 absent both use_layer3 branches resolve to layer3
        # (clip_backbone.py:265-268: x_3 if use_layer3 else x_3)
        sp = x3
        b, h, w, c = sp.shape
        locals_ = sp.reshape(b, h * w, c)
    locals_ = locals_ / jnp.linalg.norm(locals_, axis=-1, keepdims=True)
    cls_tok = cls_tok / jnp.linalg.norm(cls_tok, axis=-1, keepdims=True)
    return {"x_norm_clstoken": cls_tok, "x_norm_patchtokens": locals_}


# -------------------------------------------------------------------- init


def init_resnet_clip(key: jax.Array, cfg: ResNetClipConfig) -> dict:
    ks = iter(jax.random.split(key, 256))

    def conv(k, kh, kw, ci, co):
        return jax.random.normal(k, (kh, kw, ci, co)) / math.sqrt(kh * kw * ci)

    def bn(c):
        return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    w = cfg.width
    params = {
        "stem": {
            "conv1": conv(next(ks), 3, 3, 3, w // 2), "bn1": bn(w // 2),
            "conv2": conv(next(ks), 3, 3, w // 2, w // 2), "bn2": bn(w // 2),
            "conv3": conv(next(ks), 3, 3, w // 2, w), "bn3": bn(w),
        },
        "layers": [],
    }
    inplanes = w
    for li, n_blocks in enumerate(cfg.layers):
        planes = w * (2**li)
        stride = 1 if li == 0 else 2
        blocks = []
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            blk = {
                "conv1": conv(next(ks), 1, 1, inplanes, planes), "bn1": bn(planes),
                "conv2": conv(next(ks), 3, 3, planes, planes), "bn2": bn(planes),
                "conv3": conv(next(ks), 1, 1, planes, planes * 4),
                "bn3": bn(planes * 4),
            }
            if s > 1 or inplanes != planes * 4:
                blk["down_conv"] = conv(next(ks), 1, 1, inplanes, planes * 4)
                blk["down_bn"] = bn(planes * 4)
            blocks.append(blk)
            inplanes = planes * 4
        params["layers"].append(blocks)

    c = cfg.embed_dim
    grid = cfg.grid_size

    def lin(k, ci, co):
        return {"w": jax.random.normal(k, (ci, co)) / math.sqrt(ci),
                "b": jnp.zeros((co,))}

    params["attnpool"] = {
        "pos_embed": jax.random.normal(next(ks), (grid * grid + 1, c)) / math.sqrt(c),
        "q": lin(next(ks), c, c),
        "k": lin(next(ks), c, c),
        "v": lin(next(ks), c, c),
        "c": lin(next(ks), c, cfg.output_dim),
    }
    return params


# -------------------------------------------------------------------- port


# the one torch->numpy conversion helper lives in the porting layer
from patchioner_tpu.io.torch_port import _np  # noqa: E402


def port_clip_resnet(sd: Mapping, cfg: ResNetClipConfig, prefix: str = "visual.") -> dict:
    """Port an openai-CLIP / RegionCLIP ModifiedResNet state dict. RegionCLIP
    detection checkpoints carry detectron-style 'backbone.' prefixes
    (src/regionclip/loader.py:92-100) — strip those before calling."""

    def g(key):
        return _np(sd[prefix + key])

    def convw(key):
        return np.ascontiguousarray(g(key).transpose(2, 3, 1, 0))  # OIHW->HWIO

    def bn(name):
        return {
            "w": g(f"{name}.weight"), "b": g(f"{name}.bias"),
            "mean": g(f"{name}.running_mean"), "var": g(f"{name}.running_var"),
        }

    params = {
        "stem": {
            "conv1": convw("conv1.weight"), "bn1": bn("bn1"),
            "conv2": convw("conv2.weight"), "bn2": bn("bn2"),
            "conv3": convw("conv3.weight"), "bn3": bn("bn3"),
        },
        "layers": [],
    }
    for li, n_blocks in enumerate(cfg.layers):
        blocks = []
        for bi in range(n_blocks):
            p = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": convw(f"{p}.conv1.weight"), "bn1": bn(f"{p}.bn1"),
                "conv2": convw(f"{p}.conv2.weight"), "bn2": bn(f"{p}.bn2"),
                "conv3": convw(f"{p}.conv3.weight"), "bn3": bn(f"{p}.bn3"),
            }
            if prefix + f"{p}.downsample.0.weight" in sd:
                blk["down_conv"] = convw(f"{p}.downsample.0.weight")
                blk["down_bn"] = bn(f"{p}.downsample.1")
            blocks.append(blk)
        params["layers"].append(blocks)
    pos = g("attnpool.positional_embedding")
    want_tokens = cfg.grid_size * cfg.grid_size + 1
    if pos.shape[0] != want_tokens:
        # the reference loader deletes an incompatible attnpool pos-embed
        # and lets the model re-init one at the config resolution
        # (src/regionclip/loader.py:186-197) — e.g. a 224px-trained RN50
        # (50 tokens) loaded at the shipped 512px config (257 tokens)
        print(
            f"Warning: attnpool pos-embed has {pos.shape[0]} tokens, "
            f"config resolution {cfg.img_size} needs {want_tokens} — "
            f"re-initializing it (reference loader behavior)"
        )
        pos = np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(0), (want_tokens, pos.shape[1])
            ) / math.sqrt(pos.shape[1]),
            np.float32,
        )
    params["attnpool"] = {
        "pos_embed": pos,
        "q": {"w": g("attnpool.q_proj.weight").T, "b": g("attnpool.q_proj.bias")},
        "k": {"w": g("attnpool.k_proj.weight").T, "b": g("attnpool.k_proj.bias")},
        "v": {"w": g("attnpool.v_proj.weight").T, "b": g("attnpool.v_proj.bias")},
        "c": {"w": g("attnpool.c_proj.weight").T, "b": g("attnpool.c_proj.bias")},
    }
    return params
