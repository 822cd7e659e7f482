"""CLIP (OpenAI ViT) visual + text towers, functional JAX.

Backs the reference's CLIP-based configurations: decap_B16/decap_B32 backbones
(timm OpenAI CLIP ViT loaded at src/model.py:358-377, tokens head-projected to
the shared space :786-796), the text encoder used for memory-bank building and
decoder training (decoderTraining.py:300), and the CLIP-S/PAC-S metrics
(pacsMetric/pac_score.py).

Layout matches openai/CLIP: visual = conv patch embed (no bias) + class
embedding + pos embed + ln_pre + resblocks (quick-GELU MLP) + ln_post +
projection; text = token embed + pos embed + causal resblocks + ln_final +
EOT-token pooling + text projection.

Ports from HF `transformers.CLIPModel` state dicts (io/torch_port-style
conventions, see `port_hf_clip`).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "port_openai_clip_vision",
    "init_alpha_embed",
    "ClipVisionConfig",
    "ClipTextConfig",
    "clip_visual_forward",
    "clip_text_forward",
    "port_hf_clip_vision",
    "port_hf_clip_text",
    "init_clip_vision",
    "init_clip_text",
]


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    img_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    proj_dim: int = 512
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return 1 + self.grid_size**2


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    depth: int = 12
    heads: int = 8
    proj_dim: int = 512
    ln_eps: float = 1e-5
    eot_token: int = 49407
    dtype: jnp.dtype = jnp.float32


def _ln(x, p, eps):
    # f32 statistics regardless of activation dtype: the reference CLIP
    # towers subclass LayerNorm to compute in fp32 even for fp16 models
    # (alpha_clip/model.py:160-166, INViTE clipfolder/model.py:157-163);
    # bf16 mean/var would drift per layer (same pattern as vit._ln)
    xs = x.astype(jnp.float32)
    mu = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.var(xs, axis=-1, keepdims=True)
    y = (xs - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"] + p["b"]


def _cast_params(params, dtype):
    """Cast f32 weights once when running sub-f32 (vit_forward's pattern):
    f32 params would silently promote every matmul back to f32, making a
    requested bf16 run cost f32 compute and bandwidth."""
    if dtype == jnp.float32:
        return params
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _resblock(x, blk, heads, eps, causal_mask=None, return_qkv=False,
              diag_attn=False):
    b, t, d = x.shape
    hd = d // heads
    h = _ln(x, blk["ln_1"], eps)
    qkv = _dense(h, blk["qkv"])  # fused (D, 3D)
    q, k, v = jnp.split(qkv.reshape(b, t, 3, heads, hd), 3, axis=2)
    q = q.squeeze(2).transpose(0, 2, 1, 3)
    k = k.squeeze(2).transpose(0, 2, 1, 3)
    v = v.squeeze(2).transpose(0, 2, 1, 3)
    if diag_attn:
        # INViTE-style diagonal-only attention: every token attends solely to
        # itself (softmax over one allowed key == 1), so the attention output
        # is just that token's value vector (src/INViTE/clipfolder/
        # model.py:216-231).
        a = v.transpose(0, 2, 1, 3).reshape(b, t, d)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (hd**-0.5), k
        ).astype(jnp.float32)
        if causal_mask is not None:
            logits = jnp.where(causal_mask, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(
            b, t, d
        )
    x = x + _dense(a, blk["out_proj"])
    h = _ln(x, blk["ln_2"], eps)
    x = x + _dense(_quick_gelu(_dense(h, blk["fc1"])), blk["fc2"])
    return (x, qkv) if return_qkv else (x, None)


@functools.partial(jax.jit, static_argnames=("cfg", "skip_last_layers",
                                              "diag_last_layers",
                                              "skip_ln_post"))
def clip_visual_forward(
    params: dict, pixels: jax.Array, cfg: ClipVisionConfig,
    skip_last_layers: int = 0, diag_last_layers: int = 0,
    alpha: Optional[jax.Array] = None, skip_ln_post: bool = False,
) -> dict:
    """(B, H, W, 3) -> dict with projected cls/patch tokens + last-block qkv.

    `diag_last_layers` covers the INViTE variant: the last k resblocks run
    with a diagonal-only attention mask (each token attends to itself;
    src/INViTE/clipfolder/model.py:211-231), and all tokens pass through
    ln_post + projection (:272-283). `skip_last_layers` drops the last k
    resblocks entirely.
    """
    b, hh, ww, _ = pixels.shape
    g = hh // cfg.patch_size
    params = _cast_params(params, cfg.dtype)
    x = pixels.astype(cfg.dtype)
    x = x.reshape(b, g, cfg.patch_size, g, cfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, -1)
    x = x @ params["patch_embed_w"]  # conv, no bias
    if alpha is not None:
        # AlphaCLIP region conditioning: a 1-channel alpha conv added to the
        # patch embedding (src/alphaclip/alpha_clip/model.py:339,351-361).
        a = alpha.astype(cfg.dtype).reshape(b, g, cfg.patch_size, g,
                                            cfg.patch_size, 1)
        a = a.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, -1)
        x = x + a @ params["alpha_embed_w"]
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(cfg.dtype), (b, 1, cfg.width)
    )
    pos = params["pos_embed"]
    if pos.shape[1] != 1 + g * g:
        # Ported checkpoints store the pretraining grid (e.g. 14x14 for
        # B/16 at 224px); the bigResize configs run this tower at a larger
        # grid. The reference interpolates the patch pos-embeds bicubic to
        # the runtime grid (INViTE clipfolder/model.py:463 —
        # F.interpolate(size=(new,new), mode='bicubic',
        # align_corners=False); upscale-only here, so the timm path's
        # antialias flag is moot). Torch-exact kernel, no dinov2 offset.
        from patchioner_tpu.models.vit import interpolate_pos_embed

        src = int(round((pos.shape[1] - 1) ** 0.5))
        pos = interpolate_pos_embed(pos, src, g, interpolate_offset=0.0)
    x = jnp.concatenate([cls, x], axis=1) + pos.astype(cfg.dtype)
    x = _ln(x, params["ln_pre"], cfg.ln_eps)
    qkv_last = None
    depth = len(params["blocks"]) - skip_last_layers
    for i, blk in enumerate(params["blocks"][:depth]):
        is_last = i == depth - 1
        diag = i >= depth - diag_last_layers
        x, qkv = _resblock(x, blk, cfg.heads, cfg.ln_eps, return_qkv=is_last,
                           diag_attn=diag)
        if is_last:
            qkv_last = qkv
    if not skip_ln_post:
        # OpenCLIP quirk: the reference captures the transformer output with
        # a hook BEFORE ln_post and projects it directly
        # (src/model.py:766-768,848-859) — skip_ln_post reproduces that.
        x = _ln(x, params["ln_post"], cfg.ln_eps)
    proj = x @ params["proj"]
    return {
        "x_norm_clstoken": proj[:, 0],
        "x_norm_patchtokens": proj[:, 1:],
        "tokens_preproj": x,
        "qkv_last": qkv_last,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_text_forward(params: dict, tokens: jax.Array, cfg: ClipTextConfig) -> jax.Array:
    """(B, 77) int tokens -> (B, proj_dim) text embedding (EOT pooled)."""
    b, t = tokens.shape
    params = _cast_params(params, cfg.dtype)
    x = params["token_embedding"][tokens].astype(cfg.dtype)
    x = x + params["pos_embed"][:t].astype(cfg.dtype)
    causal = jnp.tril(jnp.ones((t, t), bool))
    for blk in params["blocks"]:
        x, _ = _resblock(x, blk, cfg.heads, cfg.ln_eps, causal_mask=causal)
    x = _ln(x, params["ln_final"], cfg.ln_eps)
    eot_idx = jnp.argmax((tokens == cfg.eot_token).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eot_idx]
    return pooled @ params["text_projection"]


# -------------------------------------------------------------------- port


# the one torch->numpy conversion helper lives in the porting layer
from patchioner_tpu.io.torch_port import _np  # noqa: E402


def _port_blocks_hf(sd: Mapping, prefix: str, depth: int) -> list:
    blocks = []
    for i in range(depth):
        p = f"{prefix}.layers.{i}"
        qw = _np(sd[f"{p}.self_attn.q_proj.weight"])
        kw = _np(sd[f"{p}.self_attn.k_proj.weight"])
        vw = _np(sd[f"{p}.self_attn.v_proj.weight"])
        qb = _np(sd[f"{p}.self_attn.q_proj.bias"])
        kb = _np(sd[f"{p}.self_attn.k_proj.bias"])
        vb = _np(sd[f"{p}.self_attn.v_proj.bias"])
        blocks.append(
            {
                "ln_1": {
                    "scale": _np(sd[f"{p}.layer_norm1.weight"]),
                    "bias": _np(sd[f"{p}.layer_norm1.bias"]),
                },
                "qkv": {
                    "w": np.concatenate([qw, kw, vw], 0).T,
                    "b": np.concatenate([qb, kb, vb]),
                },
                "out_proj": {
                    "w": _np(sd[f"{p}.self_attn.out_proj.weight"]).T,
                    "b": _np(sd[f"{p}.self_attn.out_proj.bias"]),
                },
                "ln_2": {
                    "scale": _np(sd[f"{p}.layer_norm2.weight"]),
                    "bias": _np(sd[f"{p}.layer_norm2.bias"]),
                },
                "fc1": {
                    "w": _np(sd[f"{p}.mlp.fc1.weight"]).T,
                    "b": _np(sd[f"{p}.mlp.fc1.bias"]),
                },
                "fc2": {
                    "w": _np(sd[f"{p}.mlp.fc2.weight"]).T,
                    "b": _np(sd[f"{p}.mlp.fc2.bias"]),
                },
            }
        )
    return blocks


def port_hf_clip_vision(sd: Mapping, depth: int) -> dict:
    """Port transformers CLIPVisionModelWithProjection-style keys
    (vision_model.* + visual_projection)."""
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])  # (D,3,P,P)
    d, c, p, _ = conv.shape
    return {
        "patch_embed_w": np.ascontiguousarray(
            conv.transpose(2, 3, 1, 0).reshape(p * p * c, d)
        ),
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).reshape(
            1, 1, -1
        ),
        "pos_embed": _np(sd["vision_model.embeddings.position_embedding.weight"])[
            None
        ],
        "ln_pre": {
            "scale": _np(sd["vision_model.pre_layrnorm.weight"]),
            "bias": _np(sd["vision_model.pre_layrnorm.bias"]),
        },
        "blocks": _port_blocks_hf(sd, "vision_model.encoder", depth),
        "ln_post": {
            "scale": _np(sd["vision_model.post_layernorm.weight"]),
            "bias": _np(sd["vision_model.post_layernorm.bias"]),
        },
        "proj": _np(sd["visual_projection.weight"]).T,
    }


def port_openai_clip_text(sd: Mapping, depth: int, prefix: str = "") -> dict:
    """Port an OpenAI-CLIP-layout text tower (token_embedding.weight,
    positional_embedding, transformer.resblocks.{i}.attn.in_proj_*,
    ln_final, text_projection) to `clip_text_forward` params.

    This layout is shared — under different key prefixes — by every text
    tower the reference trains decoders in: OpenAI CLIP / open_clip (bare
    keys, decoderTraining.py:196-208), RegionCLIP ('lang_encoder.' stripped
    by src/regionclip/loader.py:97-105), DenseCLIP ('text_encoder.',
    src/denseclip/clip_loader/denseclip_loader.py:215-217), and DINO.txt
    ('text_model.'). `prefix` selects the nesting; depth the block count.
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items()
              if k.startswith(prefix)}
    required = ["token_embedding.weight", "positional_embedding",
                "ln_final.weight", "text_projection"]
    missing = [k for k in required if k not in sd]
    if missing:
        raise KeyError(
            f"openai-clip text port (prefix={prefix!r}): missing {missing}; "
            f"got e.g. {sorted(sd)[:5]}"
        )
    params = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "pos_embed": _np(sd["positional_embedding"]),
        "ln_final": {"scale": _np(sd["ln_final.weight"]),
                     "bias": _np(sd["ln_final.bias"])},
        "text_projection": _np(sd["text_projection"]),  # stored (D, proj)
        "blocks": [],
    }
    for i in range(depth):
        p = f"transformer.resblocks.{i}"
        params["blocks"].append(
            {
                "ln_1": {"scale": _np(sd[f"{p}.ln_1.weight"]),
                         "bias": _np(sd[f"{p}.ln_1.bias"])},
                "qkv": {"w": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                        "b": _np(sd[f"{p}.attn.in_proj_bias"])},
                "out_proj": {"w": _np(sd[f"{p}.attn.out_proj.weight"]).T,
                             "b": _np(sd[f"{p}.attn.out_proj.bias"])},
                "ln_2": {"scale": _np(sd[f"{p}.ln_2.weight"]),
                         "bias": _np(sd[f"{p}.ln_2.bias"])},
                "fc1": {"w": _np(sd[f"{p}.mlp.c_fc.weight"]).T,
                        "b": _np(sd[f"{p}.mlp.c_fc.bias"])},
                "fc2": {"w": _np(sd[f"{p}.mlp.c_proj.weight"]).T,
                        "b": _np(sd[f"{p}.mlp.c_proj.bias"])},
            }
        )
    return params


def port_hf_clip_text(sd: Mapping, depth: int) -> dict:
    return {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "pos_embed": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": _port_blocks_hf(sd, "text_model.encoder", depth),
        "ln_final": {
            "scale": _np(sd["text_model.final_layer_norm.weight"]),
            "bias": _np(sd["text_model.final_layer_norm.bias"]),
        },
        "text_projection": _np(sd["text_projection.weight"]).T,
    }


# -------------------------------------------------------------------- init


def init_clip_vision(key: jax.Array, cfg: ClipVisionConfig) -> dict:
    ks = iter(jax.random.split(key, 4 + 4 * cfg.depth))
    d = cfg.width

    def dense(k, fi, fo):
        return {
            "w": jax.random.normal(k, (fi, fo)) / math.sqrt(fi),
            "b": jnp.zeros((fo,)),
        }

    def ln():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    params = {
        "patch_embed_w": jax.random.normal(
            next(ks), (cfg.patch_size**2 * 3, d)
        )
        * 0.02,
        "class_embedding": jax.random.normal(next(ks), (1, 1, d)) * 0.02,
        "pos_embed": jax.random.normal(next(ks), (1, cfg.num_tokens, d)) * 0.01,
        "ln_pre": ln(),
        "ln_post": ln(),
        "proj": jax.random.normal(next(ks), (d, cfg.proj_dim)) / math.sqrt(d),
        "blocks": [],
    }
    for _ in range(cfg.depth):
        params["blocks"].append(
            {
                "ln_1": ln(),
                "qkv": dense(next(ks), d, 3 * d),
                "out_proj": dense(next(ks), d, d),
                "ln_2": ln(),
                "fc1": dense(next(ks), d, 4 * d),
                "fc2": dense(next(ks), 4 * d, d),
            }
        )
    return params


def init_clip_text(key: jax.Array, cfg: ClipTextConfig) -> dict:
    ks = iter(jax.random.split(key, 4 + 4 * cfg.depth))
    d = cfg.width

    def dense(k, fi, fo):
        return {
            "w": jax.random.normal(k, (fi, fo)) / math.sqrt(fi),
            "b": jnp.zeros((fo,)),
        }

    def ln():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    params = {
        "token_embedding": jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02,
        "pos_embed": jax.random.normal(next(ks), (cfg.context_length, d)) * 0.01,
        "ln_final": ln(),
        "text_projection": jax.random.normal(next(ks), (d, cfg.proj_dim))
        / math.sqrt(d),
        "blocks": [],
    }
    for _ in range(cfg.depth):
        params["blocks"].append(
            {
                "ln_1": ln(),
                "qkv": dense(next(ks), d, 3 * d),
                "out_proj": dense(next(ks), d, d),
                "ln_2": ln(),
                "fc1": dense(next(ks), d, 4 * d),
                "fc2": dense(next(ks), 4 * d, d),
            }
        )
    return params


def port_openai_clip_vision(sd: Mapping, depth: int, prefix: str = "visual.") -> dict:
    """Port an openai/CLIP-layout visual tower state dict (the layout
    AlphaCLIP / INViTE checkpoints use: conv1, class_embedding,
    positional_embedding, transformer.resblocks.N.attn.in_proj_*, ln_pre/
    ln_post, proj; optional conv1_alpha for AlphaCLIP)."""

    def g(key):
        return _np(sd[prefix + key])

    conv = g("conv1.weight")  # (D, 3, P, P)
    d, c, p, _ = conv.shape
    params = {
        "patch_embed_w": np.ascontiguousarray(
            conv.transpose(2, 3, 1, 0).reshape(p * p * c, d)
        ),
        "class_embedding": g("class_embedding").reshape(1, 1, -1),
        "pos_embed": g("positional_embedding")[None],
        "ln_pre": {"scale": g("ln_pre.weight"), "bias": g("ln_pre.bias")},
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
        "proj": g("proj"),  # stored (D, proj) already
        "blocks": [],
    }
    if prefix + "conv1_alpha.weight" in sd:
        ca = g("conv1_alpha.weight")  # (D, 1, P, P)
        params["alpha_embed_w"] = np.ascontiguousarray(
            ca.transpose(2, 3, 1, 0).reshape(p * p, d)
        )
    for i in range(depth):
        q = f"transformer.resblocks.{i}"
        params["blocks"].append(
            {
                "ln_1": {"scale": g(f"{q}.ln_1.weight"), "bias": g(f"{q}.ln_1.bias")},
                "qkv": {
                    "w": g(f"{q}.attn.in_proj_weight").T,
                    "b": g(f"{q}.attn.in_proj_bias"),
                },
                "out_proj": {
                    "w": g(f"{q}.attn.out_proj.weight").T,
                    "b": g(f"{q}.attn.out_proj.bias"),
                },
                "ln_2": {"scale": g(f"{q}.ln_2.weight"), "bias": g(f"{q}.ln_2.bias")},
                "fc1": {
                    "w": g(f"{q}.mlp.c_fc.weight").T,
                    "b": g(f"{q}.mlp.c_fc.bias"),
                },
                "fc2": {
                    "w": g(f"{q}.mlp.c_proj.weight").T,
                    "b": g(f"{q}.mlp.c_proj.bias"),
                },
            }
        )
    return params


def init_alpha_embed(key: jax.Array, cfg: ClipVisionConfig) -> jax.Array:
    return jax.random.normal(
        key, (cfg.patch_size**2, cfg.width), jnp.float32
    ) * 0.02
