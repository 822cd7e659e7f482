"""ProxyCLIP — CLIP whose last attention is a DINO proxy affinity.

Reference: src/proxyclip/proxyclip.py:6-86 + the vendored open_clip fork's
custom visual forward (open_clip_proxy/transformer.py:503-588). Flow:

  1. A frozen VFM (DINO/DINOv2) produces patch features; their pairwise
     cosine similarity forms the affinity: sim = (sim - mean(sim)*beta)*gamma,
     negatives masked to -inf, softmax (:560-578).
  2. The CLIP visual trunk runs all resblocks except the last; the last block
     is REPLACED by attention with the proxy affinity as weights over CLIP's
     value vectors (bilinearly resampled from CLIP's token grid onto the
     VFM grid) — no residual, no MLP (:526-531, :580-586).
  3. ln_post + projection over all tokens; the output is patch tokens only
     (on the VFM grid), L2-normalized (:75-86).

Built from the framework's own towers: models/vit (the VFM) + the CLIP
resblock machinery (models/clip private helpers).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models import vit as vit_mod

__all__ = ["ProxyClipConfig", "proxyclip_forward"]


@dataclasses.dataclass(frozen=True)
class ProxyClipConfig:
    clip: clip_mod.ClipVisionConfig = dataclasses.field(
        default_factory=clip_mod.ClipVisionConfig
    )
    vfm: vit_mod.ViTConfig = dataclasses.field(
        default_factory=lambda: vit_mod.config_for("dinov2_vitb14_reg")
    )
    beta: float = 1.2
    gamma: float = 3.0

    # Patchioner reads geometry from the VFM (reference: patch_size from the
    # vfm patch embed, src/model.py:193-196).
    @property
    def patch_size(self) -> int:
        return self.vfm.patch_size

    @property
    def img_size(self) -> int:
        return self.vfm.img_size

    @property
    def grid_size(self) -> int:
        return self.vfm.grid_size


def _interp_pos(pos, src_grid, dst_grid):
    # ProxyCLIP's CLIP fork interpolates its pos-embeds with the SAME
    # dinov2-style quirk as the DINO tower — bicubic with
    # scale_factor=(dst+0.1)/src (proxyclip.py:540-558) — so reuse the
    # torch-exact kernel with its default 0.1 offset.
    from patchioner_tpu.models.vit import interpolate_pos_embed

    return interpolate_pos_embed(pos, src_grid, dst_grid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def proxyclip_forward(
    clip_params: dict,
    vfm_params: dict,
    pixels: jax.Array,
    cfg: ProxyClipConfig,
) -> dict:
    """(B, H, W, 3) -> {'x_norm_patchtokens': (B, N_vfm, proj)} — normalized,
    on the VFM patch grid (reference returns patch tokens only)."""
    ccfg = cfg.clip
    b, hh, ww, _ = pixels.shape

    # ---- VFM features (final normalized patch tokens, get_intermediate_
    # layers(norm=True) equivalent)
    vfm_out = vit_mod.vit_forward(vfm_params, pixels, cfg.vfm)
    ex = vfm_out["x_norm_patchtokens"]  # (B, Nv, Dv)
    gv = cfg.vfm.grid_size

    # Proxy affinity (transformer.py:570-578): channel-normalized features,
    # pairwise dot, global-mean shift, negatives -> -inf.
    exn = ex / jnp.linalg.norm(ex, axis=-1, keepdims=True)
    sim = jnp.einsum("bmd,bnd->bmn", exn, exn).astype(jnp.float32)
    sim = (sim - jnp.mean(sim) * cfg.beta) * cfg.gamma
    sim = jnp.where(sim < 0.0, -jnp.inf, sim)
    affinity = jax.nn.softmax(sim, axis=-1)  # (B, Nv, Nv)

    # ---- CLIP trunk: patch embed + pos (interpolated) + ln_pre + blocks[:-1]
    gc = hh // ccfg.patch_size
    x = pixels.astype(ccfg.dtype)
    if hh != gc * ccfg.patch_size:
        # the reference's strided conv1 (kernel=stride=patch, no padding)
        # FLOORS the grid, dropping the bottom/right remainder pixels —
        # both shipped ProxyCLIP crops are non-divisible (518 and 296 vs
        # patch 16), so slice before the reshape-based embed
        x = x[:, : gc * ccfg.patch_size, : gc * ccfg.patch_size, :]
    x = x.reshape(b, gc, ccfg.patch_size, gc, ccfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gc * gc, -1)
    x = x @ clip_params["patch_embed_w"]
    cls = jnp.broadcast_to(
        clip_params["class_embedding"].astype(ccfg.dtype), (b, 1, ccfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = _interp_pos(clip_params["pos_embed"], ccfg.grid_size, gc)
    x = x + pos.astype(ccfg.dtype)
    x = clip_mod._ln(x, clip_params["ln_pre"], ccfg.ln_eps)
    for blk in clip_params["blocks"][:-1]:
        x, _ = clip_mod._resblock(x, blk, ccfg.heads, ccfg.ln_eps)

    # ---- Custom last layer (transformer.py:560-586): values from the last
    # block's v projection, resampled to the VFM grid, re-mixed by the proxy
    # affinity, out_proj — no residual, no MLP, cls dropped.
    blk = clip_params["blocks"][-1]
    h = clip_mod._ln(x, blk["ln_1"], ccfg.ln_eps)
    qkv = clip_mod._dense(h, blk["qkv"])
    _, _, v = jnp.split(qkv, 3, axis=-1)  # (B, 1+gc*gc, D)
    nh = ccfg.heads
    hd = ccfg.width // nh
    v_patch = v[:, 1:].reshape(b, gc, gc, nh, hd)
    v_patch = jax.image.resize(
        v_patch, (b, gv, gv, nh, hd), method="bilinear"
    ).reshape(b, gv * gv, nh, hd)
    out = jnp.einsum(
        "bmn,bnhd->bmhd", affinity.astype(v_patch.dtype), v_patch
    ).reshape(b, gv * gv, ccfg.width)
    out = clip_mod._dense(out, blk["out_proj"])

    out = clip_mod._ln(out, clip_params["ln_post"], ccfg.ln_eps)
    out = out @ clip_params["proj"]
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return {"x_norm_patchtokens": out.astype(jnp.float32)}
