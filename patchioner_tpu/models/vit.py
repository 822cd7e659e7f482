"""DINOv2-style ViT encoder, functional JAX.

Replaces the reference's torch.hub DINOv2 + forward-hook attention capture
(src/model.py:343,589-590; src/dino_extraction.py) with a single pure function
that returns the token dict *and* the last-block fused-qkv activations as
first-class outputs — no hooks, one jit-compiled trace, bf16-friendly.

Architecture parity targets facebookresearch/dinov2 ViT (patch-embed conv,
CLS + optional 4 register tokens, pre-LN blocks with LayerScale, exact GELU,
final LayerNorm) and the timm/OpenAI CLIP ViT variant (quick-GELU, pre/post
LN, attention pooling skipped — see clip_vit.py).

Params are plain nested dicts (easy torch checkpoint porting — io/torch_port.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ViTConfig", "init_vit", "vit_forward", "process_self_attention",
           "reorder_qkv_params", "interpolate_pos_embed"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    # 'mlp' (fc1 -> GELU -> fc2, every S/B/L DINOv2) | 'swiglu'
    # (w12 -> silu(x1)*x2 -> w3 — DINOv2-giant's SwiGLUFFNFused; the
    # reference reaches it through torch.hub delegation, src/model.py:343,
    # and dispatches its 1536-d features at src/model.py:127).
    ffn: str = "mlp"
    num_registers: int = 4  # 0 for non-"reg" variants
    layerscale: bool = True
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    pos_grid: Optional[int] = None  # grid the stored pos-embed was trained at
    # 'xla' | 'fusedqkv' | 'fusedqkv_proj' | 'flash' | 'flash1p' |
    # 'flash_builtin' ('fusedqkv' is the TPU flagship default — the
    # transpose-free Pallas head-pair kernel over the fused qkv activation;
    # 'fusedqkv_proj' additionally folds out-proj+layerscale+residual into
    # the kernel epilogue — PERF.md for measurements)
    attn_impl: str = "xla"
    # f32 attention softmax (parity default). Only consulted by the 'xla'
    # impl: every Pallas kernel (fusedqkv/flash*) accumulates logits and
    # runs softmax in f32 unconditionally, so softmax_f32=False is a no-op
    # there (_attention raises if you explicitly ask for the combination).
    softmax_f32: bool = True
    # tanh-approximate GELU: ~9% faster encoder layers on v5e (45.8 vs
    # 50.4 ms at the flagship shape — erf is expensive on the VPU) but a
    # numerics change vs the reference's exact nn.GELU, so opt-in only.
    gelu_approx: bool = False
    # fused LN+fc1+GELU+fc2+residual Pallas kernel for the MLP half —
    # keeps the (B, N, 4D) intermediate in VMEM. 31.2 vs 38.1 ms/layer on
    # v5e combined with fusedqkv (PERF.md). Requires N%128==0 (i.e. the
    # fusedqkv padded-token path); TPU-only. On SwiGLU towers (giant)
    # this dispatches to the streamed-weight fused_ln_swiglu kernel,
    # which MEASURED SLOWER than XLA (97.6 vs 92.4 ms/layer at B=128,
    # probe_swiglu2 round 3b) — leave it off there unless re-measured.
    mlp_fused: bool = False
    # fold the attention half's LN into the qkv projection
    # (ops/mlp.fused_ln_dense) — XLA materializes the LN output, ~0.73
    # ms/layer of (B, N, D) traffic at the flagship shape (PERF.md round
    # 3). Same N%128==0 requirement; TPU-only; identical numerics.
    qkv_fused: bool = False
    # run the attention out-projection + layerscale + residual as one
    # pinned-weight Pallas kernel (ops/mlp.fused_dense_residual) instead of
    # XLA's fused dot+elementwise — only consulted by the 'fusedqkv' impl.
    # Measured a statistical TIE with XLA at the flagship shape (5.37 vs
    # 5.40 ms isolated, 29.05 vs 29.11 full layer — XLA already fuses the
    # ls-mul+residual into the dot epilogue; PERF.md round 3), so this
    # stays a tested opt-in, not a flagship default. Same N%128==0
    # requirement; TPU-only; identical numerics.
    proj_fused: bool = False
    # Attention-extraction quirks — the reference hard-codes 16 heads and a
    # 0.125 scale for *all* non-small models, regardless of the true head
    # count (src/model.py:336-337, src/dino_extraction.py:24-34). Caption
    # parity requires reproducing that exact (wrong) head split.
    extract_heads: int = 16
    extract_scale: float = 0.125
    dtype: jnp.dtype = jnp.float32

    _ATTN_IMPLS = ("xla", "fusedqkv", "fusedqkv_proj", "flash", "flash1p",
                   "flash_builtin")

    def __post_init__(self):
        # a typo'd impl (config or PATCHIONER_BENCH_ATTN) must fail, not
        # silently fall through _attention's if/elif chain to the XLA path
        # and report XLA numbers under the requested kernel's name
        if self.attn_impl not in self._ATTN_IMPLS:
            raise ValueError(
                f"attn_impl={self.attn_impl!r} is not one of "
                f"{self._ATTN_IMPLS}"
            )

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_global_tokens(self) -> int:
        return 1 + self.num_registers

    @property
    def num_tokens(self) -> int:
        return self.num_global_tokens + self.num_patches

    @property
    def stored_pos_grid(self) -> int:
        return self.pos_grid if self.pos_grid is not None else self.grid_size

    @property
    def ffn_hidden(self) -> int:
        """Hidden width of the FFN. SwiGLU shrinks the nominal 4x by 2/3
        rounded up to a multiple of 8 — both dinov2's SwiGLUFFNFused and
        HF's Dinov2SwiGLUFFN use this formula (1536*4 -> 4096 for giant)."""
        h = int(self.embed_dim * self.mlp_ratio)
        if self.ffn == "swiglu":
            h = (int(h * 2 / 3) + 7) // 8 * 8
        return h


VARIANTS = {
    # name fragments follow torch.hub dinov2 ids (reference: src/model.py:343)
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6, num_registers=0,
                          extract_heads=6),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12, num_registers=0),
    "dinov2_vitl14": dict(embed_dim=1024, depth=24, num_heads=16, num_registers=0),
    "dinov2_vits14_reg": dict(embed_dim=384, depth=12, num_heads=6, num_registers=4,
                              extract_heads=6),
    "dinov2_vitb14_reg": dict(embed_dim=768, depth=12, num_heads=12, num_registers=4),
    "dinov2_vitl14_reg": dict(embed_dim=1024, depth=24, num_heads=16, num_registers=4),
    # giant uses the fused-SwiGLU FFN (dinov2 vit_giant2 / HF use_swiglu_ffn)
    "dinov2_vitg14": dict(embed_dim=1536, depth=40, num_heads=24, num_registers=0,
                          ffn="swiglu"),
    "dinov2_vitg14_reg": dict(embed_dim=1536, depth=40, num_heads=24,
                              num_registers=4, ffn="swiglu"),
}


def config_for(dino_model: str, img_size: int = 518, **overrides) -> ViTConfig:
    if dino_model not in VARIANTS:
        raise ValueError(f"unknown DINOv2 variant: {dino_model}")
    kw = dict(VARIANTS[dino_model])
    kw.update(overrides)
    # DINOv2 checkpoints store the 518px (37x37) pos-embed grid.
    kw.setdefault("pos_grid", 37)
    return ViTConfig(img_size=img_size, **kw)


# ------------------------------------------------------------------- init


def init_vit(key: jax.Array, cfg: ViTConfig) -> dict:
    """Random init matching DINOv2's layout (trunc-normal-ish; exactness of
    init doesn't matter — real use ports pretrained weights)."""
    d = cfg.embed_dim
    h = cfg.ffn_hidden
    keys = iter(jax.random.split(key, 8 + 8 * cfg.depth))

    def dense(k, fan_in, fan_out):
        w = jax.random.normal(k, (fan_in, fan_out), jnp.float32) * (
            1.0 / math.sqrt(fan_in)
        )
        return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}

    params = {
        "patch_embed": dense(
            next(keys), cfg.patch_size * cfg.patch_size * 3, d
        ),
        "cls_token": jax.random.normal(next(keys), (1, 1, d), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (1, 1 + cfg.stored_pos_grid**2, d), jnp.float32
        )
        * 0.02,
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": [],
    }
    if cfg.num_registers:
        params["register_tokens"] = (
            jax.random.normal(next(keys), (1, cfg.num_registers, d), jnp.float32)
            * 0.02
        )
    for _ in range(cfg.depth):
        blk = {
            "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": dense(next(keys), d, 3 * d),
            "proj": dense(next(keys), d, d),
            "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        }
        if cfg.ffn == "swiglu":
            blk["w12"] = dense(next(keys), d, 2 * h)
            blk["w3"] = dense(next(keys), h, d)
        else:
            blk["fc1"] = dense(next(keys), d, h)
            blk["fc2"] = dense(next(keys), h, d)
        if cfg.layerscale:
            blk["ls1"] = jnp.full((d,), 1e-5)
            blk["ls2"] = jnp.full((d,), 1e-5)
        params["blocks"].append(blk)
    return params


# ---------------------------------------------------------------- forward


def _ln(x, p, eps):
    # f32 statistics regardless of activation dtype (bf16-safe).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    if "w_q" in p:
        return _dense_w8a8(x, p)
    return x @ p["w"] + p["b"]


def _dense_w8a8(x, p):
    """int8 x int8 -> int32 matmul with dynamic per-token activation
    quantization and per-output-channel weight scales. v5e's MXU runs
    int8 at 394 TOPS — 2x the bf16 rate — so this is the remaining
    on-chip speed lever for the roofline-bound encoder (PERF.md).

    x: (..., Ci) bf16/f32; p: {'w_q': (Ci, Co) int8,
    'w_scale': (1, Co), 'b': (Co,)}.
    """
    # ONE activation-quant formula across every W8A8 path
    # (ops/mlp.quantize_symmetric_int8 and _w8_kernel use the identical
    # max(amax/127, 1e-12) scale) — a drifted epsilon here once put the
    # XLA and fused-kernel int8 encoders on subtly different numerics
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs * p["w_scale"].astype(jnp.float32)
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def quantize_vit_weights(
    params: dict, targets=("qkv", "proj", "fc1", "fc2", "w12", "w3")
) -> dict:
    """Per-output-channel symmetric int8 quantization of the transformer
    matmul weights (the 4 big dots: ~97% of encoder FLOPs). Everything
    else — patch embed, LN, layerscale, cls/pos/reg tokens — stays
    full precision. Returns a new param tree; forwards route through
    the W8A8 path automatically when 'w_q' is present."""

    from patchioner_tpu.ops.mlp import quantize_symmetric_int8

    def quant(p):
        w_q, scale = quantize_symmetric_int8(jnp.asarray(p["w"]), axis=0)
        return {"w_q": w_q, "w_scale": scale, "b": p["b"]}

    out = dict(params)
    out["blocks"] = [
        {k: (quant(v) if k in targets else v) for k, v in blk.items()}
        for blk in params["blocks"]
    ]
    return out


def _torch_bicubic_matrix(src: int, dst: int, rscale: float):
    """(dst, src) interpolation weights reproducing torch's bicubic
    upsample exactly: Keys cubic convolution with A=-0.75
    (jax.image.resize uses A=-0.5 — numerics differ in the 1e-3 range),
    source coords ``rscale*(dst+0.5)-0.5``, edge taps clamped. rscale is
    the src-pixels-per-dst-pixel ratio torch derives from the caller's
    scale_factor (its reciprocal) or size (src/dst)."""
    import numpy as np

    A = -0.75

    def conv1(x):  # |x| <= 1 branch of the Keys kernel
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def conv2(x):  # 1 < |x| < 2 branch
        return (((x - 5) * x + 8) * x - 4) * A

    xs = rscale * (np.arange(dst, dtype=np.float64) + 0.5) - 0.5
    x0 = np.floor(xs)
    t = xs - x0
    coeffs = [conv2(t + 1.0), conv1(t), conv1(1.0 - t), conv2(2.0 - t)]
    w = np.zeros((dst, src), np.float64)
    rows = np.arange(dst)
    for k in range(4):
        idx = np.clip(x0 + k - 1, 0, src - 1).astype(np.int64)
        np.add.at(w, (rows, idx), coeffs[k])
    return jnp.asarray(w, jnp.float32)


def interpolate_pos_embed(
    pos_embed: jax.Array, src_grid: int, dst_grid: int,
    *, interpolate_offset: float = 0.1,
) -> jax.Array:
    """Bicubic pos-embed interpolation (CLS kept, patch grid resized) —
    torch-exact replica of dinov2's interpolate_pos_encoding: the grid is
    resized in f32 with torch's A=-0.75 bicubic kernel, and when
    interpolate_offset is set (dinov2's default 0.1) torch receives
    scale_factor=(dst+offset)/src and maps coordinates through its
    reciprocal — NOT dst/src — so the resampling positions carry dinov2's
    small-offset quirk. interpolate_offset=0 reproduces the size=(dst,dst)
    call (coordinate scale src/dst)."""
    if src_grid == dst_grid:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    dtype = pos_embed.dtype
    patch_pos = pos_embed[:, 1:].astype(jnp.float32).reshape(
        src_grid, src_grid, -1
    )
    if interpolate_offset:
        rscale = float(src_grid) / (dst_grid + interpolate_offset)
    else:
        rscale = float(src_grid) / dst_grid
    w = _torch_bicubic_matrix(src_grid, dst_grid, rscale)
    patch_pos = jnp.tensordot(w, patch_pos, axes=[[1], [0]])  # rows
    patch_pos = jnp.tensordot(w, patch_pos, axes=[[1], [1]])  # cols
    patch_pos = patch_pos.transpose(1, 0, 2)  # (dst_y, dst_x, D)
    return jnp.concatenate(
        [cls_pos, patch_pos.reshape(1, dst_grid * dst_grid, -1).astype(dtype)],
        axis=1,
    )


def _fused_qkv_merged(qkv, cfg: ViTConfig, num_real_k):
    """Merged-head attention output via the transpose-free head-pair Pallas
    kernel on the fused (B, N, 3D) qkv activation. Measured 38.1 ms/layer
    vs 50.5 XLA at the flagship shape (B=128, N padded 1374->1408, bf16,
    v5e) — PERF.md. Requires N%128==0 (vit_forward pads) with real keys
    masked via num_real_k. Shared by the 'fusedqkv' attn impl and the
    proj_fused block path so the softmax contract and block_q policy have
    one home."""
    if not cfg.softmax_f32:
        raise ValueError(
            "attn_impl='fusedqkv' always runs an f32 softmax in-kernel; "
            "softmax_f32=False has no effect there — use attn_impl='xla' "
            "for a compute-dtype softmax"
        )
    from patchioner_tpu.ops.attention import fused_qkv_attention

    n = qkv.shape[1]
    d = qkv.shape[2] // 3
    hd = d // cfg.num_heads
    # whole-N q-blocks are the bf16 winner; at f32 the two per-program
    # (block_q, N) f32 logits overflow the 16 MB scoped-VMEM limit
    # (23.8 MB at N=1408), so cap the block for wider dtypes.
    bq = n if qkv.dtype == jnp.bfloat16 else min(n, 512)
    return fused_qkv_attention(
        qkv, num_heads=cfg.num_heads, scale=hd**-0.5,
        num_real_k=num_real_k, block_q=bq,
    )


def _attention(x_norm, blk, cfg: ViTConfig, return_qkv: bool,
               num_real_k=None, qkv_pre=None):
    # (B, N, 3D); `qkv_pre` comes from the fused LN+qkv kernel (qkv_fused)
    qkv = qkv_pre if qkv_pre is not None else _dense(x_norm, blk["qkv"])
    b, n, three_d = qkv.shape
    d = three_d // 3
    nh = cfg.num_heads
    hd = d // nh
    if cfg.attn_impl == "fusedqkv":
        merged = _fused_qkv_merged(qkv, cfg, num_real_k)
        out = _dense(merged, blk["proj"])
        return (out, qkv) if return_qkv else (out, None)
    if not cfg.softmax_f32 and cfg.attn_impl != "xla":
        # same contract as the fusedqkv impls (see _fused_qkv_merged): all
        # Pallas kernels run an f32 softmax unconditionally, so an explicit
        # softmax_f32=False request must fail rather than silently report
        # f32 numbers under the bf16-softmax name
        raise ValueError(
            f"attn_impl={cfg.attn_impl!r} always runs an f32 softmax "
            "in-kernel; softmax_f32=False has no effect there — use "
            "attn_impl='xla' for a compute-dtype softmax"
        )
    q, k, v = jnp.split(qkv.reshape(b, n, 3, nh, hd), 3, axis=2)
    q = q.squeeze(2).transpose(0, 2, 1, 3)  # (B, H, N, hd)
    k = k.squeeze(2).transpose(0, 2, 1, 3)
    v = v.squeeze(2).transpose(0, 2, 1, 3)
    if (num_real_k is not None and num_real_k < n
            and cfg.attn_impl in ("flash", "flash1p", "flash_builtin")):
        # unreachable today (only the fusedqkv impls lane-pad N), but the
        # flash kernels have no pad-key mask — fail loudly over silently
        # attending to garbage rows
        raise NotImplementedError(
            f"attn_impl={cfg.attn_impl!r} got lane-padded tokens "
            f"(num_real_k={num_real_k} < N={n}) and has no pad mask"
        )
    if cfg.attn_impl == "flash":
        from patchioner_tpu.ops.attention import flash_attention

        out = flash_attention(q, k, v, scale=hd**-0.5)
    elif cfg.attn_impl == "flash1p":
        from patchioner_tpu.ops.attention import flash_attention_1pass

        out = flash_attention_1pass(q, k, v, scale=hd**-0.5)
    elif cfg.attn_impl == "flash_builtin":
        # jax's bundled TPU flash kernel — opt-in only. Measured on v5e at
        # this workload's shapes (hd=64, N=1374, bf16, B=128): 1649ms per
        # 12-layer encoder vs 585ms for plain XLA attention, plus a ~250s
        # Mosaic compile. Kept as an option for other shapes/jax versions.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as builtin_flash,
        )

        pad = (-n) % 128
        if pad:
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            seg = jnp.concatenate(
                [jnp.ones((b, n), jnp.int32), jnp.zeros((b, pad), jnp.int32)],
                axis=1,
            )
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
            )

            out = builtin_flash(
                qp, kp, vp, segment_ids=SegmentIds(seg, seg),
                sm_scale=hd**-0.5,
            )[:, :, :n]
        else:
            out = builtin_flash(q, k, v, sm_scale=hd**-0.5)
    else:
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (hd**-0.5), k)
        if num_real_k is not None and num_real_k < n:
            # lane-padded tokens (the fusedqkv impls pad N to %128; a
            # fusion fallback can land here with the padding already
            # applied): padded key rows are LN-of-zero garbage and must
            # get zero softmax weight, exactly like the fused kernel's
            # in-kernel mask. Large-negative (not -inf) keeps the padded
            # QUERY rows finite — they are sliced off after the stack.
            kmask = jnp.arange(n) < num_real_k
            attn = jnp.where(kmask[None, None, None, :], attn,
                             jnp.asarray(-1e30, attn.dtype))
        if cfg.softmax_f32:
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                qkv.dtype
            )
        else:
            # keep the (B, H, N, N) intermediate in the compute dtype —
            # halves the dominant HBM traffic of the encoder at large
            # batch (the attention matrix dwarfs every other tensor)
            attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = _dense(out, blk["proj"])
    return (out, qkv) if return_qkv else (out, None)


def _use_fused_qkv(x, blk, cfg: ViTConfig) -> bool:
    return (cfg.qkv_fused and x.shape[1] % 128 == 0
            and "w" in blk["qkv"])


def _qkv_fused_block(n: int, d: int, w_bytes: int, item: int):
    """Largest q-block for fused_ln_dense whose per-program footprint
    (pinned W_qkv + x/out blocks + the normed temp ~ bq*5d*item) fits
    scoped VMEM, or None when none does. Calibrated on v5e
    (probe_lnqkv_giant round 3b): giant (D=1536, W 14.2 MB) compiles at
    bq<=352 (est 19.6 MB) and fails at bq704 (est 25.0 MB); ViT-B/L are
    far under the cap at bq704."""
    return next(
        (b for b in (704, 512, 352, 256, 128)
         if n % b == 0 and w_bytes + b * 5 * d * item <= 21_000_000),
        None,
    )


def _qkv_activation(x, blk, cfg: ViTConfig):
    """qkv = LN(x) @ W_qkv + b, via the fused LN+dense kernel when enabled
    (qkv_fused — avoids materializing the LN output, PERF.md round 3)."""
    if _use_fused_qkv(x, blk, cfg):
        from patchioner_tpu.ops.mlp import fused_ln_dense

        n = x.shape[1]
        d = x.shape[-1]
        item = jnp.dtype(cfg.dtype).itemsize
        w_bytes = blk["qkv"]["w"].size * blk["qkv"]["w"].dtype.itemsize
        bq = _qkv_fused_block(n, d, w_bytes, item)
        if bq is not None:
            return fused_ln_dense(
                x, blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["qkv"]["w"], blk["qkv"]["b"], eps=cfg.ln_eps,
                block_q=bq,
            )
        _warn_fusion_unusable(
            "qkv_fused",
            f"no 128-aligned q-block of N={n} fits scoped VMEM next to "
            f"the {w_bytes / 1e6:.1f} MB pinned W_qkv",
            "the unfused LN+qkv XLA path",
        )
    _warn_qkv_fused_unusable(x, blk, cfg)
    return _dense(_ln(x, blk["norm1"], cfg.ln_eps), blk["qkv"])


def _warn_fusion_unusable(flag: str, reason: str, fallback: str):
    """Shared unusable-opt-in warning (ADVICE r2): a kernel-fusion flag
    that silently benchmarks the unfused path is a trap — every fusion
    knob (qkv_fused / proj_fused / mlp_fused) says so through here."""
    import warnings

    warnings.warn(
        f"{flag} requested but unusable here ({reason}); "
        f"falling back to {fallback}",
        stacklevel=3,
    )


def _warn_qkv_fused_unusable(x, blk, cfg: ViTConfig):
    if cfg.qkv_fused and not _use_fused_qkv(x, blk, cfg):
        _warn_fusion_unusable(
            "qkv_fused",
            f"N={x.shape[1]} % 128 != 0 — needs the fusedqkv padded-token "
            "path — or quantized qkv weights",
            "the unfused LN+qkv XLA path",
        )


def _block(x, blk, cfg: ViTConfig, return_qkv: bool = False,
           num_real_k=None):
    if cfg.attn_impl == "fusedqkv_proj" and "w" in blk["proj"]:
        # Attention + out-proj + layerscale + residual in ONE kernel — the
        # merged (B, N, D) attention output never round-trips HBM
        # (ops/attention.fused_qkv_attention_proj; VERDICT r2 #6 attempt).
        # Quantized (W8A8) proj weights can't pin into the kernel — that
        # combination warns and takes the XLA path below.
        from patchioner_tpu.ops.attention import fused_qkv_attention_proj

        if not cfg.softmax_f32:
            raise ValueError(
                "attn_impl='fusedqkv_proj' always runs an f32 softmax "
                "in-kernel; use attn_impl='xla' for a compute-dtype softmax"
            )
        d = x.shape[-1]
        nh = cfg.num_heads
        qkv = _qkv_activation(x, blk, cfg)
        ls1 = blk["ls1"] if cfg.layerscale else jnp.ones((d,), x.dtype)
        # dtype-aware q-block cap: the kernel's own 704 default overflows
        # the 16 MB scoped-VMEM limit in the WHOLE-MODEL compile even at
        # bf16 (measured round 4: 17.69 MB at N=1408 — the epilogue's
        # x/out/w/accumulator blocks ride on top of the (block_q, N)
        # logits), and f32 doubles the logits again
        n_tok = x.shape[1]
        pbq = (
            min(n_tok, 512) if qkv.dtype == jnp.bfloat16
            else min(n_tok, 256)
        )
        pbq = next(b for b in (pbq, 512, 352, 256, 128) if n_tok % b == 0)
        x = fused_qkv_attention_proj(
            qkv, x, blk["proj"]["w"], blk["proj"]["b"], ls1,
            num_heads=nh, scale=(d // nh) ** -0.5, num_real_k=num_real_k,
            block_q=pbq,
        )
        qkv = qkv if return_qkv else None
    elif (cfg.attn_impl == "fusedqkv" and cfg.proj_fused
          and x.shape[1] % 128 == 0 and "w" in blk["proj"]):
        # Out-projection + layerscale + residual as one pinned-weight
        # kernel (ops/mlp.fused_dense_residual) on the merged attention
        # output — proj weights stay in VMEM and the ls1-mul + add never
        # run as separate XLA elementwise traffic.
        from patchioner_tpu.ops.mlp import fused_dense_residual

        d = x.shape[-1]
        n = x.shape[1]
        qkv = _qkv_activation(x, blk, cfg)
        merged = _fused_qkv_merged(qkv, cfg, num_real_k)
        ls1 = blk["ls1"] if cfg.layerscale else jnp.ones((d,), x.dtype)
        proj_bq = next(b for b in (704, 512, 352, 256, 128) if n % b == 0)
        x = fused_dense_residual(
            merged, x, blk["proj"]["w"], blk["proj"]["b"], ls1,
            block_q=proj_bq,
        )
        qkv = qkv if return_qkv else None
    else:
        if cfg.attn_impl == "fusedqkv_proj":
            _warn_fusion_unusable(
                "fusedqkv_proj",
                "quantized (W8A8) out-projection weights",
                "XLA attention + out-projection",
            )
        if cfg.proj_fused:
            _warn_fusion_unusable(
                "proj_fused",
                f"attn_impl={cfg.attn_impl!r} (needs 'fusedqkv')"
                if cfg.attn_impl != "fusedqkv"
                else f"N={x.shape[1]} % 128 != 0 or quantized proj weights",
                "the XLA out-projection",
            )
        if _use_fused_qkv(x, blk, cfg):
            a, qkv = _attention(None, blk, cfg, return_qkv, num_real_k,
                                qkv_pre=_qkv_activation(x, blk, cfg))
        else:
            _warn_qkv_fused_unusable(x, blk, cfg)
            a, qkv = _attention(_ln(x, blk["norm1"], cfg.ln_eps), blk, cfg,
                                return_qkv, num_real_k)
        if cfg.layerscale:
            a = a * blk["ls1"]
        x = x + a
    n = x.shape[1]
    if cfg.ffn == "swiglu":
        # DINOv2-giant FFN: silu(x1) * x2 over a fused (D, 2H) projection
        # (dinov2 SwiGLUFFNFused / HF Dinov2SwiGLUFFN semantics).
        hid = blk["w3"]["w"].shape[0] if "w" in blk.get("w3", {}) else 0
        bq = bh = None
        # hid == 0 means w3 lacks a plain 'w' (e.g. quantized) — it must
        # take the fallback, not pass the % checks (0 % anything == 0)
        if cfg.mlp_fused and "w" in blk["w12"] and hid and hid % 128 == 0:
            # streamed-weight kernel: pick the largest (block_q, block_h)
            # whose per-program footprint fits scoped VMEM (~16 MB with
            # Mosaic's ~1.5x accounting over a naive tile sum — same
            # calibration as ops/memory_projection): x/out/y_scr blocks +
            # f32 accumulator + double-buffered streamed weight tiles +
            # f32 hidden temporaries.
            d_ = x.shape[-1]
            item = jnp.dtype(cfg.dtype).itemsize
            for cq in (352, 256, 176, 128):
                if n % cq:
                    continue
                for ch in (512, 256, 128):
                    if hid % ch:
                        continue
                    est = (3 * cq * d_ * item + 4 * cq * d_
                           + 2 * 3 * d_ * ch * item + 3 * cq * ch * 4)
                    if est <= 14_000_000:
                        bq, bh = cq, ch
                        break
                if bq:
                    break
        if cfg.mlp_fused and bq is None:
            _warn_fusion_unusable(
                "mlp_fused",
                f"N={n} has no 128-aligned q-block, H={hid} % 128 != 0, "
                "quantized w12, or no (block_q, block_h) fits VMEM at "
                f"dtype={jnp.dtype(cfg.dtype).name}",
                "the unfused XLA SwiGLU",
            )
        if bq is not None:
            from patchioner_tpu.ops.mlp import fused_ln_swiglu

            ls = blk["ls2"] if cfg.layerscale else jnp.ones(
                (x.shape[-1],), x.dtype
            )
            return fused_ln_swiglu(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["w12"]["w"], blk["w12"]["b"],
                blk["w3"]["w"], blk["w3"]["b"], ls,
                eps=cfg.ln_eps, block_q=bq, block_h=bh,
            ), qkv
        h = _dense(_ln(x, blk["norm2"], cfg.ln_eps), blk["w12"])
        x1, x2 = jnp.split(h, 2, axis=-1)
        m = _dense(jax.nn.silu(x1) * x2, blk["w3"])
        if cfg.layerscale:
            m = m * blk["ls2"]
        return x + m, qkv
    if cfg.mlp_fused and not (n % 128 == 0 and "w" in blk["fc1"]):
        _warn_fusion_unusable(
            "mlp_fused",
            f"N={n} % 128 != 0 or quantized fc1",
            "the unfused XLA MLP",
        )
    if cfg.mlp_fused and n % 128 == 0 and "w" in blk["fc1"]:
        from patchioner_tpu.ops.mlp import fused_ln_mlp

        # VMEM pressure sets the q-block: both weight matrices stay pinned
        # (2·d·4d·itemsize), so large-d towers want the smallest block.
        # Measured on v5e: ViT-B (9.4 MB weights) best at bq704
        # (14.5 ms/half), ViT-L (16.8 MB) best at bq128 (25.7 vs 28.1).
        w_bytes = 2 * blk["fc1"]["w"].size * blk["fc1"]["w"].dtype.itemsize
        cands = (128,) if w_bytes > 12_000_000 else (704, 512, 256, 128)
        bq = next(b for b in cands if n % b == 0)
        ls = blk["ls2"] if cfg.layerscale else jnp.ones(
            (x.shape[-1],), x.dtype
        )
        return fused_ln_mlp(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["fc1"]["w"], blk["fc1"]["b"],
            blk["fc2"]["w"], blk["fc2"]["b"], ls,
            eps=cfg.ln_eps, gelu_approx=cfg.gelu_approx, block_q=bq,
        ), qkv
    m = _dense(
        jax.nn.gelu(_dense(_ln(x, blk["norm2"], cfg.ln_eps), blk["fc1"]),
                    approximate=cfg.gelu_approx),
        blk["fc2"],
    )
    if cfg.layerscale:
        m = m * blk["ls2"]
    return x + m, qkv


@functools.partial(
    jax.jit, static_argnames=("cfg", "return_block_input", "keep_qkv_padded",
                              "keep_tokens_padded")
)
def vit_forward(params: dict, pixels: jax.Array, cfg: ViTConfig,
                return_block_input: bool = False,
                keep_qkv_padded: bool = False,
                keep_tokens_padded: bool = False) -> dict:
    """Run the encoder.

    Args:
      params: nested param dict (init_vit / io.torch_port).
      pixels: (B, H, W, 3) normalized images (NHWC — TPU-native layout).
      cfg: static ViTConfig.
      return_block_input: also return the input to the last block (the
        reference's `get_layer_n_output` hook, used by double-DINO bbox mode).
      keep_qkv_padded: on the fusedqkv lane-padded path, return `qkv_last`
        still carrying its padded token axis instead of paying the unpad
        copy; pass `num_real_k=cfg.num_global_tokens + grid²` to
        `process_self_attention` to drop the pads (identical results —
        the hot caption paths do this, PERF.md profile: the unpad slice
        costs ~3 ms/batch at flagship scale). No-op when nothing is
        padded.
      keep_tokens_padded: same idea for the OUTPUT tokens — skip the final
        (B, N, D) unpad slice and return `x_norm_patchtokens` with the
        padded token axis; pool with
        `region_pooling.trace_pool_padded` (the zero-extended pooling
        weights absorb the slice). No-op when nothing is padded.

    Returns dict:
      x_norm_clstoken (B, D), x_norm_regtokens (B, R, D),
      x_norm_patchtokens (B, N, D), x_prenorm (B, T, D),
      qkv_last (B, T, 3D) — last block's fused qkv activations,
      [last_block_input (B, T, D)].
    """
    b, hh, ww, _ = pixels.shape
    g = hh // cfg.patch_size
    if cfg.dtype != jnp.float32:
        # Cast weights once so the matmuls actually run at cfg.dtype on the
        # MXU (f32 params would promote every dot back to f32). int8
        # weights and their dequant scales (W8A8 path) stay as-is.
        params = jax.tree_util.tree_map_with_path(
            lambda kp, p: p.astype(cfg.dtype)
            if p.dtype == jnp.float32 and "w_scale" not in str(kp) else p,
            params,
        )
    x = pixels.astype(cfg.dtype)
    # Patch embed: conv14x14/s14 == reshape to patches + one matmul (MXU).
    x = x.reshape(b, g, cfg.patch_size, g, cfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, -1)
    x = _dense(x, params["patch_embed"])

    cls = jnp.broadcast_to(params["cls_token"].astype(cfg.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], cfg.stored_pos_grid, g)
    x = x + pos.astype(cfg.dtype)
    if cfg.num_registers:
        regs = jnp.broadcast_to(
            params["register_tokens"].astype(cfg.dtype),
            (b, cfg.num_registers, x.shape[-1]),
        )
        x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

    # fusedqkv kernel needs lane-aligned N: pad the token axis once for the
    # whole stack (padded rows are zero -> LN emits the bias row -> finite
    # garbage, masked out of attention as keys and sliced off at the end).
    num_real = x.shape[1]
    pad_n = (
        (-num_real) % 128
        if cfg.attn_impl in ("fusedqkv", "fusedqkv_proj") else 0
    )
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
    nrk = num_real if pad_n else None

    last_input = None
    qkv_last = None
    for i, blk in enumerate(params["blocks"]):
        is_last = i == len(params["blocks"]) - 1
        if is_last:
            last_input = x
        x, qkv = _block(x, blk, cfg, return_qkv=is_last, num_real_k=nrk)
        if is_last:
            qkv_last = qkv

    if pad_n:
        if not keep_tokens_padded:
            x = x[:, :num_real]
        if not keep_qkv_padded:
            qkv_last = qkv_last[:, :num_real]
        last_input = last_input[:, :num_real]

    x_norm = _ln(x, params["norm"], cfg.ln_eps)
    ng = cfg.num_global_tokens
    out = {
        "x_norm_clstoken": x_norm[:, 0],
        "x_norm_regtokens": x_norm[:, 1:ng],
        "x_norm_patchtokens": x_norm[:, ng:],
        "x_prenorm": x,
        "qkv_last": qkv_last,
    }
    if return_block_input:
        out["last_block_input"] = last_input
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def last_block_rerun(
    params: dict, tokens: jax.Array, key_mask: jax.Array, cfg: ViTConfig
) -> jax.Array:
    """Re-run the FINAL block over a key-masked token set (double-DINO mode).

    The reference re-runs `blocks[-1]` on the compacted token list
    [cls, registers, region patches] per box (src/bbox_utils.py:300-403,
    one Python forward per box). Attention is permutation-equivariant over
    keys, so restricting keys with a mask over the full token set is exactly
    equivalent — and batches every (image, box) pair into one program.
    Masked positions produce garbage outputs; the caller only reads unmasked
    positions.

    tokens: (B', T, D); key_mask: (B', T) bool.
    """
    blk = params["blocks"][-1]
    b, n, d = tokens.shape
    nh = cfg.num_heads
    hd = d // nh
    x_norm = _ln(tokens, blk["norm1"], cfg.ln_eps)
    qkv = _dense(x_norm, blk["qkv"])
    q, k, v = jnp.split(qkv.reshape(b, n, 3, nh, hd), 3, axis=2)
    q = q.squeeze(2).transpose(0, 2, 1, 3)
    k = k.squeeze(2).transpose(0, 2, 1, 3)
    v = v.squeeze(2).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (hd**-0.5), k).astype(jnp.float32)
    logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(tokens.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3).reshape(b, n, d)
    a = _dense(a, blk["proj"])
    if cfg.layerscale:
        a = a * blk["ls1"]
    x = tokens + a
    if "w12" in blk:
        # SwiGLU FFN (giant geometry) — same dispatch as _block
        hm = _dense(_ln(x, blk["norm2"], cfg.ln_eps), blk["w12"])
        x1, x2 = jnp.split(hm, 2, axis=-1)
        m = _dense(jax.nn.silu(x1) * x2, blk["w3"])
    else:
        m = _dense(
            jax.nn.gelu(_dense(_ln(x, blk["norm2"], cfg.ln_eps), blk["fc1"]),
                        approximate=cfg.gelu_approx),
            blk["fc2"],
        )
    if cfg.layerscale:
        m = m * blk["ls2"]
    return x + m


# --------------------------------------------------- attention extraction


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_global_tokens", "scale", "num_real_k"),
)
def process_self_attention(
    qkv: jax.Array,
    *,
    num_heads: int,
    num_global_tokens: int,
    scale: float = 0.125,
    num_real_k: Optional[int] = None,
) -> tuple[jax.Array, jax.Array]:
    """CLS→patch attention from last-block fused qkv activations.

    Bit-matches the reference quirk chain (src/dino_extraction.py:24-34):
    reshape with the *configured* head count (16 for ViT-B — not the true 12),
    q·kᵀ with hard-coded scale, take the CLS row, mean over heads *then*
    softmax. Returns (self_attn (B, P), self_attn_maps (B, H, P) pre-softmax).

    `num_real_k`: when `qkv` carries the fusedqkv path's lane-padded token
    axis (vit_forward(keep_qkv_padded=True)), the padded key columns are
    dropped from the tiny (B, H, N) logits right after the q·kᵀ product —
    bitwise-identical to slicing qkv first, without paying the (B, N, 3D)
    HBM copy of the unpad slice (~2 ms/batch at flagship scale, PERF.md
    profile).
    """
    b, n, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    q = qkv[:, :, 0].astype(jnp.float32) * scale  # (B, N, H, hd)
    k = qkv[:, :, 1].astype(jnp.float32)
    # Only the CLS query row is ever used — skip the full NxN product.
    q_cls = q[:, 0]  # (B, H, hd)
    attn_cls = jnp.einsum("bhd,bnhd->bhn", q_cls, k)  # (B, H, N)
    if num_real_k is not None and num_real_k < n:
        attn_cls = attn_cls[:, :, :num_real_k]
    maps = attn_cls[:, :, num_global_tokens:]  # (B, H, P)
    self_attn = jax.nn.softmax(jnp.mean(maps, axis=1), axis=-1)
    return self_attn, maps


def reorder_qkv_params(params: dict, attention_type: str) -> dict:
    """KKV-style attention rewiring: rebuild the last block's fused qkv from
    the requested component order, e.g. 'kkv' uses Keys as Queries
    (reference: src/model.py:569-582).
    """
    if attention_type == "qkv":
        return params
    if len(attention_type) != 3 or any(c not in "qkv" for c in attention_type):
        # must name exactly three components — a short/empty string would
        # build a mis-shaped fused qkv that only fails deep in attention
        raise ValueError(f"invalid attention_type: {attention_type!r}")
    idx = {"q": 0, "k": 1, "v": 2}
    blk = params["blocks"][-1]
    w = blk["qkv"]["w"]  # (D, 3D) in our layout
    bias = blk["qkv"]["b"]  # (3D,)
    d = w.shape[0]
    w3 = w.reshape(d, 3, d)  # columns grouped by (q, k, v)
    b3 = bias.reshape(3, d)
    new_w = jnp.concatenate([w3[:, idx[c], :] for c in attention_type], axis=-1)
    new_b = jnp.concatenate([b3[idx[c]] for c in attention_type], axis=-1)
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    new_params["blocks"] = list(params["blocks"])
    new_params["blocks"][-1] = dict(blk)
    new_params["blocks"][-1]["qkv"] = {"w": new_w, "b": new_b}
    return new_params
