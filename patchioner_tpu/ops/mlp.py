"""Fused LN -> fc1 -> GELU -> fc2 -> layerscale -> residual Pallas kernel.

The XLA encoder layer round-trips the (B, N, 4·D) MLP intermediate through
HBM (~1.1 GB per flagship layer in bf16, write + read ≈ 2.7 ms of pure
bandwidth) and the LN output besides. This kernel keeps the whole MLP half
of a ViT block resident in VMEM: both weight matrices (4.7 MB each at
D=768 bf16) stay pinned across the grid, the intermediate never leaves
VMEM, and each program computes `x + ls2 * mlp(ln(x))` for one row-block.

Numerics match `models/vit._block`: f32 LN statistics, bf16 matmul inputs
with f32 MXU accumulation, GELU (exact erf by default) evaluated in f32.
Reference semantics: timm/DINOv2 Mlp inside Block.forward (the reference
runs it via torch.hub, src/model.py:343).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_ln_mlp",
    "fused_ln_mlp_w8",
    "fused_ln_swiglu",
    "fused_ln_dense",
    "fused_dense_residual",
    "quantize_mlp_weights",
    "ln_mlp_reference",
    "ln_swiglu_reference",
]


def ln_mlp_reference(x, p, *, eps: float, gelu_approx: bool = False,
                     layerscale: bool = True):
    """Plain-XLA twin of the kernel (and the parity oracle)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * p["norm2"]["scale"] + p["norm2"]["bias"]).astype(x.dtype)
    h = y @ p["fc1"]["w"] + p["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=gelu_approx)
    o = h @ p["fc2"]["w"] + p["fc2"]["b"]
    if layerscale:
        o = o * p["ls2"]
    return x + o


def _erf(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (|abs error| < 1.5e-7) — only
    exp/mul/add, all of which Mosaic lowers."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_rows(x_ref, g_ref, bg_ref, eps):
    """In-kernel LN over the trailing dim: f32 statistics, f32 result."""
    xf = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * g_ref[0].astype(jnp.float32) + bg_ref[0].astype(jnp.float32)


def _gelu_f32(hf, approximate):
    if approximate:
        return jax.nn.gelu(hf, approximate=True)
    # Mosaic lowers neither erf nor erfc, so exact GELU uses the rational
    # erf above (error far below the bf16 resolution the result is cast to)
    return 0.5 * hf * (1.0 + _erf(hf * 0.7071067811865476))


def _kernel(
    x_ref,    # (1, BQ, D)
    g_ref,    # (1, D) ln scale
    bg_ref,   # (1, D) ln bias
    w1_ref,   # (D, H)
    b1_ref,   # (1, H)
    w2_ref,   # (H, D)
    b2_ref,   # (1, D)
    ls_ref,   # (1, D) layerscale (ones when disabled)
    o_ref,    # (1, BQ, D)
    *,
    eps: float,
    gelu_approx: bool,
):
    x = x_ref[0]
    y = _ln_rows(x_ref, g_ref, bg_ref, eps).astype(x.dtype)
    h = jax.lax.dot_general(
        y, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]
    h = _gelu_f32(h.astype(jnp.float32), gelu_approx)
    o = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]
    o_ref[0] = x + o * ls_ref[0]


@functools.partial(
    jax.jit,
    static_argnames=("eps", "gelu_approx", "block_q", "interpret"),
)
def fused_ln_mlp(
    x: jax.Array,        # (B, N, D)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,   # (D,)
    w1: jax.Array,        # (D, H)
    b1: jax.Array,        # (H,)
    w2: jax.Array,        # (H, D)
    b2: jax.Array,        # (D,)
    ls: jax.Array,        # (D,) layerscale, pass ones to disable
    *,
    eps: float,
    gelu_approx: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, n, d = x.shape
    h = w1.shape[1]
    if n % block_q:
        raise ValueError(f"fused_ln_mlp needs N%{block_q}==0, got {n}")
    grid = (b, n // block_q)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, gelu_approx=gelu_approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * h,
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * n * h,
        ),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2), row(ls))


# -------------------------------------------------- fused LN + dense


def _ln_dense_kernel(
    x_ref,   # (1, BQ, D)
    g_ref,   # (1, D) ln scale
    bg_ref,  # (1, D) ln bias
    w_ref,   # (D, O)
    b_ref,   # (1, O)
    o_ref,   # (1, BQ, O)
    *,
    eps: float,
):
    x = x_ref[0]
    y = _ln_rows(x_ref, g_ref, bg_ref, eps).astype(x.dtype)
    o_ref[0] = jax.lax.dot_general(
        y, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b_ref[0]


@functools.partial(
    jax.jit, static_argnames=("eps", "block_q", "interpret")
)
def fused_ln_dense(
    x: jax.Array,         # (B, N, D)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,   # (D,)
    w: jax.Array,         # (D, O)
    bias: jax.Array,      # (O,)
    *,
    eps: float,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """LN folded into a dense projection's operand read — the attention
    half's `qkv = LN(x) @ W_qkv + b` without materializing the normalized
    activations in HBM. Measured on v5e at the flagship shape (round-3
    probe): XLA materializes the LN output, costing ~0.73 ms/layer of
    (B, N, D) write+read on top of the 7.8 ms qkv matmul; this kernel
    reads x once and keeps W_qkv (3.5 MB at D=768 bf16) pinned across the
    grid. Numerics identical to `_ln` + `_dense` (f32 LN statistics, bf16
    matmul with f32 MXU accumulation)."""
    b, n, d = x.shape
    o = w.shape[1]
    if n % block_q:
        raise ValueError(f"fused_ln_dense needs N%{block_q}==0, got {n}")
    grid = (b, n // block_q)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_ln_dense_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, o), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, o), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * o,
            bytes_accessed=(b * n * (d + o) + d * o) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w, row(bias))


# --------------------------------------- fused dense + layerscale + residual


def _dense_res_kernel(
    x_ref,   # (1, BQ, D) matmul operand (merged attention output)
    r_ref,   # (1, BQ, O) residual stream
    w_ref,   # (D, O)
    b_ref,   # (1, O)
    ls_ref,  # (1, O) layerscale (ones when disabled)
    o_ref,   # (1, BQ, O)
):
    x = x_ref[0]
    o = jax.lax.dot_general(
        x, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b_ref[0]
    o_ref[0] = r_ref[0] + o * ls_ref[0]


@functools.partial(
    jax.jit, static_argnames=("block_q", "interpret")
)
def fused_dense_residual(
    x: jax.Array,         # (B, N, D)
    residual: jax.Array,  # (B, N, O)
    w: jax.Array,         # (D, O)
    bias: jax.Array,      # (O,)
    ls: jax.Array,        # (O,) layerscale, pass ones to disable
    *,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """`residual + ls * (x @ w + b)` in one pinned-weight kernel — the
    attention out-projection epilogue of a ViT block. The round-3 device
    profile (PERF.md) put the 12 out-proj matmuls inside XLA fusions
    running at XLA's ~62% matmul ceiling for this shape, while the
    pinned-weight Pallas dense (`fused_ln_dense`) reaches ~92% of the
    analytic ideal; this kernel applies the same treatment to the
    out-projection and additionally folds the layerscale multiply and
    residual add that XLA schedules as separate elementwise traffic.
    Numerics identical to `_dense` + layerscale + add (bf16 operands,
    f32 MXU accumulation). Reference semantics: timm/DINOv2
    `x + ls1 * attn.proj(attn_out)` inside Block.forward (the reference
    runs it via torch.hub, src/model.py:343)."""
    b, n, d = x.shape
    o = w.shape[1]
    if n % block_q:
        raise ValueError(f"fused_dense_residual needs N%{block_q}==0, got {n}")
    grid = (b, n // block_q)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        _dense_res_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, o), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, o), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, o), residual.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * o,
            bytes_accessed=(b * n * (d + 2 * o) + d * o) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, residual, w, row(bias), row(ls))


# ------------------------------------------------- int8 W8A8 variant


def quantize_symmetric_int8(x, axis):
    """Symmetric int8 quantization with a per-slice scale along `axis`:
    scale = max(amax/127, 1e-12), q = clip(round(x/scale)). The ONE shared
    helper for every load-time int8 path (MLP/ViT weights, memory-bank
    rows) so the clip range and epsilon can't drift between copies."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=axis, keepdims=True) / 127.0, 1e-12
    )
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def quantize_mlp_weights(w1, b1, w2, b2):
    """Per-output-channel symmetric int8 quantization of the two MLP weight
    matrices (done once at load, outside the hot path). Returns
    (w1q, w1s, b1, w2q, w2s, b2) with f32 scales/biases."""
    w1q, w1s = quantize_symmetric_int8(w1, axis=0)
    w2q, w2s = quantize_symmetric_int8(w2, axis=0)
    return w1q, w1s, b1.astype(jnp.float32), w2q, w2s, b2.astype(jnp.float32)


def _w8_kernel(
    x_ref,    # (1, BQ, D)
    g_ref,    # (1, D)
    bg_ref,   # (1, D)
    w1_ref,   # (D, H) int8
    s1_ref,   # (1, H) f32 per-channel scales
    b1_ref,   # (1, H) f32
    w2_ref,   # (H, D) int8
    s2_ref,   # (1, D) f32
    b2_ref,   # (1, D) f32
    ls_ref,   # (1, D)
    o_ref,    # (1, BQ, D)
    *,
    eps: float,
    gelu_approx: bool,
):
    x = x_ref[0]
    y = _ln_rows(x_ref, g_ref, bg_ref, eps)

    def qdot(act_f32, wq_ref, s_ref):
        # dynamic per-row activation quantization; int8 x int8 -> int32 on
        # the MXU at 2x the bf16 rate (v5e: 394 TOPS)
        sa = jnp.maximum(
            jnp.max(jnp.abs(act_f32), axis=-1, keepdims=True) / 127.0, 1e-12
        )
        aq = jnp.clip(jnp.round(act_f32 / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            aq, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sa * s_ref[0]

    h = _gelu_f32(qdot(y, w1_ref, s1_ref) + b1_ref[0], gelu_approx)
    o = qdot(h, w2_ref, s2_ref) + b2_ref[0]
    o_ref[0] = (x + (o * ls_ref[0].astype(jnp.float32)).astype(x.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("eps", "gelu_approx", "block_q", "interpret"),
)
def fused_ln_mlp_w8(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1q: jax.Array,   # (D, H) int8
    w1s: jax.Array,   # (1, H) f32
    b1: jax.Array,    # (H,) f32
    w2q: jax.Array,   # (H, D) int8
    w2s: jax.Array,   # (1, D) f32
    b2: jax.Array,    # (D,) f32
    ls: jax.Array,
    *,
    eps: float,
    gelu_approx: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """W8A8 variant of `fused_ln_mlp`: int8 weights resident in VMEM (half
    the footprint), dynamic per-row activation quantization IN-KERNEL — the
    quant/dequant VPU work that made the round-1 XLA W8A8 path a net loss
    is fused here. Numerics: int8 symmetric quantization error on both
    matmuls (opt-in, like `gelu_approx`)."""
    b, n, d = x.shape
    h = w1q.shape[1]
    if n % block_q:
        raise ValueError(f"fused_ln_mlp_w8 needs N%{block_q}==0, got {n}")
    grid = (b, n // block_q)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_w8_kernel, eps=eps, gelu_approx=gelu_approx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * h,
            bytes_accessed=2 * b * n * d * x.dtype.itemsize,
            transcendentals=b * n * h,
        ),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w1q, w1s.reshape(1, -1), row(b1),
      w2q, w2s.reshape(1, -1), row(b2), row(ls))


# ------------------------------------------------- fused LN + SwiGLU FFN


def ln_swiglu_reference(x, p, *, eps: float, layerscale: bool = True):
    """Plain-XLA twin of fused_ln_swiglu (and the parity oracle) — the
    DINOv2-giant FFN half of a block (models/vit._block ffn='swiglu'):
    `x + ls2 * (silu(x1) * x2) @ w3` over a fused (D, 2H) w12 projection."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (y * p["norm2"]["scale"] + p["norm2"]["bias"]).astype(x.dtype)
    h = y @ p["w12"]["w"] + p["w12"]["b"]
    x1, x2 = jnp.split(h, 2, axis=-1)
    g = jax.nn.silu(x1.astype(jnp.float32)) * x2.astype(jnp.float32)
    o = g.astype(x.dtype) @ p["w3"]["w"] + p["w3"]["b"]
    if layerscale:
        o = o * p["ls2"]
    return x + o


def _ln_swiglu_kernel(
    x_ref,    # (1, BQ, D)
    g_ref,    # (1, D) ln scale
    bg_ref,   # (1, D) ln bias
    w1_ref,   # (D, BH) gate-half column tile of w12
    b1_ref,   # (1, BH)
    w2_ref,   # (D, BH) linear-half column tile of w12
    b2_ref,   # (1, BH)
    w3_ref,   # (BH, D) row tile of w3
    b3_ref,   # (1, D)
    ls_ref,   # (1, D) layerscale (ones when disabled)
    o_ref,    # (1, BQ, D)
    y_scr,    # (BQ, D) x.dtype scratch: normed rows (computed once / q block)
    acc_scr,  # (BQ, D) f32 scratch: partial w3 products over the H tiles
    *,
    eps: float,
    n_h: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        y_scr[...] = _ln_rows(x_ref, g_ref, bg_ref, eps).astype(y_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    y = y_scr[...]
    h1 = jax.lax.dot_general(
        y, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h2 = jax.lax.dot_general(
        y, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    # silu in f32: Mosaic lowers exp; error far below bf16 resolution
    g = h1 * (1.0 / (1.0 + jnp.exp(-h1))) * h2
    acc_scr[...] += jax.lax.dot_general(
        g.astype(y.dtype), w3_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_h - 1)
    def _fin():
        x = x_ref[0]
        o = acc_scr[...] + b3_ref[0].astype(jnp.float32)
        o_ref[0] = x + (o * ls_ref[0].astype(jnp.float32)).astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_q", "block_h", "interpret"),
)
def fused_ln_swiglu(
    x: jax.Array,         # (B, N, D)
    ln_scale: jax.Array,  # (D,)
    ln_bias: jax.Array,   # (D,)
    w12: jax.Array,       # (D, 2H) fused gate+linear projection
    b12: jax.Array,       # (2H,)
    w3: jax.Array,        # (H, D)
    b3: jax.Array,        # (D,)
    ls: jax.Array,        # (D,) layerscale, pass ones to disable
    *,
    eps: float,
    block_q: int = 352,
    block_h: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """LN -> w12 -> silu(x1)*x2 -> w3 -> layerscale -> residual in one
    kernel — the SwiGLU counterpart of fused_ln_mlp for DINOv2-giant
    geometry (D=1536, H=4096). Giant's FFN weights (~38 MB bf16) cannot
    stay pinned in VMEM like ViT-B/L's, so this kernel STREAMS the hidden
    dimension: grid (B, N/bq, H/bh) with the H axis innermost, the gate and
    linear halves of w12 addressed as two column-tile views of the same
    array (no host-side split, no slicing copies), normed activations
    computed once per row block into scratch, and partial `g @ w3` products
    accumulated in an f32 scratch that is flushed with bias + layerscale +
    residual on the last H step. The (B, N, 2H) intermediate (~3 GB/layer
    for giant at the 518px flagship geometry) never touches HBM.

    Numerics: f32 LN statistics, bf16 matmul operands with f32 MXU
    accumulation, silu evaluated in f32 — same policy as fused_ln_mlp.
    Reference semantics: dinov2 SwiGLUFFNFused inside Block.forward (the
    reference runs giant via torch.hub delegation, src/model.py:343).

    Measured LOSER on v5e (probes swiglu/swiglu2, round 3b): FFN half
    18.1 ms best-fused (bq352/bh256) vs 17.2 XLA at B=32; full giant
    layer 97.6 fused vs 92.4 XLA at B=128. The per-(b, q-block) weight
    re-reads (~38 MB/program) only amortize past block_q ~1175 rows, and
    every block_q >= 704 overflows scoped VMEM, so the kernel cannot
    reach its break-even tile — XLA's own fusion of the SwiGLU chain is
    the production path; this stays a parity-tested opt-in."""
    b, n, d = x.shape
    h = w3.shape[0]
    if w12.shape[1] != 2 * h:
        raise ValueError(f"w12 must be (D, 2H)=(D, {2*h}), got {w12.shape}")
    if n % block_q:
        raise ValueError(f"fused_ln_swiglu needs N%{block_q}==0, got {n}")
    if h % block_h:
        raise ValueError(f"fused_ln_swiglu needs H%{block_h}==0, got {h}")
    n_h = h // block_h
    grid = (b, n // block_q, n_h)
    row = lambda v: v.reshape(1, -1)
    b12r = b12.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_ln_swiglu_kernel, eps=eps, n_h=n_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            # two tiled views of the SAME w12/b12 arrays: gate half at
            # column-block k, linear half at column-block n_h + k
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_h), lambda i, j, k: (0, n_h + k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j, k: (0, n_h + k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), x.dtype),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * d * h,
            bytes_accessed=(2 * b * n * d
                            + (b * n // block_q) * 3 * d * h)
            * x.dtype.itemsize,
            transcendentals=b * n * h,
        ),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w12, b12r, w12, b12r, w3, row(b3),
      row(ls))
