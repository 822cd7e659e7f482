"""Pallas flash attention for the ViT encoder.

The encoder's 1374-token bidirectional attention materializes a
(B, 12, 1374, 1374) logits tensor per layer under plain XLA — ~2.9 GB of HBM
write+read per layer at batch 32. This kernel streams K/V blocks through VMEM
with an online softmax (running max / denominator / rescaled accumulator), so
the only HBM traffic is Q/K/V/O — the flash-attention structure, same pattern
as ops/memory_projection.

No causal mask (ViT is bidirectional); padded key positions (sequence padded
to the block multiple) are masked by index. Numerics: logits and the softmax
state accumulate in f32 regardless of input dtype.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "flash_attention",
    "flash_attention_1pass",
    "fused_qkv_attention",
    "fused_qkv_attention_proj",
    "attention_reference",
]

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def attention_reference(q, k, v, scale: float):
    """Plain-XLA bidirectional attention (B, H, N, hd) — the fallback path
    and the parity oracle for the kernel."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _flash_kernel(
    q_ref,  # (1, BQ, hd)
    k_ref,  # (1, BK, hd)
    v_ref,  # (1, BK, hd)
    o_ref,  # (1, BQ, hd)
    m_ref,  # (BQ, 1) scratch
    l_ref,  # (BQ, 1) scratch
    acc_ref,  # (BQ, hd) scratch
    *,
    scale: float,
    num_real_k: int,
    block_k: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Keep q/k/v in their input dtype (bf16 on the fast path) — the MXU
    # multiplies in bf16 with f32 accumulation via preferred_element_type.
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK) f32
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < num_real_k, s, -1e30)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    rescale = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * rescale + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * rescale + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _softmax_attend(q, k, v, *, scale: float, num_real_k: int):
    """One program's exact-softmax attention with every key resident:
    QK^T (f32 accum) -> key mask -> max-subtracted exp -> PV -> normalize
    the small (BQ, hd) OUTPUT rather than the (BQ, NK) matrix (~NK/hd fewer
    VPU divides). Shared by the 1-pass and fused-qkv kernels."""
    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, NK) f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < num_real_k, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l


def _flash1p_kernel(
    q_ref,  # (1, BQ, hd)
    k_ref,  # (1, NK, hd) — the FULL (padded) key block
    v_ref,  # (1, NK, hd)
    o_ref,  # (1, BQ, hd)
    *,
    scale: float,
    num_real_k: int,
):
    """Single-pass exact softmax: the whole key range sits in one VMEM block,
    so there is no online-rescaling state, no scratch, no @pl.when phases —
    one QK^T matmul, one masked softmax, one PV matmul per program. Sized for
    the flagship ViT geometry (N=1374 -> 1408 padded keys x hd=64: K/V tiles
    are 176 KB each in bf16, logits (BQ, 1408) f32 comfortably fit VMEM)."""
    o = _softmax_attend(q_ref[0], k_ref[0], v_ref[0], scale=scale,
                        num_real_k=num_real_k)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret")
)
def flash_attention_1pass(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, N, hd) x3 -> (B, H, N, hd); exact softmax with all keys
    resident in VMEM (geometry-tuned variant of `flash_attention` for
    moderate N — the flagship's N=1374; see PERF.md). block_q=512 measured
    best on v5e at the flagship shape (23.9 ms vs 26.9/29.0 at 256/128,
    dispatch-amortized chain timing)."""
    b, h, n, hd = q.shape
    bh = b * h
    lane = 128
    nk = pl.cdiv(n, lane) * lane
    nq = pl.cdiv(n, block_q) * block_q
    qf = q.reshape(bh, n, hd)
    kf = k.reshape(bh, n, hd)
    vf = v.reshape(bh, n, hd)
    if nq != n:
        qf = jnp.pad(qf, ((0, 0), (0, nq - n), (0, 0)))
    if nk != n:
        kf = jnp.pad(kf, ((0, 0), (0, nk - n), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk - n), (0, 0)))
    grid = (bh, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash1p_kernel, scale=scale, num_real_k=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * hd,
            bytes_accessed=4 * bh * n * hd * q.dtype.itemsize,
            transcendentals=bh * nq * nk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, hd)


def _fusedqkv_kernel(
    q_ref,  # (1, BQ, 2·hd) — 128-wide column block = one head PAIR
    k_ref,  # (1, NK, 2·hd) — same pair's keys
    v_ref,  # (1, NK, 2·hd)
    o_ref,  # (1, BQ, 2·hd) — head pair of the (B, N, D) output
    *,
    scale: float,
    num_real_k: int,
    hd: int,
):
    # Mosaic requires the trailing block dim to be a multiple of 128, so a
    # single hd=64 head cannot be a column block; each program handles two
    # adjacent heads, sliced on the lane axis.
    for lo in (0, hd):
        o = _softmax_attend(
            q_ref[0, :, lo:lo + hd], k_ref[0, :, lo:lo + hd],
            v_ref[0, :, lo:lo + hd], scale=scale, num_real_k=num_real_k,
        )
        o_ref[0, :, lo:lo + hd] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "num_real_k", "block_q",
                     "interpret"),
)
def fused_qkv_attention(
    qkv: jax.Array,
    *,
    num_heads: int,
    scale: float,
    num_real_k: int | None = None,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Attention directly on the fused qkv activation — no transposes.

    `qkv` is the (B, N, 3·D) output of the fused qkv projection, laid out
    (3, H, hd) along the last axis (the torch/DINOv2 fused-linear layout,
    reference src/dino_extraction.py:24-27). The standard path splits it
    into three (B, H, N, hd) tensors — four HBM round-trips of transposed
    copies that XLA cannot always fuse away. This kernel instead addresses
    q/k/v as head-PAIR-indexed *column blocks* of the original array (the
    same array is passed three times with different index maps; pairs
    because Mosaic needs 128-wide trailing blocks and hd=64) and writes the
    output already in (B, N, D) merged-head layout, ready for the out-proj
    matmul. Single-pass exact softmax with the whole (padded) key range
    resident in VMEM, like `flash_attention_1pass`.

    Requires N a multiple of 128 (run the encoder padded; mask real keys
    via `num_real_k`), an even head count, and hd=64.
    """
    b, n, three_d = qkv.shape
    hd = three_d // (3 * num_heads)
    if n % 128:
        raise ValueError(f"fused_qkv_attention needs N%128==0, got {n}")
    if num_heads % 2 or hd != 64:
        raise ValueError("fused_qkv_attention needs even heads and hd=64")
    if num_real_k is None:
        num_real_k = n
    nq_blocks = pl.cdiv(n, block_q)
    hp = num_heads // 2  # head pairs; column blocks are 128 = 2·hd wide
    grid = (b, hp, nq_blocks)
    out = pl.pallas_call(
        functools.partial(
            _fusedqkv_kernel, scale=scale, num_real_k=num_real_k, hd=hd
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * hd), lambda i, hh, j: (i, j, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2 * hd), lambda i, hh, j: (i, 0, hp + hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2 * hd), lambda i, hh, j: (i, 0, 2 * hp + hh),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 2 * hd), lambda i, hh, j: (i, j, hh),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, num_heads * hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * hd,
            bytes_accessed=4 * b * n * num_heads * hd * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _fusedqkv_proj_kernel(
    q_ref,    # (1, BQ, 2·hd) — q columns of one head pair
    k_ref,    # (1, NK, 2·hd)
    v_ref,    # (1, NK, 2·hd)
    w_ref,    # (2·hd, D) — this pair's out-projection rows
    b_ref,    # (1, D) out-proj bias
    ls_ref,   # (1, D) layerscale (ones when disabled)
    x_ref,    # (1, BQ, D) residual-stream input block
    o_ref,    # (1, BQ, D) residual-stream output block
    acc_ref,  # (BQ, D) f32 scratch — out-proj partial sum across pairs
    *,
    scale: float,
    num_real_k: int,
    hd: int,
):
    hh = pl.program_id(2)  # head-pair axis, innermost reduction

    @pl.when(hh == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Both heads' (BQ, hd) outputs concatenate to the pair's (BQ, 2·hd)
    # merged slice, so the out-proj contribution is ONE dot with a 128-deep
    # contraction — a full MXU tile (per-head hd=64 dots would run the MXU
    # at half depth).
    pair = jnp.concatenate(
        [
            _softmax_attend(
                q_ref[0, :, lo:lo + hd], k_ref[0, :, lo:lo + hd],
                v_ref[0, :, lo:lo + hd], scale=scale,
                num_real_k=num_real_k,
            )
            for lo in (0, hd)
        ],
        axis=-1,
    )
    acc_ref[:] += jax.lax.dot_general(
        pair.astype(w_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(hh == pl.num_programs(2) - 1)
    def _finish():
        a = acc_ref[:] + b_ref[0].astype(jnp.float32)
        a = a * ls_ref[0].astype(jnp.float32)
        o_ref[0] = (x_ref[0].astype(jnp.float32) + a).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "num_real_k", "block_q",
                     "interpret"),
)
def fused_qkv_attention_proj(
    qkv: jax.Array,
    x_res: jax.Array,
    w_proj: jax.Array,
    b_proj: jax.Array,
    layerscale: jax.Array,
    *,
    num_heads: int,
    scale: float,
    num_real_k: int | None = None,
    block_q: int = 704,
    interpret: bool = False,
) -> jax.Array:
    """`fused_qkv_attention` with the out-projection, bias, layerscale and
    residual add folded into the kernel epilogue (VERDICT r2 #6).

    The merged (B, N, D) attention output never touches HBM: each head-pair
    program accumulates its `pair @ W_proj[pair_rows]` partial product into
    an f32 VMEM scratch over the innermost (reduction) grid axis, and the
    last pair adds bias/layerscale/residual and writes the updated residual
    stream. Saves the merged tensor's HBM write+read (~0.55 GB/layer at the
    flagship shape) at the cost of K/V re-reads when block_q < N (VMEM
    pressure from the (BQ, D) f32 accumulator forces block_q below the
    whole-N optimum of the unfused kernel — measured tradeoff in PERF.md).

    qkv: (B, N, 3·D) fused activations; x_res: (B, N, D) residual stream;
    w_proj: (D, D) stored (in, out); layerscale: (D,) (pass ones when the
    block has no layerscale). Same N%128==0 / even-heads / hd=64
    requirements as `fused_qkv_attention`.
    """
    b, n, three_d = qkv.shape
    hd = three_d // (3 * num_heads)
    d = num_heads * hd
    if n % 128:
        raise ValueError(f"fused_qkv_attention_proj needs N%128==0, got {n}")
    if num_heads % 2 or hd != 64:
        raise ValueError(
            "fused_qkv_attention_proj needs even heads and hd=64"
        )
    if num_real_k is None:
        num_real_k = n
    nq_blocks = pl.cdiv(n, block_q)
    hp = num_heads // 2
    grid = (b, nq_blocks, hp)
    out = pl.pallas_call(
        functools.partial(
            _fusedqkv_proj_kernel, scale=scale, num_real_k=num_real_k, hd=hd
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * hd), lambda i, j, hh: (i, j, hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2 * hd), lambda i, j, hh: (i, 0, hp + hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2 * hd), lambda i, j, hh: (i, 0, 2 * hp + hh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * hd, d), lambda i, j, hh: (hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j, hh: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j, hh: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * hd + 2 * b * n * d * d,
            bytes_accessed=(3 * b * n * d + 2 * b * n * d)
            * qkv.dtype.itemsize,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(
        qkv, qkv, qkv,
        w_proj.astype(qkv.dtype),
        b_proj.reshape(1, -1).astype(qkv.dtype),
        jnp.asarray(layerscale).reshape(1, -1).astype(qkv.dtype),
        x_res,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, N, hd) x3 -> (B, H, N, hd), bidirectional, f32 accumulation."""
    b, h, n, hd = q.shape
    bh = b * h
    nq = pl.cdiv(n, block_q) * block_q
    nk = pl.cdiv(n, block_k) * block_k
    qf = q.reshape(bh, n, hd)
    kf = k.reshape(bh, n, hd)
    vf = v.reshape(bh, n, hd)
    if nq != n:
        qf = jnp.pad(qf, ((0, 0), (0, nq - n), (0, 0)))
    if nk != n:
        kf = jnp.pad(kf, ((0, 0), (0, nk - n), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk - n), (0, 0)))

    grid = (bh, nq // block_q, nk // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, num_real_k=n, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j, c: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda i, j, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda i, j, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda i, j, c: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * hd,
            bytes_accessed=(3 * bh * n * hd + bh * n * hd) * q.dtype.itemsize,
            transcendentals=bh * nq * nk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :n].reshape(b, h, n, hd)
