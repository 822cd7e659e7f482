"""Support-memory projection — the DeCap "Im2Txt" hot op, TPU-native.

The reference (src/decap/im2txtprojection/im2txtprojection.py:353-383) projects
an image embedding into CLIP-text space by softmax-weighted recombination of a
bank of up to ~592k caption embeddings:

    sim    = normalize(x) @ normalize(bank).T          # (B, M)
    weight = softmax(sim / 0.01)                       # (B, M)
    out    = weight @ bank                             # (B, D)  (bank UN-normalized)
    if normalize: out /= ||out||

At M = 592k, D = 768 the bank is ~1.8 GB — reading it twice (sim matmul, then
recombination) is pure HBM-bandwidth waste, and materializing the (B, M)
similarity matrix wastes more. `memory_project_pallas` streams the bank
through VMEM once with an online softmax (flash-attention-style: running max,
running denominator, rescaled accumulator), fusing all three steps into one
bandwidth-bound pass.

`memory_project_xla` is the plain-jnp reference used for CPU tests, autodiff,
and the argmax/top-k side modes. `project_partial`/`combine_partials` expose
the online-softmax state so a bank sharded over a mesh axis combines with one
small collective (tensor parallelism over the memory bank — see
patchioner_tpu/parallel/sharding.py).

Use `prepare_bank` once at model build time: it pads the bank rows to the tile
multiple and precomputes reciprocal row norms, so the steady-state call makes
zero HBM copies of the bank.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "memory_project",
    "memory_project_xla",
    "memory_project_pallas",
    "memory_project_int8",
    "prepare_bank",
    "quantize_bank",
    "PreparedBank",
    "QuantizedBank",
    "project_partial",
    "combine_partials",
    "memory_argmax",
    "memory_topk_sims",
    "PartialProjection",
]

DEFAULT_TEMPERATURE = 0.01
DEFAULT_BLOCK_B = 128
DEFAULT_BLOCK_M = 2048


def _l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


# --------------------------------------------------------------------- XLA


def memory_project_xla(
    features: jax.Array,
    bank: jax.Array,
    *,
    temperature: float = DEFAULT_TEMPERATURE,
    normalize: bool = False,
) -> jax.Array:
    """Reference path: (B, D) x (M, D) -> (B, D)."""
    f = _l2_normalize(features.astype(jnp.float32))
    bank = bank.astype(jnp.float32)
    sim = f @ _l2_normalize(bank).T
    weight = jax.nn.softmax(sim / temperature, axis=-1)
    out = weight @ bank
    if normalize:
        out = _l2_normalize(out)
    return out


def memory_argmax(features: jax.Array, bank: jax.Array) -> jax.Array:
    """Index of the nearest bank entry per feature (return_argmax_text mode)."""
    f = _l2_normalize(features.astype(jnp.float32))
    sim = f @ _l2_normalize(bank.astype(jnp.float32)).T
    return jnp.argmax(sim, axis=-1)


def memory_topk_sims(features: jax.Array, bank: jax.Array, k: int) -> jax.Array:
    """Top-k cosine similarities per feature (return_n_best_sims mode)."""
    f = _l2_normalize(features.astype(jnp.float32))
    sim = f @ _l2_normalize(bank.astype(jnp.float32)).T
    return jax.lax.top_k(sim, k)[0]


# ---------------------------------------------------------- partial combine


class PartialProjection(NamedTuple):
    """Online-softmax state for a slice of the bank.

    max_sim: (B, 1) running max of sim/temperature.
    denom:   (B, 1) sum of exp(sim/T - max_sim).
    acc:     (B, D) sum of exp(sim/T - max_sim) * bank rows.
    """

    max_sim: jax.Array
    denom: jax.Array
    acc: jax.Array


def project_partial(
    features: jax.Array,
    bank_shard: jax.Array,
    *,
    temperature: float = DEFAULT_TEMPERATURE,
) -> PartialProjection:
    """Online-softmax partial over one bank shard (plain XLA)."""
    f = _l2_normalize(features.astype(jnp.float32))
    bank_shard = bank_shard.astype(jnp.float32)
    sim = (f @ _l2_normalize(bank_shard).T) / temperature
    m = jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim - m)
    return PartialProjection(m, jnp.sum(p, axis=-1, keepdims=True), p @ bank_shard)


def combine_partials(
    parts: PartialProjection, *, axis_name: Optional[str] = None, normalize: bool = False
) -> jax.Array:
    """Combine per-shard online-softmax states into the final projection.

    If `axis_name` is given, the state is combined across that mesh axis with
    collectives (psum/pmax over ICI); otherwise `parts` must be stacked along a
    leading axis.
    """
    if axis_name is not None:
        m = jax.lax.pmax(parts.max_sim, axis_name)
        scale = jnp.exp(parts.max_sim - m)
        denom = jax.lax.psum(parts.denom * scale, axis_name)
        acc = jax.lax.psum(parts.acc * scale, axis_name)
    else:
        m = jnp.max(parts.max_sim, axis=0)
        scale = jnp.exp(parts.max_sim - m)
        denom = jnp.sum(parts.denom * scale, axis=0)
        acc = jnp.sum(parts.acc * scale, axis=0)
    out = acc / denom
    if normalize:
        out = _l2_normalize(out)
    return out


# ------------------------------------------------------------------ Pallas


class PreparedBank(NamedTuple):
    """Bank padded to the streaming tile multiple, with reciprocal row norms.

    rows: (Mp, D) bank rows (f32 or bf16), zero-padded past `num_real`.
    inv_norm: (Mp, 1) f32 reciprocal row norms (zero for padded rows).
    num_real: true bank size M.
    """

    rows: jax.Array
    inv_norm: jax.Array
    num_real: int


def prepare_bank(
    bank: jax.Array, *, block_m: int = DEFAULT_BLOCK_M, dtype=None
) -> PreparedBank:
    """One-time bank preparation (do this outside the per-batch hot path).

    Non-lane-aligned feature dims (d % 128 != 0) are allowed — the dispatcher
    routes those through the XLA path instead of the Pallas kernel."""
    m, d = bank.shape
    # jit so the f32 upcast fuses into the norm reduction — eager astype
    # materializes a full f32 copy of the bank (9.2 GB at CC3M scale)
    inv = _inv_norms(bank)
    mp = pl.cdiv(m, block_m) * block_m
    if dtype is not None:
        bank = bank.astype(dtype)
    rows = jnp.pad(bank, ((0, mp - m), (0, 0)))
    inv = jnp.pad(inv, ((0, mp - m), (0, 0)))
    return PreparedBank(rows, inv, m)


@jax.jit
def _inv_norms(bank):
    return 1.0 / jnp.linalg.norm(
        bank.astype(jnp.float32), axis=-1, keepdims=True
    )


class QuantizedBank(NamedTuple):
    """Symmetric per-row int8 bank: rows = round(bank / scale), so the f32
    row reconstructs as rows * scale. inv_norm is the reciprocal norm of the
    ORIGINAL f32 rows (cosine sims unchanged up to quantization error).
    Halves the projection's HBM traffic vs bf16 (0.45 GB vs 1.18 GB at 592k)."""

    rows: jax.Array  # (Mp, D) int8
    scale: jax.Array  # (Mp, 1) f32
    inv_norm: jax.Array  # (Mp, 1) f32
    num_real: int


def quantize_bank(
    bank: jax.Array, *, block_m: int = 1024, chunk_rows: int = 262_144
) -> QuantizedBank:
    """One-time int8 quantization (outside the hot path).

    Processed in `chunk_rows` row chunks so peak device memory is the
    source bank + ~2 int8-bank-sized copies (the chunks plus their
    concatenation) + ONE chunk of f32 intermediates — quantizing the
    whole bank at once materializes f32 bank-sized temporaries, which
    OOMs at CC3M scale (3M x 768) next to a resident bf16 bank on a
    16 GB chip (measured, PERF.md round 3)."""
    m, d = bank.shape

    parts = [_quantize_chunk(bank[lo : lo + chunk_rows])
             for lo in range(0, m, chunk_rows)]
    rows = jnp.concatenate([p[0] for p in parts])
    scale = jnp.concatenate([p[1] for p in parts])
    inv = jnp.concatenate([p[2] for p in parts])
    del parts
    mp = pl.cdiv(m, block_m) * block_m
    return QuantizedBank(
        jnp.pad(rows, ((0, mp - m), (0, 0))),
        jnp.pad(scale, ((0, mp - m), (0, 0))),
        jnp.pad(inv, ((0, mp - m), (0, 0))),
        m,
    )


@jax.jit
def _quantize_chunk(b):
    from patchioner_tpu.ops.mlp import quantize_symmetric_int8

    bf = b.astype(jnp.float32)
    inv = 1.0 / jnp.linalg.norm(bf, axis=-1, keepdims=True)
    rows, scale = quantize_symmetric_int8(bf, axis=-1)
    return rows, scale, inv


def _mem_proj_step(
    f, bank, inv, out_ref, m_ref, d_ref, acc_ref, *,
    inv_temperature: float, normalize: bool, num_real: int, block_m: int,
):
    """Shared online-softmax body for BOTH projection kernels (f32 and
    int8): init, masked cosine sim, running max/denom/accumulator update,
    final normalize+write. The kernels differ ONLY in how `bank` is
    materialized (plain cast vs int8 dequant) — one body means a masking
    or rescale fix can never apply to one dtype path and not the other."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        d_ref[:] = jnp.zeros_like(d_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Cosine sim against normalized rows, scaled by 1/T.
    sim = (
        jax.lax.dot_general(
            f,
            bank * inv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_temperature
    )  # (BB, BM)

    # Mask padded bank rows (zero rows would otherwise land at sim == 0,
    # above real negative-cosine entries).
    col = j * block_m + jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim = jnp.where(col < num_real, sim, -1e30)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(sim, axis=-1, keepdims=True))
    rescale = jnp.exp(m_prev - m_new)
    p = jnp.exp(sim - m_new)  # (BB, BM)
    d_ref[:] = d_ref[:] * rescale + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * rescale + jnp.dot(
        p, bank, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        out = acc_ref[:] / d_ref[:]
        if normalize:
            out = out * jax.lax.rsqrt(jnp.sum(out * out, axis=-1, keepdims=True))
        out_ref[:] = out


def _mem_proj_kernel_q(
    f_ref,  # (BB, D)   normalized features tile, f32
    bank_ref,  # (BM, D)   int8 rows
    scale_ref,  # (BM, 1)   f32 per-row scales
    inv_ref,  # (BM, 1)   f32 reciprocal ORIGINAL row norms
    out_ref,
    m_ref,
    d_ref,
    acc_ref,
    *,
    inv_temperature: float,
    normalize: bool,
    num_real: int,
    block_m: int,
):
    _mem_proj_step(
        f_ref[:], bank_ref[:].astype(jnp.float32) * scale_ref[:], inv_ref[:],
        out_ref, m_ref, d_ref, acc_ref,
        inv_temperature=inv_temperature, normalize=normalize,
        num_real=num_real, block_m=block_m,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_real", "temperature", "normalize", "block_b",
                     "block_m", "interpret"),
)
def _mem_proj_call_q(
    features, rows, scale, inv_norm, *, num_real, temperature, normalize,
    block_b, block_m, interpret,
):
    b, d = features.shape
    mp = rows.shape[0]
    if mp % block_m:
        # same silent-truncation hazard as _mem_proj_call
        raise ValueError(
            f"quantized bank padded size {mp} is not a multiple of "
            f"block_m={block_m}; re-quantize the bank with this block_m"
        )
    f = _l2_normalize(features.astype(jnp.float32))
    bp = pl.cdiv(b, block_b) * block_b
    f = jnp.pad(f, ((0, bp - b), (0, 0)))
    grid = (bp // block_b, mp // block_m)
    out = pl.pallas_call(
        functools.partial(
            _mem_proj_kernel_q,
            inv_temperature=1.0 / temperature,
            normalize=normalize,
            num_real=num_real,
            block_m=block_m,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * mp * d,
            bytes_accessed=mp * d + bp * d * 8,
            transcendentals=bp * mp,
        ),
        interpret=interpret,
    )(f, rows, scale, inv_norm)
    return out[:b]


def memory_project_int8(
    features: jax.Array,
    qbank: QuantizedBank,
    *,
    temperature: float = DEFAULT_TEMPERATURE,
    normalize: bool = False,
    block_b: int = DEFAULT_BLOCK_B,
    block_m: int = 1024,  # the in-kernel dequantized f32 tile bounds VMEM
    interpret: bool = False,
) -> jax.Array:
    """Fused projection over an int8-quantized bank (dequant inside the
    kernel — HBM reads only the int8 rows + two f32 vectors).

    block_m defaults lower than the bf16 kernel's: the dequantized f32 tile
    plus its inv-scaled copy live in VMEM, so block_m=2048 at d=768 exceeds
    the 16 MB scoped-VMEM limit on v5e (observed: 16.73M > 16.00M). At
    block_m=1024 the kernel fits with headroom.

    Measured on v5e-1 (591753x768 bank, B=128, via the remote tunnel):
    int8 31.2 ms vs bf16 31.0 ms — both at the dispatch floor, so the win
    is memory, not latency: the resident bank shrinks 4x vs f32
    (1.82 GB -> 0.46 GB), freeing HBM for batch or multi-model serving.
    Quantization error: mean cosine vs f32 projection 0.9998."""
    block_b = min(block_b, max(8, features.shape[0]))
    # Scoped-VMEM guard (mirrors memory_project_pallas): wider banks at the
    # default block_m overflow the ~16 MB limit — the estimator below puts
    # the measured-failing d=768/block_m=2048 point at 17.9 MB (Mosaic
    # reported 16.73) and the measured-good d=768/block_m=1024 at 9.0 MB.
    # Halving keeps mp % block_m == 0 because quantize_bank pads to the
    # quantize-time block_m (a power-of-2 multiple of these).
    d = qbank.rows.shape[-1]
    while block_m > 256 and (
        2 * block_m * d                   # double-buffered int8 bank tile
        + 2 * block_m * d * 4             # in-kernel dequant f32 + scaled copy
        + block_b * block_m * 4           # sim tile (f32)
        + 3 * block_b * d * 4             # f/acc/out tiles
    ) > 14_000_000:
        block_m //= 2
    return _mem_proj_call_q(
        features, qbank.rows, qbank.scale, qbank.inv_norm,
        num_real=qbank.num_real, temperature=temperature, normalize=normalize,
        block_b=block_b, block_m=block_m, interpret=interpret,
    )


def _mem_proj_kernel(
    f_ref,  # (BB, D)   normalized features tile, f32
    bank_ref,  # (BM, D)   bank tile (un-normalized), f32/bf16
    inv_ref,  # (BM, 1)   1/||bank row||, f32 (0 for padded rows)
    out_ref,  # (BB, D)   output tile
    m_ref,  # (BB, 1)   running max scratch
    d_ref,  # (BB, 1)   running denom scratch
    acc_ref,  # (BB, D)   running accumulator scratch
    *,
    inv_temperature: float,
    normalize: bool,
    num_real: int,
    block_m: int,
):
    _mem_proj_step(
        f_ref[:], bank_ref[:].astype(jnp.float32), inv_ref[:],
        out_ref, m_ref, d_ref, acc_ref,
        inv_temperature=inv_temperature, normalize=normalize,
        num_real=num_real, block_m=block_m,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_real",
        "temperature",
        "normalize",
        "block_b",
        "block_m",
        "interpret",
    ),
)
def _mem_proj_call(
    features,
    bank_rows,
    bank_inv_norm,
    *,
    num_real: int,
    temperature: float,
    normalize: bool,
    block_b: int,
    block_m: int,
    interpret: bool,
):
    b, d = features.shape
    mp = bank_rows.shape[0]
    if mp % block_m:
        # the grid floor-divides: a non-dividing block_m would silently
        # skip the trailing bank rows and the softmax would renormalize
        # over a truncated bank
        raise ValueError(
            f"bank padded size {mp} is not a multiple of block_m="
            f"{block_m}; re-prepare the bank with this block_m"
        )
    f = _l2_normalize(features.astype(jnp.float32))
    bp = pl.cdiv(b, block_b) * block_b
    f = jnp.pad(f, ((0, bp - b), (0, 0)))

    grid = (bp // block_b, mp // block_m)
    out = pl.pallas_call(
        functools.partial(
            _mem_proj_kernel,
            inv_temperature=1.0 / temperature,
            normalize=normalize,
            num_real=num_real,
            block_m=block_m,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, 1), jnp.float32),
            pltpu.VMEM((block_b, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * mp * d,
            bytes_accessed=mp * d * bank_rows.dtype.itemsize + bp * d * 8,
            transcendentals=bp * mp,
        ),
        interpret=interpret,
    )(f, bank_rows, bank_inv_norm)
    return out[:b]


def memory_project_pallas(
    features: jax.Array,
    bank,
    *,
    temperature: float = DEFAULT_TEMPERATURE,
    normalize: bool = False,
    block_b: int = DEFAULT_BLOCK_B,
    block_m: int = DEFAULT_BLOCK_M,
    interpret: bool = False,
) -> jax.Array:
    """Fused streaming projection: one pass over the bank in HBM.

    Args:
      features: (B, D) query embeddings (any float dtype).
      bank: a `PreparedBank` (preferred — zero per-call bank copies) or a raw
        (M, D) array (padded on the fly; fine for tests).
    """
    if not isinstance(bank, PreparedBank):
        bank = prepare_bank(bank, block_m=block_m)
    block_b = min(block_b, max(8, features.shape[0]))
    # Scoped-VMEM guard: the double-buffered bank tile + sim/acc scratch
    # must stay under the ~16 MB limit — block_m=2048 overflowed it at
    # d=1024 on v5e while fitting at d=768. The closed-form footprint below
    # underestimates Mosaic's accounting by ~1.5x, so the threshold is
    # calibrated to those two measured points: d=768 keeps 2048
    # (8.5 MB est), d=1024 halves to 1024 (11.0 -> 6.3 MB est). Any
    # power-of-2 block_m <= 2048 still divides prepare_bank's padding.
    d = bank.rows.shape[-1]
    itemsize = bank.rows.dtype.itemsize
    while block_m > 256 and (
        2 * block_m * d * itemsize        # double-buffered bank tile
        + block_b * block_m * 4           # sim tile (f32)
        + 3 * block_b * d * 4             # f/acc/out tiles
    ) > 10_300_000:
        block_m //= 2
    return _mem_proj_call(
        features,
        bank.rows,
        bank.inv_norm,
        num_real=bank.num_real,
        temperature=temperature,
        normalize=normalize,
        block_b=block_b,
        block_m=block_m,
        interpret=interpret,
    )


def memory_project(
    features: jax.Array,
    bank,
    *,
    temperature: float = DEFAULT_TEMPERATURE,
    normalize: bool = False,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Dispatcher: Pallas on TPU, XLA elsewhere. Accepts a raw (M, D)
    array, a PreparedBank, or a QuantizedBank (int8 kernel on TPU,
    dequantized XLA path elsewhere)."""
    d = bank.rows.shape[-1] if isinstance(bank, (PreparedBank, QuantizedBank)) \
        else bank.shape[-1]
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas and d % 128 != 0:
        # an explicitly requested fused path must not silently benchmark
        # the two-pass XLA fallback under the kernel's name (the same rule
        # vit._warn_fusion_unusable enforces for the encoder fusions)
        import warnings

        warnings.warn(
            f"memory_project: use_pallas requested but d={d} is not a "
            f"multiple of 128 (TPU lane width) — falling back to the "
            f"two-pass XLA path",
            RuntimeWarning,
            stacklevel=2,
        )
        use_pallas = False
    if isinstance(bank, QuantizedBank):
        if use_pallas:
            return memory_project_int8(
                features, bank, temperature=temperature, normalize=normalize
            )
        rows = (bank.rows[: bank.num_real].astype(jnp.float32)
                * bank.scale[: bank.num_real])
        return memory_project_xla(
            features, rows, temperature=temperature, normalize=normalize
        )
    if use_pallas:
        return memory_project_pallas(
            features, bank, temperature=temperature, normalize=normalize
        )
    if isinstance(bank, PreparedBank):
        rows = bank.rows[: bank.num_real]
        return memory_project_xla(
            features, rows, temperature=temperature, normalize=normalize
        )
    return memory_project_xla(
        features, bank, temperature=temperature, normalize=normalize
    )
