"""TPU probe: heads-per-block sweep for the fused-qkv attention kernel.

The shipped kernel processes 2 heads per program (128-wide column blocks,
the Mosaic minimum). Wider blocks (4 or 6 heads = 256/384 lanes) mean
fewer programs with more arithmetic each — this probes whether DMA
amortization beats per-program overhead at the flagship shape.
Timing-only: an inline kernel variant, not the shipped one.
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchioner_tpu.eval.chain_bench import chain_time

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, HD, D = 128, 12, 64, 768
NREAL, NPAD = 1374, 1408
SCALE = HD**-0.5


def make_fused(block_heads: int, block_q: int):
    hp = H // block_heads
    w = block_heads * HD

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(block_heads):
            lo = i * HD
            q = q_ref[0, :, lo:lo + HD] * jnp.asarray(SCALE, q_ref.dtype)
            s = jax.lax.dot_general(
                q, k_ref[0, :, lo:lo + HD],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < NREAL, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, :, lo:lo + HD],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / l
            o_ref[0, :, lo:lo + HD] = o.astype(o_ref.dtype)

    @jax.jit
    def run(qkv):
        grid = (B, hp, NPAD // block_q)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, w), lambda i, hh, j: (i, j, hh),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NPAD, w), lambda i, hh, j: (i, 0, hp + hh),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NPAD, w),
                             lambda i, hh, j: (i, 0, 2 * hp + hh),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, w),
                                   lambda i, hh, j: (i, j, hh),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NPAD, D), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
        )(qkv, qkv, qkv)

    return run


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, NPAD, 3 * D),
                            jnp.bfloat16)
    for bh, bq in ((2, 1408), (4, 1408), (6, 1408), (4, 704), (6, 704)):
        try:
            fn = make_fused(bh, bq)

            # chain needs shape-preserving fn: tile the (B, N, D) output
            # back to qkv width (same concat cost for every variant)
            def link(x, fn=fn):
                o = fn(x)
                return jnp.concatenate([o, o, o], axis=-1)

            r = chain_time(link, qkv, chain=8, reps=3)
            print(json.dumps({"variant": f"heads{bh}_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"heads{bh}_bq{bq}",
                              "error": repr(e)[:300]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
