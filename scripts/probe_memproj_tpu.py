"""TPU probe: fused memory-bank projection on-chip cost, dispatch-amortized.

Round-1 reported 34 ms at B=128 against a 592k x 768 bf16 bank, but ~30 ms
of that was the tunnel's per-dispatch floor. Chain the projection (output
feeds the next query) for the true on-chip number; bandwidth ideal is
~1.1 ms (0.9 GB bank stream at 819 GB/s).
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import jax
import jax.numpy as jnp

from patchioner_tpu.eval.chain_bench import chain_time
from patchioner_tpu.ops import memory_projection as memproj

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, D, M = 128, 768, 591753


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    bank_rows = jax.jit(
        lambda k: jax.random.normal(k, (M, D), jnp.float32)
    )(jax.random.PRNGKey(0))
    pb = memproj.prepare_bank(bank_rows, dtype=jnp.bfloat16)
    qb = memproj.quantize_bank(bank_rows)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)

    # num_real must stay a STATIC int inside the kernel closure — rebuild the
    # NamedTuple inside the fn instead of passing it through jit (which would
    # trace the int into an i32 tracer the kernel can't capture).
    def proj_bf16(q, rows, inv):
        return memproj.memory_project(
            q, memproj.PreparedBank(rows, inv, M), use_pallas=True
        )

    def proj_int8(q, rows, scale, inv):
        return memproj.memory_project(
            q, memproj.QuantizedBank(rows, scale, inv, M), use_pallas=True
        )

    for name, fn, consts in (
        ("bf16", proj_bf16, (pb.rows, pb.inv_norm)),
        ("int8", proj_int8, (qb.rows, qb.scale, qb.inv_norm)),
    ):
        try:
            r = chain_time(fn, x, *consts, chain=8, reps=3, cast=jnp.float32)
            print(json.dumps({"variant": f"memproj_{name}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"memproj_{name}",
                              "error": repr(e)[:400]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
