"""TPU probe: memory projection at CC3M scale (3M-row bank) on one chip.

PERF.md's multi-chip section claims bank tensor-parallelism is for banks
that outgrow one chip's HBM "(e.g. CC3M-scale banks)". The reference's
largest corpus is CC3M (~3M captions, im2txtprojection.py ProjectionType).
This measures the single-chip fused projection against a 3M x 768 bank —
bf16 (4.6 GB resident) and int8 (2.3 GB) — to pin where the single-chip
story actually ends on a 16 GB v5e. Bank rows are generated ON DEVICE
(never streamed over the tunnel); bf16 generation avoids a 9.2 GB f32
intermediate.
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

B, D = 128, 768
M = 3_000_000


def main():
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "M": M}))
    sys.stdout.flush()
    # generate directly in bf16: the f32 norm reduction fuses the upcast,
    # so peak HBM stays ~2x the bf16 bank, not 9.2 GB of f32 rows
    bank_rows = jax.jit(
        lambda k: jax.random.normal(k, (M, D), jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)

    pb = memproj.prepare_bank(bank_rows)

    def proj_bf16(q, rows, inv):
        return memproj.memory_project(
            q, memproj.PreparedBank(rows, inv, M), use_pallas=True
        )

    try:
        r = chain_time(proj_bf16, x, pb.rows, pb.inv_norm, chain=4, reps=3,
                       cast=jnp.float32)
        print(json.dumps({"variant": "memproj3M_bf16", **r}))
    except Exception as e:
        print(json.dumps({"variant": "memproj3M_bf16",
                          "error": repr(e)[:400]}))
    sys.stdout.flush()
    del pb

    # int8 leg: quantize_bank is chunked (CC3M-scale fix this probe
    # motivated — one-shot quantization's whole-bank f32 intermediates
    # OOM next to the resident bf16 bank on 16 GB).
    qb = memproj.quantize_bank(bank_rows)
    del bank_rows

    def proj_int8(q, rows, scale, inv):
        return memproj.memory_project(
            q, memproj.QuantizedBank(rows, scale, inv, M), use_pallas=True
        )

    try:
        r = chain_time(proj_int8, x, qb.rows, qb.scale, qb.inv_norm,
                       chain=4, reps=3, cast=jnp.float32)
        print(json.dumps({"variant": "memproj3M_int8", **r}))
    except Exception as e:
        print(json.dumps({"variant": "memproj3M_int8",
                          "error": repr(e)[:400]}))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
