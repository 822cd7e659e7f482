"""TPU A/B: isolated encoder attention at the flagship geometry.

Compares plain-XLA attention vs the single-pass full-K Pallas kernel
(`flash_attention_1pass`) at (B=128, H=12, N=1374, hd=64) bf16 — the
exact hot shape from PERF.md round-1 — using the dispatch-amortized
chain timer so the ~30 ms tunnel floor divides out.

Prints one JSON line per variant as results arrive (bf16 Mosaic compiles
through the tunnel can take many minutes each; partial output survives a
timeout).
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
from patchioner_tpu.ops.attention import (
    attention_reference,
    flash_attention_1pass,
)

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, N, HD = 128, 12, 1374, 64
SCALE = HD**-0.5


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, H, N, HD), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, N, HD), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, N, HD), jnp.bfloat16)

    def report(name, fn):
        try:
            r = chain_time(fn, q, k, v, chain=8, reps=3)
            print(json.dumps({"variant": name, **r}))
        except Exception as e:  # tunnel flakiness: keep going
            print(json.dumps({"variant": name, "error": repr(e)[:400]}))
        sys.stdout.flush()

    report("xla", lambda q, k, v: attention_reference(q, k, v, SCALE))
    for bq in (256, 128, 512):
        report(
            f"flash1p_bq{bq}",
            lambda q, k, v, bq=bq: flash_attention_1pass(
                q, k, v, scale=SCALE, block_q=bq
            ),
        )


if __name__ == "__main__":
    main()
