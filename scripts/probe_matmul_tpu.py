"""TPU probe: clean MFU of the encoder's matmul shapes + profiler check.

Two questions the round-3 layer numbers leave open:

1. Earlier qkv timings (probe_lnqkv) chained with a fold-back slice+add
   (output must match input shape for the chain), inflating absolutes.
   Here the chain link is a matmul PAIR — (BN, 2304) @ (2304, 768) then
   (BN, 768) @ (768, 2304), the second being exactly the qkv projection
   shape — so the link's compute is pure matmul and per-matmul MFU falls
   straight out. If XLA already runs these near the measured layer
   budget, no kernel work remains on the matmul stack; if it's much
   faster, the layer's qkv/proj accounting has headroom.

2. Does `jax.profiler.trace` work through the axon tunnel? If it does,
   a timeline beats all indirect accounting.
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.eval.chain_bench import chain_time

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, N, D = 128, 1408, 768
PEAK = 197e12  # v5e bf16


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    y = jax.random.normal(k1, (B * N, 3 * D), jnp.bfloat16)
    w_down = jax.random.normal(k2, (3 * D, D), jnp.bfloat16) * 0.02
    w_up = jax.random.normal(k3, (D, 3 * D), jnp.bfloat16) * 0.02

    def pair(y, w_down, w_up):
        return (y @ w_down) @ w_up

    r = chain_time(pair, y, w_down, w_up, chain=8, reps=3)
    flops_pair = 2 * (B * N) * 3 * D * D * 2  # two equal-FLOP matmuls
    mfu = flops_pair / (r["per_op_ms"] / 1e3) / PEAK
    print(json.dumps({
        "variant": "matmul_pair(BNx2304 @ 2304x768 @ 768x2304)",
        "per_pair_ms": r["per_op_ms"],
        "per_matmul_ms": round(r["per_op_ms"] / 2, 2),
        "pair_mfu": round(mfu, 3),
    }))
    sys.stdout.flush()

    # the MLP shapes: (BN, 768) @ (768, 3072) @ (3072, 768)
    x = jax.random.normal(k1, (B * N, D), jnp.bfloat16)
    w1 = jax.random.normal(k2, (D, 4 * D), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(k3, (4 * D, D), jnp.bfloat16) * 0.02

    def mlp_pair(x, w1, w2):
        return (x @ w1) @ w2

    r2 = chain_time(mlp_pair, x, w1, w2, chain=8, reps=3)
    flops2 = 2 * (B * N) * D * 4 * D * 2
    print(json.dumps({
        "variant": "mlp_pair(BNx768 @ 768x3072 @ 3072x768)",
        "per_pair_ms": r2["per_op_ms"],
        "pair_mfu": round(flops2 / (r2["per_op_ms"] / 1e3) / PEAK, 3),
    }))
    sys.stdout.flush()

    # profiler availability through the tunnel
    try:
        out_dir = "/tmp/patchioner_profile"
        with jax.profiler.trace(out_dir):
            np.asarray((y @ w_down).ravel()[0])
        import os
        n_files = sum(len(fs) for _, _, fs in os.walk(out_dir))
        print(json.dumps({"profiler": "ok", "files": n_files,
                          "dir": out_dir}))
    except Exception as e:
        print(json.dumps({"profiler": f"failed: {type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main()
