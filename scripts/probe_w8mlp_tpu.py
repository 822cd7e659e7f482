"""TPU probe: W8A8 fused MLP half vs the bf16 fused MLP half (14.5 ms).

In-kernel dynamic activation quant + int8 weights: MXU int8 runs 2x bf16
on v5e, and the quant/dequant VPU work that sank the round-1 XLA W8A8
path is fused here.
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
from patchioner_tpu.ops import mlp

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, N, D, H = 128, 1408, 768, 3072


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    k = iter(jax.random.split(jax.random.PRNGKey(0), 6))
    x = jax.random.normal(next(k), (B, N, D), jnp.bfloat16)
    g = jnp.ones((D,), jnp.bfloat16)
    bg = jnp.zeros((D,), jnp.bfloat16)
    w1 = jax.random.normal(next(k), (D, H), jnp.float32) * 0.03
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jax.random.normal(next(k), (H, D), jnp.float32) * 0.015
    b2 = jnp.zeros((D,), jnp.float32)
    ls = jnp.full((D,), 1e-5, jnp.bfloat16)

    for bq in (704, 256, 128):
        try:
            r = chain_time(
                lambda x, *c: mlp.fused_ln_mlp(x, *c, eps=1e-6, block_q=bq),
                x, g, bg, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16), ls,
                chain=8, reps=3)
            print(json.dumps({"variant": f"bf16_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"bf16_bq{bq}", "error": repr(e)[:200]}))
        sys.stdout.flush()

    w1q, w1s, b1f, w2q, w2s, b2f = mlp.quantize_mlp_weights(w1, b1, w2, b2)
    for bq in (704, 256, 128):
        try:
            r = chain_time(
                lambda x, *c: mlp.fused_ln_mlp_w8(x, *c, eps=1e-6, block_q=bq),
                x, g, bg, w1q, w1s, b1f, w2q, w2s, b2f, ls,
                chain=8, reps=3)
            print(json.dumps({"variant": f"w8a8_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"w8a8_bq{bq}", "error": repr(e)[:300]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
