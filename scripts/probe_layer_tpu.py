"""TPU A/B: one full encoder layer (real `_block` code path), chained.

Round-1 measured the flagship encoder at 585 ms / 12 layers = 48.8 ms/layer
(B=128, N=1374, d=768 bf16). The isolated-attention probe shows the
attention op itself is ~24 ms, and matmul roofline is ~12.6 ms/layer — so
this probe asks where the rest goes and whether two levers move it:

  1. attention impl: XLA softmax vs single-pass full-K Pallas (`flash1p`);
  2. token-count padding: N=1374 (10.73x128 — misaligned sublane tiles in
     every matmul) vs N=1408 (11x128, clean tiles). Timing-only: the padded
     run is unmasked here; if it wins, masking is implemented in vit.py.

Prints one JSON line per variant.
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

from patchioner_tpu.eval.chain_bench import chain_time
from patchioner_tpu.models import vit as V

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, D = 128, 768


def make_block(key, cfg):
    d, h = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    ks = iter(jax.random.split(key, 4))

    def dense(k, fi, fo):
        w = jax.random.normal(k, (fi, fo), jnp.float32) / (fi**0.5)
        return {"w": w.astype(cfg.dtype), "b": jnp.zeros((fo,), cfg.dtype)}

    return {
        "norm1": {"scale": jnp.ones((d,), cfg.dtype),
                  "bias": jnp.zeros((d,), cfg.dtype)},
        "qkv": dense(next(ks), d, 3 * d),
        "proj": dense(next(ks), d, d),
        "norm2": {"scale": jnp.ones((d,), cfg.dtype),
                  "bias": jnp.zeros((d,), cfg.dtype)},
        "fc1": dense(next(ks), d, h),
        "fc2": dense(next(ks), h, d),
        "ls1": jnp.full((d,), 1e-5, cfg.dtype),
        "ls2": jnp.full((d,), 1e-5, cfg.dtype),
    }


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()

    for n in (1374, 1408):
        x = jax.random.normal(
            jax.random.PRNGKey(1), (B, n, D), jnp.bfloat16
        )
        for impl in ("xla", "flash1p"):
            cfg = V.ViTConfig(attn_impl=impl, dtype=jnp.bfloat16)
            blk = make_block(jax.random.PRNGKey(0), cfg)

            def layer(x, blk, cfg=cfg):
                return V._block(x, blk, cfg)[0]

            try:
                r = chain_time(layer, x, blk, chain=6, reps=3)
                print(json.dumps({"variant": f"{impl}_n{n}", **r}))
            except Exception as e:
                print(json.dumps(
                    {"variant": f"{impl}_n{n}", "error": repr(e)[:400]}))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
