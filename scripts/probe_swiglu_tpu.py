"""TPU probe round 3: fused LN+SwiGLU kernel vs XLA at giant FFN geometry.

DINOv2-giant's FFN (d=1536, h=4096, SwiGLU) materializes a (B, N, 2H)
intermediate (~3 GB/layer bf16 at the 518px flagship shape) on the
unfused path. `ops/mlp.fused_ln_swiglu` streams the hidden dimension with
the weights tiled (they're ~38 MB — too big to pin like ViT-B/L's GELU
MLP). This probe chain-times the FFN half both ways and sweeps the
kernel's (block_q, block_h) grid, then times a FULL giant layer
(fusedqkv attention + each FFN variant).

Usage: python scripts/probe_swiglu_tpu.py [B] (default 32 — a giant FFN
half at B=128 is ~7 TFLOP/link; 32 keeps chain links ~9 ms).
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
from patchioner_tpu.models import vit as V
from patchioner_tpu.ops.mlp import fused_ln_swiglu
from patchioner_tpu.utils.compile_cache import enable_compile_cache

D, H = 1536, 4096
NPAD = 1408


def make_swiglu_block(key, cfg):
    d, h = D, H
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
        "w12": dense(next(ks), d, 2 * h),
        "w3": dense(next(ks), h, d),
        "ls1": jnp.full((d,), 1e-5, cfg.dtype),
        "ls2": jnp.full((d,), 1e-5, cfg.dtype),
    }


def main():
    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "B": b}))
    sys.stdout.flush()
    cfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                      dtype=jnp.bfloat16)
    blk = make_swiglu_block(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, NPAD, D), jnp.bfloat16)

    def ffn_xla(x, blk):
        h = V._dense(V._ln(x, blk["norm2"], cfg.ln_eps), blk["w12"])
        x1, x2 = jnp.split(h, 2, axis=-1)
        m = V._dense(jax.nn.silu(x1) * x2, blk["w3"])
        return x + m * blk["ls2"]

    r = chain_time(ffn_xla, x, blk, chain=4, reps=3)
    print(json.dumps({"variant": "ffn_xla", **r}))
    sys.stdout.flush()

    for bq in (352, 256, 176, 128):
        for bh in (1024, 512, 256):
            def ffn_fused(x, blk, bq=bq, bh=bh):
                return fused_ln_swiglu(
                    x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                    blk["w12"]["w"], blk["w12"]["b"],
                    blk["w3"]["w"], blk["w3"]["b"], blk["ls2"],
                    eps=cfg.ln_eps, block_q=bq, block_h=bh,
                )

            try:
                r = chain_time(ffn_fused, x, blk, chain=4, reps=3)
                print(json.dumps(
                    {"variant": f"ffn_fused_bq{bq}_bh{bh}", **r}))
            except Exception as e:
                print(json.dumps(
                    {"variant": f"ffn_fused_bq{bq}_bh{bh}",
                     "error": str(e)[:200]}))
            sys.stdout.flush()

    # full giant layer: fusedqkv attention + each FFN variant
    for mlp_fused in (False, True):
        lcfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                           dtype=jnp.bfloat16, attn_impl="fusedqkv",
                           qkv_fused=False, mlp_fused=mlp_fused)

        def layer(x, blk, lcfg=lcfg):
            return V._block(x, blk, lcfg, num_real_k=1374)[0]

        try:
            r = chain_time(layer, x, blk, chain=4, reps=3)
            print(json.dumps(
                {"variant": f"layer_mlp_fused={mlp_fused}", **r}))
        except Exception as e:
            print(json.dumps(
                {"variant": f"layer_mlp_fused={mlp_fused}",
                 "error": str(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
