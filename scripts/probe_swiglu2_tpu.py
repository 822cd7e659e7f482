"""TPU probe round 3b: fused LN+SwiGLU follow-up at large block_q + B=128.

probe_swiglu_tpu found XLA WINS the giant FFN half at B=32 (17.2 ms vs
18.1 best fused at bq352) and the full layer (26.4 vs 27.3). Bandwidth
accounting says the fused kernel's weight re-reads (37.6 MB per (b, q)
program) only amortize past block_q ~1175 rows, so this probe tries the
largest VMEM-plausible block_q (704) and re-checks the full-layer A/B at
the flagship batch 128 (the B the giant bench runs).

Usage: python scripts/probe_swiglu2_tpu.py
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
from scripts.probe_swiglu_tpu import make_swiglu_block, D, H, NPAD


def main():
    enable_compile_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                      dtype=jnp.bfloat16)
    blk = make_swiglu_block(jax.random.PRNGKey(0), cfg)

    def ffn_xla(x, blk):
        h = V._dense(V._ln(x, blk["norm2"], cfg.ln_eps), blk["w12"])
        x1, x2 = jnp.split(h, 2, axis=-1)
        m = V._dense(jax.nn.silu(x1) * x2, blk["w3"])
        return x + m * blk["ls2"]

    # big-bq sweep at B=32 (fast links)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (32, NPAD, D),
                            jnp.bfloat16)
    for bq, bh in ((704, 256), (704, 128), (1408, 128)):
        def ffn_fused(x, blk, bq=bq, bh=bh):
            return fused_ln_swiglu(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                blk["w12"]["w"], blk["w12"]["b"],
                blk["w3"]["w"], blk["w3"]["b"], blk["ls2"],
                eps=cfg.ln_eps, block_q=bq, block_h=bh,
            )

        try:
            r = chain_time(ffn_fused, x32, blk, chain=4, reps=3)
            print(json.dumps({"variant": f"B32_ffn_fused_bq{bq}_bh{bh}",
                              **r}))
        except Exception as e:
            print(json.dumps({"variant": f"B32_ffn_fused_bq{bq}_bh{bh}",
                              "error": str(e)[:200]}))
        sys.stdout.flush()

    # full-layer A/B at the flagship batch
    x128 = jax.random.normal(jax.random.PRNGKey(2), (128, NPAD, D),
                             jnp.bfloat16)
    for mlp_fused in (False, True):
        lcfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                           dtype=jnp.bfloat16, attn_impl="fusedqkv",
                           qkv_fused=False, mlp_fused=mlp_fused)

        def layer(x, blk, lcfg=lcfg):
            return V._block(x, blk, lcfg, num_real_k=1374)[0]

        try:
            r = chain_time(layer, x128, blk, chain=2, reps=3)
            print(json.dumps(
                {"variant": f"B128_layer_mlp_fused={mlp_fused}", **r}))
        except Exception as e:
            print(json.dumps(
                {"variant": f"B128_layer_mlp_fused={mlp_fused}",
                 "error": str(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
