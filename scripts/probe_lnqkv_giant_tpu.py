"""TPU probe round 3b: fused LN+qkv (fused_ln_dense) at giant geometry.

ViT-B/L pin W_qkv in VMEM (4.2/6.3 MB bf16) and win ~0.7 ms/layer
(PERF.md round 3). Giant's W_qkv is 1536x4608 bf16 = 13.5 MB — likely
over the ~16 MB scoped-VMEM budget once the x/out blocks join it. This
probe answers (a) does it compile at any block_q, (b) does it beat XLA's
LN+qkv, (c) the full-layer effect at the flagship batch.

Usage: python scripts/probe_lnqkv_giant_tpu.py
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
from patchioner_tpu.ops.mlp import fused_ln_dense
from patchioner_tpu.utils.compile_cache import enable_compile_cache
from scripts.probe_swiglu_tpu import make_swiglu_block, D, NPAD


def main():
    enable_compile_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                      dtype=jnp.bfloat16)
    blk = make_swiglu_block(jax.random.PRNGKey(0), cfg)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (32, NPAD, D),
                            jnp.bfloat16)

    def qkv_xla(x, blk):
        y = V._dense(V._ln(x, blk["norm1"], cfg.ln_eps), blk["qkv"])
        # fold (B, N, 3D) back to input shape so the chain composes
        return y[..., :D] + y[..., D:2 * D]

    r = chain_time(qkv_xla, x32, blk, chain=4, reps=3)
    print(json.dumps({"variant": "B32_qkv_xla", **r}))
    sys.stdout.flush()

    for bq in (704, 352, 176, 128):
        def qkv_fused(x, blk, bq=bq):
            y = fused_ln_dense(
                x, blk["norm1"]["scale"], blk["norm1"]["bias"],
                blk["qkv"]["w"], blk["qkv"]["b"], eps=cfg.ln_eps,
                block_q=bq)
            return y[..., :D] + y[..., D:2 * D]

        try:
            r = chain_time(qkv_fused, x32, blk, chain=4, reps=3)
            print(json.dumps({"variant": f"B32_qkv_fused_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"B32_qkv_fused_bq{bq}",
                              "error": str(e)[:200]}))
        sys.stdout.flush()

    # full-layer A/B at the flagship batch (mlp_fused=False — the giant
    # FFN winner is XLA, probe_swiglu2)
    x128 = jax.random.normal(jax.random.PRNGKey(2), (128, NPAD, D),
                             jnp.bfloat16)
    for qkv_fused_flag in (False, True):
        lcfg = V.ViTConfig(embed_dim=D, num_heads=24, ffn="swiglu",
                           dtype=jnp.bfloat16, attn_impl="fusedqkv",
                           qkv_fused=qkv_fused_flag, mlp_fused=False)

        def layer(x, blk, lcfg=lcfg):
            return V._block(x, blk, lcfg, num_real_k=1374)[0]

        try:
            r = chain_time(layer, x128, blk, chain=2, reps=3)
            print(json.dumps(
                {"variant": f"B128_layer_qkv_fused={qkv_fused_flag}", **r}))
        except Exception as e:
            print(json.dumps(
                {"variant": f"B128_layer_qkv_fused={qkv_fused_flag}",
                 "error": str(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
