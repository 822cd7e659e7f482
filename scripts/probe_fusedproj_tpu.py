"""TPU probe round 3: attention out-projection folded into the fused kernel.

Compares the round-2 flagship layer (fusedqkv whole-N + fused LN/MLP,
29.7 ms at B=128/N=1408/bf16) against `fused_qkv_attention_proj` — the
merged (B, N, D) attention output never round-trips HBM; the cost is K/V
re-reads because the (BQ, D) f32 accumulator forces block_q < N. Sweeps
block_q.
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
from patchioner_tpu.ops.attention import fused_qkv_attention, fused_qkv_attention_proj
from patchioner_tpu.ops.mlp import fused_ln_mlp
from scripts.probe_layer_tpu import make_block

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, D, H, HD = 128, 768, 12, 64
NREAL, NPAD = 1374, 1408


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(dtype=jnp.bfloat16)
    blk = make_block(jax.random.PRNGKey(0), cfg)

    def mlp_half(x, blk):
        return fused_ln_mlp(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["fc1"]["w"], blk["fc1"]["b"],
            blk["fc2"]["w"], blk["fc2"]["b"], blk["ls2"],
            eps=cfg.ln_eps, gelu_approx=False, block_q=704,
        )

    def layer_r2(x, blk):
        # round-2 flagship: fusedqkv whole-N + out-proj/ls/residual in XLA
        xn = V._ln(x, blk["norm1"], cfg.ln_eps)
        qkv = V._dense(xn, blk["qkv"])
        a = fused_qkv_attention(
            qkv, num_heads=H, scale=HD**-0.5, num_real_k=NREAL,
            block_q=NPAD,
        )
        a = V._dense(a, blk["proj"])
        x = x + a * blk["ls1"]
        return mlp_half(x, blk)

    def layer_proj(x, blk, bq):
        xn = V._ln(x, blk["norm1"], cfg.ln_eps)
        qkv = V._dense(xn, blk["qkv"])
        x = fused_qkv_attention_proj(
            qkv, x, blk["proj"]["w"], blk["proj"]["b"], blk["ls1"],
            num_heads=H, scale=HD**-0.5, num_real_k=NREAL, block_q=bq,
        )
        return mlp_half(x, blk)

    xpad = jax.random.normal(jax.random.PRNGKey(1), (B, NPAD, D), jnp.bfloat16)
    r = chain_time(layer_r2, xpad, blk, chain=6, reps=3)
    print(json.dumps({"variant": "r2_fusedqkv+mlp", **r}))
    sys.stdout.flush()
    for bq in (704, 512, 352, 256, 176):
        try:
            r = chain_time(lambda x, blk, bq=bq: layer_proj(x, blk, bq),
                           xpad, blk, chain=6, reps=3)
            print(json.dumps({"variant": f"fusedproj_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"fusedproj_bq{bq}",
                              "error": repr(e)[:300]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
