"""TPU probe: encoder layer with BOTH halves fused — fused-qkv attention +
fused LN/MLP/residual kernel — vs the round-2 winner (fusedqkv + XLA MLP,
38.1 ms/layer). Also the fused MLP half alone vs the XLA MLP half."""

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
from patchioner_tpu.ops.attention import fused_qkv_attention
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

    def attn_half(x, blk):
        xn = V._ln(x, blk["norm1"], cfg.ln_eps)
        qkv = V._dense(xn, blk["qkv"])
        a = fused_qkv_attention(
            qkv, num_heads=H, scale=HD**-0.5, num_real_k=NREAL, block_q=NPAD
        )
        return x + V._dense(a, blk["proj"]) * blk["ls1"]

    def layer_fused_attn(x, blk):  # round-2 current: XLA MLP half
        x = attn_half(x, blk)
        m = V._dense(
            jax.nn.gelu(V._dense(V._ln(x, blk["norm2"], cfg.ln_eps),
                                 blk["fc1"]), approximate=False),
            blk["fc2"],
        )
        return x + m * blk["ls2"]

    def mlp_half(x, blk, bq):
        return fused_ln_mlp(
            x, blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["fc1"]["w"], blk["fc1"]["b"], blk["fc2"]["w"], blk["fc2"]["b"],
            blk["ls2"], eps=cfg.ln_eps, block_q=bq,
        )

    def layer_both_fused(x, blk, bq):
        return mlp_half(attn_half(x, blk), blk, bq)

    xp = jax.random.normal(jax.random.PRNGKey(1), (B, NPAD, D), jnp.bfloat16)
    r = chain_time(layer_fused_attn, xp, blk, chain=6, reps=3)
    print(json.dumps({"variant": "layer_fusedattn_xlamlp", **r}))
    sys.stdout.flush()
    for bq in (256, 128, 704):
        try:
            r = chain_time(lambda x, blk, bq=bq: layer_both_fused(x, blk, bq),
                           xp, blk, chain=6, reps=3)
            print(json.dumps({"variant": f"layer_bothfused_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"layer_bothfused_bq{bq}",
                              "error": repr(e)[:400]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
