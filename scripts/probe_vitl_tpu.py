"""TPU probe: ViT-L/14 encoder layer (d=1024, 16 heads, N=1374) —
XLA attention vs fused-qkv kernel, to confirm the round-2 winner
generalizes beyond the ViT-B flagship geometry."""

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
from scripts.probe_layer_tpu import make_block

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, D, H, HD = 128, 1024, 16, 64
NREAL, NPAD = 1374, 1408


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(embed_dim=D, num_heads=H, dtype=jnp.bfloat16)
    blk = make_block(jax.random.PRNGKey(0), cfg)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, NREAL, D), jnp.bfloat16)
    r = chain_time(lambda x, blk: V._block(x, blk, cfg)[0], x, blk,
                   chain=4, reps=3)
    print(json.dumps({"variant": "vitl_xla_n1374", **r}))
    sys.stdout.flush()

    def layer_fused(x, blk):
        xn = V._ln(x, blk["norm1"], cfg.ln_eps)
        qkv = V._dense(xn, blk["qkv"])
        a = fused_qkv_attention(
            qkv, num_heads=H, scale=HD**-0.5, num_real_k=NREAL, block_q=NPAD
        )
        a = V._dense(a, blk["proj"])
        x = x + a * blk["ls1"]
        m = V._dense(
            jax.nn.gelu(V._dense(V._ln(x, blk["norm2"], cfg.ln_eps),
                                 blk["fc1"]), approximate=False),
            blk["fc2"],
        )
        return x + m * blk["ls2"]

    xp = jax.random.normal(jax.random.PRNGKey(1), (B, NPAD, D), jnp.bfloat16)
    r = chain_time(layer_fused, xp, blk, chain=4, reps=3)
    print(json.dumps({"variant": "vitl_fusedqkv_n1408", **r}))


if __name__ == "__main__":
    main()
