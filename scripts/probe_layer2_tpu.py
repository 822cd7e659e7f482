"""TPU probe round 2: where the non-attention time goes + batch scaling.

Variants on one full encoder layer (B=128, N=1374, d=768 bf16, XLA attn):
  - gelu_exact (parity default, erf on the VPU) vs gelu_tanh approximation;
  - attention replaced by identity (isolates the non-attention share);
  - B=256 (does larger batch amortize per-layer overheads?).
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
from scripts.probe_layer_tpu import make_block

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

D = 768


def variants():
    cfg = V.ViTConfig(dtype=jnp.bfloat16)
    blk = make_block(jax.random.PRNGKey(0), cfg)

    def layer(x, blk):
        return V._block(x, blk, cfg)[0]

    def layer_tanh(x, blk):
        a, _ = V._attention(V._ln(x, blk["norm1"], cfg.ln_eps), blk, cfg, False)
        x = x + a * blk["ls1"]
        m = V._dense(
            jax.nn.gelu(V._dense(V._ln(x, blk["norm2"], cfg.ln_eps), blk["fc1"]),
                        approximate=True),
            blk["fc2"],
        )
        return x + m * blk["ls2"]

    def layer_noattn(x, blk):
        a = V._dense(V._ln(x, blk["norm1"], cfg.ln_eps), blk["proj"])
        x = x + a * blk["ls1"]
        m = V._dense(
            jax.nn.gelu(V._dense(V._ln(x, blk["norm2"], cfg.ln_eps), blk["fc1"]),
                        approximate=False),
            blk["fc2"],
        )
        return x + m * blk["ls2"]

    return blk, [
        ("gelu_exact_b128", layer, 128),
        ("gelu_tanh_b128", layer_tanh, 128),
        ("noattn_b128", layer_noattn, 128),
        ("gelu_exact_b256", layer, 256),
    ]


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    blk, vs = variants()
    for name, fn, b in vs:
        x = jax.random.normal(jax.random.PRNGKey(1), (b, 1374, D), jnp.bfloat16)
        try:
            r = chain_time(fn, x, blk, chain=6, reps=3)
            print(json.dumps({"variant": name, **r}))
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:400]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
