"""TPU probe round 3: is the attention-half LN materialized before qkv?

The MLP half's LN is already folded into `fused_ln_mlp`; the attention
half still runs LN (XLA) -> qkv matmul (XLA). If XLA fuses the normalize
into the dot's operand read, LN+matmul should cost ~= matmul alone and
there is no kernel opportunity; if LN adds ~a full (B, N, D) round-trip
(~0.67 ms at the flagship shape), a fused LN+qkv kernel is the next
encoder lever. Also probes a candidate Pallas fused LN+qkv kernel.
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

B, D = 128, 768
NPAD = 1408


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(dtype=jnp.bfloat16)
    blk = make_block(jax.random.PRNGKey(0), cfg)

    def qkv_only(x, blk):
        y = V._dense(x, blk["qkv"])  # (B, N, 3D)
        # fold back to input shape so the chain composes
        return y[..., :D] + y[..., D:2 * D]

    def ln_qkv(x, blk):
        y = V._dense(V._ln(x, blk["norm1"], cfg.ln_eps), blk["qkv"])
        return y[..., :D] + y[..., D:2 * D]

    from patchioner_tpu.ops.mlp import fused_ln_dense

    def ln_qkv_fused(x, blk, bq):
        y = fused_ln_dense(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["qkv"]["w"], blk["qkv"]["b"], eps=cfg.ln_eps, block_q=bq,
        )
        return y[..., :D] + y[..., D:2 * D]

    x = jax.random.normal(jax.random.PRNGKey(1), (B, NPAD, D), jnp.bfloat16)
    for name, fn in (("qkv_only", qkv_only), ("ln_qkv", ln_qkv)):
        r = chain_time(fn, x, blk, chain=8, reps=3)
        print(json.dumps({"variant": name, **r}))
        sys.stdout.flush()
    for bq in (704, 352, 176, 128):
        try:
            r = chain_time(lambda x, blk, bq=bq: ln_qkv_fused(x, blk, bq),
                           x, blk, chain=8, reps=3)
            print(json.dumps({"variant": f"ln_qkv_fused_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"ln_qkv_fused_bq{bq}",
                              "error": repr(e)[:300]}))
        sys.stdout.flush()

    # full flagship layer: fused LN+qkv + fusedqkv attention + fused MLP
    import dataclasses

    cfg_full = dataclasses.replace(cfg, attn_impl="fusedqkv",
                                   mlp_fused=True)
    cfg_fullq = dataclasses.replace(cfg_full, qkv_fused=True)
    for name, c in (("layer_r2", cfg_full), ("layer_qkvfused", cfg_fullq)):
        r = chain_time(
            lambda x, blk, c=c: V._block(x, blk, c, num_real_k=1374)[0],
            x, blk, chain=6, reps=3,
        )
        print(json.dumps({"variant": name, **r}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
