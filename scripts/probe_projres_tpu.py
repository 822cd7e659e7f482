"""TPU probe round 3b: fused out-proj + layerscale + residual kernel.

The round-3 device profile (PERF.md) put the 12 out-projection matmuls
inside XLA fusions at ~62% of matmul peak for the (128·1408, 768)x(768,
768) shape, while the pinned-weight Pallas dense (`fused_ln_dense`)
reaches ~92% of the analytic ideal at the qkv shape. This probes the
standalone `ops/mlp.fused_dense_residual` kernel (the epilogue-folded
*attention-kernel* variant lost — see PERF.md; this is the lighter
standalone version): isolated epilogue A/B plus the full flagship layer
with/without `proj_fused`.
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

B, D = 128, 768
NPAD = 1408


def main():
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    cfg = V.ViTConfig(dtype=jnp.bfloat16)
    blk = make_block(jax.random.PRNGKey(0), cfg)

    # --- isolated epilogue: XLA dense+ls+residual vs the fused kernel
    def proj_xla(x, blk):
        return x + V._dense(x, blk["proj"]) * blk["ls1"]

    from patchioner_tpu.ops.mlp import fused_dense_residual

    def proj_fused(x, blk, bq):
        return fused_dense_residual(
            x, x, blk["proj"]["w"], blk["proj"]["b"], blk["ls1"], block_q=bq,
        )

    x = jax.random.normal(jax.random.PRNGKey(1), (B, NPAD, D), jnp.bfloat16)
    r = chain_time(proj_xla, x, blk, chain=8, reps=3)
    print(json.dumps({"variant": "proj_xla", **r}))
    sys.stdout.flush()
    for bq in (704, 352, 176, 128):
        try:
            r = chain_time(lambda x, blk, bq=bq: proj_fused(x, blk, bq),
                           x, blk, chain=8, reps=3)
            print(json.dumps({"variant": f"proj_fused_bq{bq}", **r}))
        except Exception as e:
            print(json.dumps({"variant": f"proj_fused_bq{bq}",
                              "error": repr(e)[:300]}))
        sys.stdout.flush()

    # --- full flagship layer A/B
    import dataclasses

    cfg_r3 = dataclasses.replace(cfg, attn_impl="fusedqkv", mlp_fused=True,
                                 qkv_fused=True)
    cfg_pf = dataclasses.replace(cfg_r3, proj_fused=True)
    for name, c in (("layer_r3", cfg_r3), ("layer_projfused", cfg_pf)):
        r = chain_time(
            lambda x, blk, c=c: V._block(x, blk, c, num_real_k=1374)[0],
            x, blk, chain=6, reps=3,
        )
        print(json.dumps({"variant": name, **r}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
