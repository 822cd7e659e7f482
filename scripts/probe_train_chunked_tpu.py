"""TPU probe: chunked-lm-head decoder training at the batch sizes the plain
loss OOMs on.

PERF.md's training table stops at B=1024 because the unchunked loss
materializes the full (B, 41, 50257) f32 logits (33 GB at B=4096).
TrainConfig.loss_chunk applies the tied-wte lm head `chunk` sequence
positions at a time under lax.scan + jax.checkpoint, so the live logits
block is (B, chunk, V). This probe measures steps/s / captions/s for the
chunked step at B=1024 (A/B vs unchunked) and B=4096/8192 (chunk sweep),
4-layer GPT-2 d=768 bf16, 40-token captions — the reference recipe
(src/decap/decoderTraining.py) geometry.

Usage: python scripts/probe_train_chunked_tpu.py
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time


import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.utils import compile_cache
from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.train import decoder_train as dt

compile_cache.enable_compile_cache()


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(batch, chunk, iters=20, sync_each=False):
    gcfg = gpt2_mod.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                               dtype=jnp.bfloat16)
    tcfg = dt.TrainConfig(lr=2e-5, warmup_steps=10, total_steps=1000,
                          gaussian_noise=0.016, loss_chunk=chunk)
    tx = dt.make_optimizer(tcfg)
    # Fresh init per run: the train step donates params/opt_state.
    params = jax.jit(
        lambda k: decap_mod.init_decap(k, gcfg, prefix_size=768)
    )(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    step = dt.make_train_step(gcfg, tcfg, tx)
    feats = jax.random.normal(jax.random.PRNGKey(1), (batch, 768))
    toks = jax.random.randint(jax.random.PRNGKey(2), (batch, 40), 0, 49408)
    key = jax.random.PRNGKey(3)
    p, o = params, opt_state
    t0 = time.perf_counter()
    try:
        p, o, m = step(p, o, feats, toks, key)
        sync(m)
    except Exception as e:  # noqa: BLE001 - record OOMs as data
        print(json.dumps({"batch": batch, "chunk": chunk,
                          "error": type(e).__name__,
                          "msg": str(e)[:200]}))
        sys.stdout.flush()
        return
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        # sync_each bounds in-flight steps to 1: at B>=4096 the workspaces of
        # queued async steps stack up and OOM a run whose single step fits
        # (adds the ~30-50 ms tunnel dispatch floor per step — small against
        # the multi-hundred-ms big-batch step).
        for _ in range(iters):
            p, o, m = step(p, o, feats, toks, key)
            if sync_each:
                sync(m)
        sync(m)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"batch": batch, "chunk": chunk, "phase": "loop",
                          "error": type(e).__name__, "msg": str(e)[:200]}))
        sys.stdout.flush()
        return
    dts = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "batch": batch,
        "chunk": chunk,
        "steps_per_s": round(1 / dts, 2),
        "captions_per_s": round(batch / dts, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(m["loss"]),
    }))
    sys.stdout.flush()


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    import os as _os

    if _os.environ.get("PATCHIONER_PROBE_BIG_ONLY") != "1":
        run(1024, 0)    # unchunked reference point (same session)
        run(1024, 8)    # chunk overhead A/B at a feasible batch
    for chunk in (2, 4, 8):
        run(4096, chunk, iters=10, sync_each=True)
    run(8192, 4, iters=5, sync_each=True)  # past the reference-feasible range
    run(16384, 2, iters=3, sync_each=True)


if __name__ == "__main__":
    main()
