"""TPU probe: gradient accumulation at the big-batch training wall.

PERF.md's training table: plain B=4096 OOMs on the (B, 40, V) f32 logits;
loss_chunk=2 trains it; B=8192 compile-fails even chunked (the saved
(B, 41, 3072) MLP intermediates alone are ~8 GB). grad_accum keeps only one
micro-batch's activations live at a time, so a global batch of 8192 should
train as 2x4096 (or 4x2048) micro-batches inside ONE jitted step with one
big-batch-equivalent update.

A/B (4-layer GPT-2 d=768 bf16, 40-token rows, loss_chunk=2):
  - B=4096 accum=1  (the round-3 ceiling)
  - B=8192 accum=2  (the wall breaker)
  - B=8192 accum=4  (smaller micro-batches; same update)

Usage: python scripts/probe_accum_tpu.py
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
from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.train import decoder_train as dt

compile_cache.enable_compile_cache()

T = 40
VOCAB = 50257


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(batch, accum, iters=12):
    gcfg = gpt2_mod.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                               dtype=jnp.bfloat16)
    tcfg = dt.TrainConfig(lr=2e-5, warmup_steps=10, total_steps=1000,
                          gaussian_noise=0.016, loss_chunk=2,
                          grad_accum=accum)
    tx = dt.make_optimizer(tcfg)
    params = jax.jit(
        lambda k: decap_mod.init_decap(k, gcfg, prefix_size=768)
    )(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    step = dt.make_train_step(gcfg, tcfg, tx)

    rng = np.random.default_rng(0)
    toks_np = rng.integers(1, VOCAB, (batch, T)).astype(np.int32)
    lengths = np.clip(rng.normal(12.0, 3.0, batch).round(), 6, T - 1).astype(int)
    for i, l in enumerate(lengths):
        toks_np[i, l:] = 0
    feats_np = rng.standard_normal((batch, 768)).astype(np.float32)
    if accum > 1:
        m = batch // accum
        feats_np = feats_np.reshape(accum, m, -1)
        toks_np = toks_np.reshape(accum, m, -1)
    feats = jnp.asarray(feats_np)
    toks = jnp.asarray(toks_np)
    for leaf in (feats, toks):  # force the lazy tunnel transfer pre-timing
        np.asarray(leaf.ravel()[0])
    key = jax.random.PRNGKey(3)

    p, o = params, opt_state
    try:
        p, o, metrics = step(p, o, feats, toks, key)
        sync(metrics)
    except Exception as e:  # noqa: BLE001 — record the failure mode
        print(json.dumps({
            "batch": batch, "accum": accum, "error": type(e).__name__,
            "msg": str(e)[:200],
        }))
        sys.stdout.flush()
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, metrics = step(p, o, feats, toks, key)
        sync(metrics)  # sync every step: queued steps each hold a workspace
    dts = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "batch": batch, "accum": accum,
        "steps_per_s": round(1 / dts, 3),
        "captions_per_s": round(batch / dts, 1),
        "loss": float(metrics["loss"]),
    }))
    sys.stdout.flush()


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    run(4096, 1)
    run(8192, 2)
    run(8192, 4)
    run(16384, 4)


if __name__ == "__main__":
    main()
