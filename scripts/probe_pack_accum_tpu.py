"""TPU probe: sequence packing x gradient accumulation composed.

The production large-batch recipe: packed rows (train/packing.py, ~3x real
captions per position) scanned as grad_accum micro-batches (one big-batch-
equivalent update past the activation-memory wall). Geometry matches
probe_pack_tpu.py (4-layer DeCap bf16, ~N(12,3) caption lengths,
loss_chunk=8); rows_len=128 at 95% slot use.

  - packed R=320  accum=1  (the probe_pack_tpu.py best, ~3.2k captions/step)
  - packed R=1280 accum=4  (4x the rows, same live memory, one update)
  - packed R=2560 accum=8  (~26k captions per optimizer update)

Usage: python scripts/probe_pack_accum_tpu.py
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
from patchioner_tpu.train import packing

compile_cache.enable_compile_cache()

N_CAPS = 120_000
T = 40
L = 128
VOCAB = 50257


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(rows, accum, iters=10):
    gcfg = gpt2_mod.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                               dtype=jnp.bfloat16)
    tcfg = dt.TrainConfig(lr=2e-5, warmup_steps=10, total_steps=1000,
                          gaussian_noise=0.016, loss_chunk=8,
                          grad_accum=accum)
    tx = dt.make_optimizer(tcfg)
    params = jax.jit(
        lambda k: decap_mod.init_decap(k, gcfg, prefix_size=768)
    )(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    step = dt.make_packed_train_step(gcfg, tcfg, tx)

    rng = np.random.default_rng(0)
    lengths = np.clip(rng.normal(12.0, 3.0, N_CAPS).round(), 6, T - 1).astype(int)
    toks = np.zeros((N_CAPS, T), np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, VOCAB, l)
    pack = packing.pack_captions(toks, L, max_segments=L // int(lengths.min()))
    nrows = pack.targets.shape[0]
    assert nrows >= rows, (nrows, rows)
    features = jnp.asarray(
        rng.standard_normal((N_CAPS, 768)).astype(np.float32)
    )
    np.asarray(features.ravel()[0])

    def slice_batch(start):
        leaves = []
        for a in pack:
            b = a[start : start + rows]
            if accum > 1:
                b = b.reshape((accum, rows // accum) + b.shape[1:])
            leaves.append(jnp.asarray(b))
        return packing.PackedBatch(*leaves)

    batches = [slice_batch(s) for s in range(0, min(nrows - rows + 1, rows * 2), rows)]
    caps = [int(np.asarray(b.prefix_mask).sum()) for b in batches]  # forces transfer
    key = jax.random.PRNGKey(3)

    p, o = params, opt_state
    p, o, m = step(p, o, features, batches[0], key)
    sync(m)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, m = step(p, o, features, batches[i % len(batches)], key)
        sync(m)
    dts = (time.perf_counter() - t0) / iters
    mean_caps = float(np.mean(caps))
    print(json.dumps({
        "rows": rows, "accum": accum, "row_len": L,
        "steps_per_s": round(1 / dts, 3),
        "captions_per_step": round(mean_caps, 1),
        "captions_per_s": round(mean_caps / dts, 1),
        "loss": float(m["loss"]),
    }))
    sys.stdout.flush()


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    run(320, 1)
    run(1280, 4)
    run(2560, 8)


if __name__ == "__main__":
    main()
