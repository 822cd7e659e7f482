"""TPU probe: packed vs unpacked decoder-training throughput.

Reference geometry (4-layer GPT-2 d=768 bf16, 40-token caption rows,
src/decap/decoderTraining.py) with a realistic COCO length distribution
(~N(12, 3) clipped to [6, 39] — CLIP-BPE COCO captions average ~11-12 tokens
incl. SOT/EOS). Packing (train/packing.py) should convert the ~70% pad
compute into real captions at roughly equal positions/step.

A/B at matched token budgets, all with loss_chunk=8 (the measured-best CE):
  - unpacked B=1024 (41,984 positions/step)
  - packed  R=1024, L=40  (40,960 positions/step)
  - packed  R=320,  L=128 (40,960 positions/step, fewer/larger rows)

Usage: python scripts/probe_pack_tpu.py
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
from patchioner_tpu.train import packing

compile_cache.enable_compile_cache()

N_CAPS = 60_000
T = 40
VOCAB = 50257


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def synth_captions(rng):
    lengths = np.clip(rng.normal(12.0, 3.0, N_CAPS).round(), 6, T - 1).astype(int)
    toks = np.zeros((N_CAPS, T), np.int32)
    for i, l in enumerate(lengths):
        toks[i, :l] = rng.integers(1, VOCAB, l)
    return toks, lengths


def build():
    gcfg = gpt2_mod.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                               dtype=jnp.bfloat16)
    tcfg = dt.TrainConfig(lr=2e-5, warmup_steps=10, total_steps=1000,
                          gaussian_noise=0.016, loss_chunk=8)
    tx = dt.make_optimizer(tcfg)
    params = jax.jit(
        lambda k: decap_mod.init_decap(k, gcfg, prefix_size=768)
    )(jax.random.PRNGKey(0))
    opt_state = jax.jit(tx.init)(params)
    return gcfg, tcfg, tx, params, opt_state


def run_unpacked(toks, feats_np, batch=1024, iters=20):
    gcfg, tcfg, tx, params, opt_state = build()
    step = dt.make_train_step(gcfg, tcfg, tx)
    feats = jnp.asarray(feats_np[:batch])
    tb = jnp.asarray(toks[:batch])
    key = jax.random.PRNGKey(3)
    p, o = params, opt_state
    p, o, m = step(p, o, feats, tb, key)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, feats, tb, key)
        sync(m)
    dts = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "variant": "unpacked", "rows": batch, "row_len": T,
        "steps_per_s": round(1 / dts, 2),
        "captions_per_s": round(batch / dts, 1),
        "positions_per_step": batch * (T + 1),
        "loss": float(m["loss"]),
    }))
    sys.stdout.flush()


def run_packed(toks, lengths, feats_np, rows, row_len, iters=20):
    gcfg, tcfg, tx, params, opt_state = build()
    step = dt.make_packed_train_step(gcfg, tcfg, tx)
    max_segments = row_len // int(lengths.min())
    pack = packing.pack_captions(toks, row_len, max_segments=max_segments)
    nrows = pack.targets.shape[0]
    assert nrows >= rows, (nrows, rows)
    features = jnp.asarray(feats_np)  # full array resident once
    batches = []
    caps_per_batch = []
    for start in range(0, min(nrows - rows + 1, rows * 3), rows):
        b = packing.PackedBatch(
            *(jnp.asarray(a[start : start + rows]) for a in pack)
        )
        batches.append(b)
        caps_per_batch.append(int(b.prefix_mask.sum()))
    for b in batches:  # force the lazy tunnel transfers out of the timed loop
        for leaf in b:
            np.asarray(leaf.ravel()[0])
    key = jax.random.PRNGKey(3)
    p, o = params, opt_state
    p, o, m = step(p, o, features, batches[0], key)
    sync(m)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, m = step(p, o, features, batches[i % len(batches)], key)
        sync(m)
    dts = (time.perf_counter() - t0) / iters
    mean_caps = float(np.mean(caps_per_batch))
    print(json.dumps({
        "variant": "packed", "rows": rows, "row_len": row_len,
        "steps_per_s": round(1 / dts, 2),
        "captions_per_step": round(mean_caps, 1),
        "captions_per_s": round(mean_caps / dts, 1),
        "positions_per_step": rows * row_len,
        "slot_use": round(packing.packing_efficiency(pack), 3),
        "loss": float(m["loss"]),
    }))
    sys.stdout.flush()


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    rng = np.random.default_rng(0)
    toks, lengths = synth_captions(rng)
    feats_np = rng.standard_normal((N_CAPS, 768)).astype(np.float32)
    run_unpacked(toks, feats_np)
    run_packed(toks, lengths, feats_np, rows=1024, row_len=40)
    run_packed(toks, lengths, feats_np, rows=320, row_len=128)


if __name__ == "__main__":
    main()
