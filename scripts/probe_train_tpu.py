"""TPU probe: decoder-training step throughput (the reference's only
training loop — src/decap/decoderTraining.py).

Times the full jitted train step (CapDec noise -> DeCap forward ->
smoothed-CE -> AdamW update) at reference-like sizes: 4-layer GPT-2 d=768,
CLIP-dim text features, batch sweep. Reports steps/s and captions/s.
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.train import decoder_train as dt

# persistent XLA cache: stop re-paying multi-minute tunnel compiles per process
from patchioner_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()
    gcfg = gpt2_mod.GPT2Config(n_layer=4, n_head=4, n_embd=768,
                               dtype=jnp.bfloat16)
    tcfg = dt.TrainConfig(lr=2e-5, warmup_steps=10, total_steps=1000,
                          gaussian_noise=0.016)
    tx = dt.make_optimizer(tcfg)
    step = dt.make_train_step(gcfg, tcfg, tx)

    for batch in (256, 1024, 4096):
        feats = jax.random.normal(jax.random.PRNGKey(1), (batch, 768))
        toks = jax.random.randint(jax.random.PRNGKey(2), (batch, 40), 0, 49408)
        key = jax.random.PRNGKey(3)
        # fresh init per batch size: identical starting state for every
        # row, and safe if the step is ever built over a mesh (the mesh
        # path jits with donate_argnums=(0,1), which deletes these buffers
        # on the first call)
        p = jax.jit(
            lambda k: decap_mod.init_decap(k, gcfg, prefix_size=768)
        )(jax.random.PRNGKey(0))
        o = jax.jit(tx.init)(p)
        t0 = time.perf_counter()
        try:
            p, o, m = step(p, o, feats, toks, key)
            sync(m)
        except Exception as e:
            # expected at 4096: the plain loss materializes (B, 40, 50257)
            # f32 logits = 33 GB (use probe_train_chunked for loss_chunk)
            print(json.dumps({"batch": batch, "error": str(e)[:200]}))
            sys.stdout.flush()
            continue
        compile_s = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, m = step(p, o, feats, toks, key)
        sync(m)
        dts = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "batch": batch,
            "steps_per_s": round(1 / dts, 2),
            "captions_per_s": round(batch / dts, 1),
            "compile_s": round(compile_s, 1),
            "loss": float(m["loss"]),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
