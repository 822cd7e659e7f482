"""TPU probe: ViECap / ClipCap prefix-mapper training throughput.

The reference's other two training loops (src/viecap/training/main.py,
src/clipcap/clipcapTraining.py) train a small mapper against a FROZEN GPT-2
base; PERF.md's training table so far covers only the DeCap decoder loop.
Geometry: GPT-2 base 12L/768 frozen bf16, 40-token captions, CLIP 512-d
features.

  - ViECap: 8-layer MappingNetwork transformer (soft prompt length 10)
  - ClipCap: MLP mapper (512 -> 768*10//2 -> 768*10)

Usage: python scripts/probe_prefix_train_tpu.py
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
from patchioner_tpu.models import clipcap as clipcap_mod
from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.models import viecap as viecap_mod
from patchioner_tpu.train import prefix_train

compile_cache.enable_compile_cache()

T = 40
D_MODEL = 768


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def run(name, mapper_init, mapper_fn, batch, iters=20):
    # mapper_init is a THUNK: every run gets an identical fresh starting
    # state, and the sweep stays safe if the step is ever built over a
    # mesh (the mesh path jits with donate_argnums=(0,1), deleting the
    # mapper/opt buffers on the first call)
    mapper_params = mapper_init()
    gcfg = gpt2_mod.GPT2Config(dtype=jnp.bfloat16)  # 12L/768 GPT-2 base
    gpt2_params = jax.jit(
        lambda k: gpt2_mod.init_gpt2(k, gcfg)
    )(jax.random.PRNGKey(0))
    # loss_chunk: the full (B, 40, 50257) f32 logits OOM the chip at B=1024
    # (21.25G > 15.75G HBM, measured without chunking)
    cfg = prefix_train.PrefixTrainConfig(
        lr=2e-5, warmup_steps=10, total_steps=1000, noise_variance=0.016,
        loss_chunk=8,
    )
    import optax

    sched = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    opt_state = jax.jit(tx.init)(mapper_params)
    step = prefix_train.make_prefix_train_step(mapper_fn, gcfg, cfg, tx)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((batch, 512)), jnp.float32)
    toks_np = rng.integers(1, 50257, (batch, T)).astype(np.int32)
    lengths = np.clip(rng.normal(12.0, 3.0, batch).round(), 6, T - 1).astype(int)
    for i, l in enumerate(lengths):
        toks_np[i, l:] = 0
    toks = jnp.asarray(toks_np)
    mask = jnp.asarray((toks_np != 0).astype(np.float32))
    for leaf in (feats, toks, mask):
        np.asarray(leaf.ravel()[0])
    key = jax.random.PRNGKey(3)

    p, o = mapper_params, opt_state
    p, o, m = step(p, o, gpt2_params, feats, toks, mask, key)
    sync(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step(p, o, gpt2_params, feats, toks, mask, key)
        sync(m)
    dts = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "variant": name, "batch": batch,
        "steps_per_s": round(1 / dts, 2),
        "captions_per_s": round(batch / dts, 1),
        "loss": float(m["loss"]),
    }))
    sys.stdout.flush()


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()

    vcfg = viecap_mod.ViecapConfig()
    vinit = lambda: viecap_mod.init_mapping_network(
        jax.random.PRNGKey(1), vcfg, D_MODEL
    )
    vfn = lambda p, x: viecap_mod.mapping_network_forward(p, x, vcfg, D_MODEL)
    for batch in (256, 1024):
        run("viecap_mapping_network", vinit, vfn, batch)

    L = 10
    cinit = lambda: clipcap_mod.init_mlp_mapper(
        jax.random.PRNGKey(2), 512, L, D_MODEL
    )
    cfn = lambda p, x: clipcap_mod.mlp_mapper_forward(p, x, L, D_MODEL)
    for batch in (256, 1024):
        run("clipcap_mlp_mapper", cinit, cfn, batch)


if __name__ == "__main__":
    main()
