"""TPU probe: build a flagship-size support-memory bank end to end.

The reference's first run builds its 592k-caption COCO bank by encoding the
corpus with the CLIP text tower + Talk2DINO on GPU
(im2txtprojection.py:448-560) — a real production workflow, not just a
load-path. This measures every phase of the equivalent TPU build at the
same scale: host BPE tokenization (clip_bpe.tokenize_parallel), jitted
text-tower encode + Talk2DINO projection on the chip (one fixed-batch
program, batches kept in flight), HDF5 save (io/memory_bank.save_bank),
and the chunked int8 quantization. Random weights — throughput is
weight-independent.

Usage: python scripts/probe_bankbuild_tpu.py [n_captions] [batch]
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

from patchioner_tpu.io import memory_bank as mb
from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models import talk2dino as t2d
from patchioner_tpu.ops import memory_projection as memproj
from patchioner_tpu.text import clip_bpe
from patchioner_tpu.train import text_spaces


def synth_captions(n: int) -> list:
    rng = np.random.default_rng(0)
    words = np.array(
        "a the of on in with near man woman dog cat car tree street park "
        "table chair red blue green small large wooden old young person "
        "group plate food water sky grass building window standing sitting "
        "walking holding looking riding playing eating".split()
    )
    return [
        " ".join(rng.choice(words, max(4, int(rng.normal(12, 3)))))
        for _ in range(n)
    ]


def main():
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 592_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "n": n, "batch": batch}))
    sys.stdout.flush()

    caps = synth_captions(n)
    space = text_spaces.build_text_space("clip", None, seed=7)
    real_t2d = ("/root/reference/Patch-ioner/src/viecap/training/talk2dino/"
                "weights/vitb_mlp_infonce.pth")
    import torch

    from patchioner_tpu.io import torch_port

    if os.path.exists(real_t2d):
        t2dp = torch_port.port_talk2dino(
            torch.load(real_t2d, map_location="cpu"))
    else:
        g = torch.Generator().manual_seed(8)
        t2dp = torch_port.port_talk2dino({
            "linear_layer.weight": torch.randn(768, 512, generator=g),
            "linear_layer.bias": torch.randn(768, generator=g),
            "hidden_layers.0.weight": torch.randn(768, 768, generator=g) * 0.1,
            "hidden_layers.0.bias": torch.randn(768, generator=g) * 0.1,
        })

    # phase 1: host tokenization (the corpus-scale parallel path; this dev
    # box has ONE core so workers collapses to in-process — a TPU VM's
    # 100+ cores scale this phase near-linearly)
    t0 = time.perf_counter()
    tokens = clip_bpe.tokenize_parallel(caps, space.cfg.context_length)
    t_tok = time.perf_counter() - t0
    print(json.dumps({"phase": "tokenize", "s": round(t_tok, 2),
                      "captions_per_s": round(n / t_tok, 1)}))
    sys.stdout.flush()

    # phase 2: device encode — ONE jitted fixed-batch program (tower +
    # Talk2DINO projection fused), batches left in flight; tokens are
    # 1.2 MB/batch over the link
    @jax.jit
    def encode(toks):
        f = clip_mod.clip_text_forward(space.params, toks, space.cfg)
        return t2d.project_clip_txt(t2dp, f)

    pad = (-n) % batch
    toks_padded = np.concatenate(
        [tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)]
    ) if pad else tokens
    out0 = encode(jnp.asarray(toks_padded[:batch]))  # compile
    np.asarray(out0[0, 0])  # sync (axon block_until_ready doesn't block)
    t0 = time.perf_counter()
    outs = []
    for i in range(0, len(toks_padded), batch):
        outs.append(encode(jnp.asarray(toks_padded[i : i + batch])))
    emb = np.concatenate([np.asarray(o) for o in outs])[:n]
    t_enc = time.perf_counter() - t0
    print(json.dumps({"phase": "encode+talk2dino", "s": round(t_enc, 2),
                      "captions_per_s": round(n / t_enc, 1),
                      "dim": int(emb.shape[1])}))
    sys.stdout.flush()

    # phase 3: HDF5 save with the reference filename scheme + reload
    t0 = time.perf_counter()
    path = "/tmp/probe_bank.h5"
    if os.path.exists(path):
        os.remove(path)
    mb.save_bank(path, "coco_captions", mb.MemoryBank(emb, caps))
    t_save = time.perf_counter() - t0
    t0 = time.perf_counter()
    loaded = mb.load_bank(path, "coco_captions")
    t_load = time.perf_counter() - t0
    assert loaded.embeddings.shape == emb.shape
    print(json.dumps({"phase": "hdf5", "save_s": round(t_save, 2),
                      "load_s": round(t_load, 2),
                      "gb": round(emb.nbytes / 1e9, 2)}))
    sys.stdout.flush()

    # phase 4: chunked int8 quantization of the resident bank
    rows = jax.device_put(jnp.asarray(emb, jnp.bfloat16))
    t0 = time.perf_counter()
    qb = memproj.quantize_bank(rows)
    np.asarray(qb.rows[0, 0])
    t_q = time.perf_counter() - t0
    print(json.dumps({"phase": "quantize_int8", "s": round(t_q, 2)}))

    total = t_tok + t_enc + t_save
    print(json.dumps({"phase": "TOTAL build", "s": round(total, 2),
                      "captions_per_s": round(n / total, 1)}))


if __name__ == "__main__":
    main()
