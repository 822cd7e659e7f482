"""Caption-level impact of `gelu_approx` (tanh GELU in the fused MLP kernel).

PERF.md's remaining-lever #1 asks what the ~6% throughput opt-in costs in
caption fidelity. True pretrained ViT/DeCap weights are unavailable in this
zero-egress image, so this measures the closable slice: seeded-random ViT +
DeCap + bank with the REAL in-tree Talk2DINO weights (the same setup as the
committed golden pins, tests/test_golden_captions.py), comparing greedy
captions between exact-erf GELU and the tanh approximation across N images
and three caption modes (cls / avg_self_attn / trace).

Greedy argmax chains amplify tiny numeric diffs (SURVEY.md §7 "hard
parts"), so agreement here is a *sensitivity* reading for the lever, not a
statement about pretrained-weight quality. Run on CPU:

    python scripts/probe_gelu_approx_captions.py [n_images]
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys


import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from patchioner_tpu.models.patchioner import Patchioner  # noqa: E402

REF_T2D_WEIGHTS = (
    "/root/reference/Patch-ioner/src/viecap/training/talk2dino/weights/"
    "vitb_mlp_infonce.pth"
)

BASE_CONFIG = {
    "dino_model": "dinov2_vitb14_reg",
    "crop_dim": 140,
    "prefix_size": 512,
    "support_memory_size": 256,
    "normalize": True,
    "attention_type": "qkv",
    "projection_type": "coco",
    "talk2dino_weights": REF_T2D_WEIGHTS,
}


def _captions(gelu_approx: bool, imgs, traces):
    cfg = dict(BASE_CONFIG)
    if gelu_approx:
        cfg["gelu_approx"] = True
    model = Patchioner.from_config(
        cfg, rng_seed=0, allow_missing_weights=True, random_bank_size=256
    )
    outs = model.forward(
        imgs, get_cls_capt=True, get_avg_self_attn_capt=True, traces=traces
    )
    return {
        "cls": outs["cls_capt"],
        "avg_self_attn": outs["avg_self_attn_capt"],
        "trace": outs["trace_capts"],
    }


def main(n: int = 16) -> None:
    rng = np.random.default_rng(1234)
    imgs = rng.uniform(-1.5, 1.5, (n, 140, 140, 3)).astype(np.float32)
    pts = rng.uniform(0.1, 0.9, (n, 3, 2))
    traces = [[{"x": float(x), "y": float(y)} for x, y in p] for p in pts]

    exact = _captions(False, imgs, traces)
    approx = _captions(True, imgs, traces)

    for mode in ("cls", "avg_self_attn", "trace"):
        a, b = exact[mode], approx[mode]
        same = sum(x == y for x, y in zip(a, b))
        print(f"{mode:14s} identical {same}/{n}")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  img {i}: exact ={x!r}")
                print(f"  img {i}: approx={y!r}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
