"""TPU smoke: the fused single-dispatch bbox-caption path at flagship scale.

`Patchioner.caption_bboxes_fused` collapses the dense-captioning math
(encoder -> per-box weighted means -> projection -> decode for B images x
NB boxes) into ONE jitted program — forward(bboxes=...)'s multi-dispatch
orchestration costs ~100 ms/batch of RPC on remote transports (PERF.md).
This compiles + times the fused program at flagship geometry and checks
caption equality vs forward on one batch.

Usage: python -m scripts.probe_densecap_fused_tpu [batch] [boxes_per_img]
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


def main():
    import jax
    import jax.numpy as jnp

    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": b, "boxes_per_img": nb}))
    sys.stdout.flush()
    config = {
        "dino_model": "dinov2_vitb14_reg", "resize_dim": 518,
        "crop_dim": 518, "prefix_size": 768, "normalize": True,
        "projection_type": "coco", "support_memory_size": 591753,
        "attn_impl": "fusedqkv", "mlp_fused": True, "qkv_fused": True,
    }
    model = Patchioner.from_config(
        config, rng_seed=0, allow_missing_weights=True,
        random_bank_size=config["support_memory_size"], dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (b, 518, 518, 3), np.uint8)
    # random xyxy boxes + a dummy pad box per image
    x1 = rng.uniform(0, 400, (b, nb - 1))
    y1 = rng.uniform(0, 400, (b, nb - 1))
    boxes = np.stack([x1, y1, x1 + rng.uniform(30, 118, x1.shape),
                      y1 + rng.uniform(30, 118, x1.shape)], axis=-1)
    boxes = np.concatenate(
        [boxes, np.tile([[0, 0, 1, 1]], (b, 1, 1))], axis=1
    ).astype(np.float32)

    t0 = time.time()
    got = model.caption_bboxes_fused(imgs, boxes, gaussian_avg=True)
    print(json.dumps({"fused_compile_plus_first_s":
                      round(time.time() - t0, 1)}))
    sys.stdout.flush()
    times = []
    for _ in range(3):
        t0 = time.time()
        model.caption_bboxes_fused(imgs, boxes, gaussian_avg=True)
        times.append(time.time() - t0)
    ms = min(times) * 1e3
    print(json.dumps({
        "fused_ms_per_batch": round(ms, 1),
        "box_captions_per_sec": round(b * nb / (ms / 1e3), 1),
    }))
    sys.stdout.flush()

    # Parity vs forward. Exact string equality is pinned on the CPU/f32
    # tests. On TPU bf16, a follow-up probe showed the two paths produce
    # BITWISE-IDENTICAL projected prefixes, and decoding both through one
    # shared program gives 40/40 equal captions — so any caption
    # disagreement here comes from the greedy DECODE being a different
    # compiled program instance (fused includes the encoder), whose bf16
    # tiling flips near-ties. With RANDOM weights (near-uniform logits)
    # ties are common; with trained weights top-1 margins dwarf bf16
    # noise. Report the agreement fraction, not a boolean.
    want = model.forward(
        imgs[:4], get_cls_capt=False, bboxes=boxes[:4], gaussian_avg=True
    )["bbox_capts"]
    got4 = model.caption_bboxes_fused(imgs[:4], boxes[:4], gaussian_avg=True)
    flat_w = [c for row in want for c in row]
    flat_g = [c for row in got4 for c in row]
    same = sum(a == b for a, b in zip(flat_w, flat_g))
    print(json.dumps({
        "captions_equal_vs_forward": same,
        "captions_total": len(flat_w),
        "note": "bf16 near-tie flips expected with random weights; "
                "CPU/f32 tests pin exact equality",
    }))


if __name__ == "__main__":
    main()
