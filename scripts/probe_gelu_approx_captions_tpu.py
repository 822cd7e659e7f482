"""gelu_approx caption sensitivity at deployment scale (VERDICT r3 #9).

Scales scripts/probe_gelu_approx_captions.py's 16-image CPU reading to the
2,048-image synthetic harness at FLAGSHIP geometry on TPU: the same
`eval/trace_captioning.evaluate` pipeline `scripts/eval_throughput_tpu.py`
drives (DINOv2-B/14-reg @518px, fused kernels, bf16, 592k random bank),
run twice — exact-erf GELU vs the tanh approximation (`gelu_approx`, the
~6% turbo preset) — and the greedy captions compared distributionally.

Pixels are generated ON DEVICE by a deterministic per-batch PRNG loader
(keyed off the annotation image ids), so the probe measures caption
sensitivity over 2,048 DISTINCT images without pushing ~1.6 GB of pixels
through the dev tunnel; traces still come from the staged annotation JSON
and everything downstream (trace padding, fused caption step, BPE detok,
predictions assembly) is the real harness. Set PATCHIONER_GELU_PROBE_JPEG=1
to use the harness's real JPEG loader instead (TPU-VM regime).

Usage: python -m scripts.probe_gelu_approx_captions_tpu [n_images] [batch]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import gc
import json
import os
import re
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from patchioner_tpu.eval import trace_captioning
    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.utils.compile_cache import enable_compile_cache
    from scripts.eval_throughput_tpu import make_split

    enable_compile_cache()

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    on_tpu = jax.default_backend() not in ("cpu",)
    dim = 518 if on_tpu else 140
    root = os.environ.get("PATCHIONER_EVAL_TP_DIR", "/tmp/eval_tp_images")
    ann_path = make_split(root, n_images)
    print(json.dumps({"n_images": n_images, "batch": batch, "dim": dim,
                      "backend": jax.default_backend()}))
    sys.stdout.flush()

    if os.environ.get("PATCHIONER_GELU_PROBE_JPEG") == "1":
        loader = None  # real JPEG decode + upload per batch
    else:
        # deterministic device-side pixels: same ids -> same images in both
        # variant runs, zero host->device pixel traffic
        @jax.jit
        def _gen(key):
            return jax.random.uniform(
                key, (batch, dim, dim, 3), jnp.float32, -1.5, 1.5
            )

        def loader(paths):
            first_id = int(re.search(r"(\d+)\.jpg$", paths[0]).group(1))
            imgs = _gen(jax.random.PRNGKey(first_id))
            return imgs[: len(paths)]

    def run(gelu_approx: bool):
        config = {
            "dino_model": "dinov2_vitb14_reg",
            "resize_dim": dim,
            "crop_dim": dim,
            "prefix_size": 768,
            "normalize": True,
            "projection_type": "coco",
            "support_memory_size": 591753 if on_tpu else 2048,
        }
        if on_tpu:
            config.update({"attn_impl": "fusedqkv", "mlp_fused": True,
                           "qkv_fused": True})
        if gelu_approx:
            config["gelu_approx"] = True
        t0 = time.time()
        model = Patchioner.from_config(
            config, rng_seed=0, allow_missing_weights=True,
            random_bank_size=config["support_memory_size"],
            dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        )
        result = trace_captioning.evaluate(
            model, ann_path, root, batch_size=batch, loader=loader,
        )
        caps = [p["pred"] for p in result["predictions"]]
        print(json.dumps({"variant": "approx" if gelu_approx else "exact",
                          "captions": len(caps),
                          "wall_s": round(time.time() - t0, 1)}))
        sys.stdout.flush()
        # free the ~2 GB bank + params before the second variant builds
        del model, result
        gc.collect()
        return caps

    exact = run(False)
    approx = run(True)

    same = sum(a == b for a, b in zip(exact, approx))
    # prefix agreement: greedy chains amplify the first divergent argmax,
    # so report WHERE captions diverge, not just whether
    prefix_fracs = []
    for a, b in zip(exact, approx):
        wa, wb = a.split(), b.split()
        k = 0
        for x, y in zip(wa, wb):
            if x != y:
                break
            k += 1
        prefix_fracs.append(k / max(len(wa), len(wb), 1))
    summary = {
        "n": len(exact),
        "identical": same,
        "identical_frac": round(same / max(len(exact), 1), 4),
        "mean_prefix_agreement": round(float(np.mean(prefix_fracs)), 4),
    }
    print(json.dumps({"summary": summary}))
    shown = 0
    for i, (a, b) in enumerate(zip(exact, approx)):
        if a != b and shown < 5:
            print(json.dumps({"diverged_img": i, "exact": a, "approx": b}))
            shown += 1


if __name__ == "__main__":
    main()
