"""TPU experiment: drive the REAL trace-captioning eval harness at bench
throughput (VERDICT r2 #3).

bench.py feeds pre-staged device tensors; this script instead pushes a
synthetic LN-COCO-style split — real JPEG bytes decoded by the harness's
own loader — through `eval/trace_captioning.evaluate` on the flagship
config (DINOv2-B/14-reg @518, fused kernels, 592k random bank) and reports
sustained captions/s with phase timing. Target: within ~15% of bench's
latency-basis number (the eval loop syncs per batch; bench's pipelined
mode additionally hides the dispatch roundtrip).

Usage: python -m scripts.eval_throughput_tpu [n_images] [batch]
Writes predictions + a results CSV next to the images.
"""

import json
import os
import sys
import time

import numpy as np


def make_split(root: str, n_images: int, trace_len: int = 32) -> str:
    """n random-content 640x480 JPEGs + LN-style annotation JSON (one
    caption+trace per image; fixed trace length keeps batch shapes static
    so the forward jits once)."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    ann = {}
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img_id = f"{i:06d}"
        path = os.path.join(root, f"{img_id}.jpg")
        if not os.path.exists(path):
            # smooth noise compresses like a natural image (not flat noise)
            small = rng.integers(0, 255, (30, 40, 3), np.uint8)
            img = Image.fromarray(small).resize((640, 480), Image.BICUBIC)
            img.save(path, quality=90)
        pts = rng.uniform(0.05, 0.95, (trace_len, 2))
        ann[img_id] = {
            "captions": [f"synthetic caption {i}"],
            "traces": [[{"x": float(x), "y": float(y)} for x, y in pts]],
        }
    ann_path = os.path.join(root, "ln_synth.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path


def main():
    import jax

    from patchioner_tpu.eval import trace_captioning
    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    on_tpu = jax.default_backend() not in ("cpu",)
    root = os.environ.get("PATCHIONER_EVAL_TP_DIR", "/tmp/eval_tp_images")
    ann_path = make_split(root, n_images)
    print(json.dumps({"split": root, "n_images": n_images, "batch": batch,
                      "devices": [str(d) for d in jax.devices()]}))
    sys.stdout.flush()

    dim = 518 if on_tpu else 140  # CPU smoke: full-518 compiles take minutes
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
    import jax.numpy as jnp

    t0 = time.time()
    model = Patchioner.from_config(
        config, rng_seed=0, allow_missing_weights=True,
        random_bank_size=config["support_memory_size"],
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    print(json.dumps({"model_built_s": round(time.time() - t0, 1)}))
    sys.stdout.flush()

    # warmup: one batch to absorb the flagship forward compile so the
    # measured runs are steady-state (jit cache is per-process)
    t0 = time.time()
    trace_captioning.evaluate(model, ann_path, root, batch_size=batch,
                              limit=batch)
    if n_images % batch:
        # the final partial batch is a fresh jit shape — warm it too, or
        # its flagship compile (minutes over the tunnel) lands inside the
        # timed runs
        trace_captioning.evaluate(model, ann_path, root, batch_size=batch,
                                  limit=n_images % batch)
    print(json.dumps({"warmup_compile_s": round(time.time() - t0, 1)}))
    sys.stdout.flush()

    def report(tag, result, wall):
        timing = result["timing"]
        n = len(result["predictions"])
        pre = timing["phases"].get("preprocessing", {})
        inf = timing["phases"].get("inference", {})
        print(json.dumps({
            "mode": tag,
            "captions": n,
            "wall_s": round(wall, 1),
            "captions_per_sec_wall": round(n / wall, 1),
            "images_per_sec_inference": round(
                timing["images_per_sec_inference"], 1
            ),
            "images_per_sec_total": round(timing["images_per_sec_total"], 1),
            "stall_mean_batch_ms": round(
                pre.get("mean_batch_s", 0) * 1e3, 1
            ),
            "inference_mean_batch_ms": round(
                inf.get("mean_batch_s", 0) * 1e3, 1
            ),
        }))
        sys.stdout.flush()

    # mode 1 — streaming: the full pipeline including the host->device
    # link. On this dev environment the link is a ~55 MB/s network tunnel
    # to a remote chip (measured by a device_put probe); on a real TPU VM
    # it is PCIe (>=16 GB/s, ~2 ms per uint8 batch) — the uint8+overlap
    # path exists for that regime and minimizes link bytes here.
    t0 = time.time()
    result = trace_captioning.evaluate(
        model, ann_path, root, batch_size=batch,
        out_path=os.path.join(root, "predictions.json"),
    )
    report("streaming", result, time.time() - t0)

    # mode 2 — device-resident pixels: the SAME harness (trace padding,
    # forward, greedy decode, BPE detok, predictions assembly) with the
    # pixel batches pre-staged on device, isolating harness overhead from
    # link bandwidth. This is the regime the bench measures and the number
    # comparable to it.
    import jax as _jax

    from PIL import Image

    from patchioner_tpu.utils import transforms

    pool_paths = sorted(
        os.path.join(root, f) for f in os.listdir(root)
        if f.endswith(".jpg")
    )[:batch]
    staged = _jax.device_put(np.stack([
        transforms.preprocess_pil_uint8(Image.open(p), dim, dim)
        for p in pool_paths
    ]))
    # device_put on the axon backend is LAZY (the RPC fires when the first
    # consuming program runs) — force the transfer NOW with a one-element
    # read so the ~100 MB upload lands before t0, not inside the timed run
    # this mode exists to keep link-free
    np.asarray(staged[0, 0, 0])
    t0 = time.time()
    # slice to the request: a final partial batch (n_images % batch != 0)
    # must get matching leading dims for pixels and traces
    result2 = trace_captioning.evaluate(
        model, ann_path, root, batch_size=batch,
        loader=lambda paths: staged[: len(paths)],
    )
    report("device_resident", result2, time.time() - t0)


if __name__ == "__main__":
    main()
