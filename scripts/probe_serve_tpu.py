"""TPU smoke: the dynamic-batching caption server at flagship scale.

Functional proof that `serve.CaptionServer` works against the real chip —
bucket warmup (hits the persistent compile cache when the eval-throughput
experiment ran first), coalescing of concurrent client threads, caption
delivery — plus a per-burst timing. NOTE on the number: requests carry
host pixels, so on this dev environment each 128-batch ships ~103 MB of
uint8 over the ~10-55 MB/s tunnel — the measured rate is the LINK, not
the serving layer (PERF.md "Serving layer": machinery is ~30 ms/batch,
device step 331 ms; on a real TPU VM the same bytes cross PCIe in ~7 ms).

Usage: python -m scripts.probe_serve_tpu [bursts] [batch]
"""

import os as _os
import sys as _sys

# run as `python scripts/<probe>.py` OR `python -m scripts.<probe>`: put the
# repo root on sys.path BEFORE any patchioner_tpu import (the old fallback
# sat below the package imports and could never fire)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import threading
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.serve import CaptionServer
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    bursts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    on_tpu = jax.default_backend() not in ("cpu",)
    dim = 518 if on_tpu else 140
    config = {
        "dino_model": "dinov2_vitb14_reg",
        "resize_dim": dim, "crop_dim": dim,
        "prefix_size": 768, "normalize": True,
        "projection_type": "coco",
        "support_memory_size": 591753 if on_tpu else 2048,
    }
    if on_tpu:
        config.update({"attn_impl": "fusedqkv", "mlp_fused": True,
                       "qkv_fused": True})
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": batch, "bursts": bursts}))
    sys.stdout.flush()
    t0 = time.time()
    model = Patchioner.from_config(
        config, rng_seed=0, allow_missing_weights=True,
        random_bank_size=config["support_memory_size"],
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    print(json.dumps({"model_built_s": round(time.time() - t0, 1)}))
    sys.stdout.flush()

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (dim, dim, 3), np.uint8)
    trace = [(float(x), 0.5) for x in np.linspace(0.1, 0.9, 8)]

    with CaptionServer(model, max_batch=batch, max_delay_ms=200,
                       trace_points=32, preprocess=False) as srv:
        t0 = time.time()
        srv.warmup(trace=True, buckets=[batch])
        print(json.dumps({"warmup_s": round(time.time() - t0, 1)}))
        sys.stdout.flush()

        for bi in range(bursts):
            t0 = time.time()
            futs = []
            lock = threading.Lock()

            def client(k=32):
                fs = [srv.submit(img, trace) for _ in range(k)]
                with lock:
                    futs.extend(fs)

            threads = [threading.Thread(target=client)
                       for _ in range(batch // 32)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            caps = [f.result(timeout=1800) for f in futs]
            dt = time.time() - t0
            assert len(caps) == batch and all(isinstance(c, str) for c in caps)
            print(json.dumps({
                "burst": bi, "wall_s": round(dt, 2),
                "captions_per_s": round(batch / dt, 1),
                "batches_so_far": srv.stats.batches,
                "mean_batch": round(srv.stats.mean_batch_size, 1),
            }))
            sys.stdout.flush()
        print(json.dumps({"caption_example": caps[0][:60],
                          "errors": srv.stats.errors}))
        sys.stdout.flush()

        # bbox request mode: one smaller burst through the fused dense
        # program (per-box caption lists; warmup compiles the bucket)
        bb_batch = min(batch, 32)
        t0 = time.time()
        srv.warmup(trace=False, bbox=True, buckets=[bb_batch])
        print(json.dumps({"bbox_warmup_s": round(time.time() - t0, 1)}))
        sys.stdout.flush()
        boxes = [(0.1, 0.1, 0.6, 0.6), (0.3, 0.3, 0.9, 0.9)]
        t0 = time.time()
        futs = [srv.submit(img, bboxes=boxes) for _ in range(bb_batch)]
        rows = [f.result(timeout=1800) for f in futs]
        dt = time.time() - t0
        assert all(len(r) == len(boxes) for r in rows)
        print(json.dumps({
            "bbox_burst_wall_s": round(dt, 2),
            "box_captions_per_s": round(bb_batch * len(boxes) / dt, 1),
            "bbox_caption_example": rows[0][0][:50],
            "errors": srv.stats.errors,
        }))


if __name__ == "__main__":
    main()
