"""Real-TPU smoke of the GSPMD mesh dispatch path (VERDICT r4 #6).

`Patchioner.place_on_mesh` and the serving bucket ladder had only ever
executed on the virtual CPU mesh (tests/test_serve_mesh.py); this probe
runs them on the REAL axon backend as a 1-device mesh (dp=1) and pins
caption equality against the unplaced path:

  1. build a small-but-real DINO model (from_config, random init),
  2. caption a batch via the single-device fused path,
  3. place_on_mesh(Mesh(axon_devices, ('dp',))) and re-caption — the
     GSPMD-lowered program must produce IDENTICAL captions,
  4. drive CaptionServer(mesh=...) through warmup + submit on the same
     images — identical captions again.

dp=1 exercises the full NamedSharding/jit-under-mesh dispatch machinery
(state replication, batch sharding constraints, padded-bucket slicing) —
everything except the physical ICI transfer, which no single-host dev
environment can exercise. Result recorded in PERF.md / COMPONENTS.md.

Run: python -m scripts.probe_mesh_tpu
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from jax.sharding import Mesh

    from patchioner_tpu.models.patchioner import Patchioner
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("NOTE: running on CPU — this probe is meant for the axon chip")

    config = {
        "dino_model": "dinov2_vits14",
        "crop_dim": 56,
        "prefix_size": 128,
        "dino_geometry": dict(embed_dim=128, depth=2, num_heads=4,
                              num_registers=0, pos_grid=4, extract_heads=4),
        "decap_arch": dict(n_layer=2, n_head=2, n_embd=128,
                           vocab_size=49408),
        "support_memory_size": 256,
    }
    model = Patchioner.from_config(
        config, allow_missing_weights=True, random_bank_size=256
    )

    rng = np.random.default_rng(0)
    batch = 8
    imgs = rng.integers(0, 255, (batch, 56, 56, 3), np.uint8)
    pts = rng.uniform(0, 1, (batch, 12, 2)).astype(np.float32)
    valid = np.ones((batch, 12), np.float32)

    t0 = time.time()
    single = model.caption_traces_fused(imgs, pts, valid)
    print(f"single-device captions ({time.time() - t0:.1f}s): "
          f"{single[0][:40]!r}")

    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    model.place_on_mesh(mesh)
    t0 = time.time()
    placed = model.caption_traces_fused(imgs, pts, valid)
    print(f"mesh-placed captions ({time.time() - t0:.1f}s)")
    assert placed == single, (
        "mesh-placed captions diverge from single-device:\n"
        f"{placed[:2]} vs {single[:2]}"
    )
    print(f"place_on_mesh OK on {backend}: {batch} captions identical")

    # also a non-divisible batch (pads to dp multiple and slices back)
    odd = model.caption_traces_fused(imgs[:5], pts[:5], valid[:5])
    assert odd == single[:5], "padded-batch mesh captions diverge"
    print("padded (non-divisible) mesh batch OK")

    model.place_on_mesh(None)

    from patchioner_tpu.serve import CaptionServer

    srv = CaptionServer(model, max_batch=8, mesh=mesh)
    srv.warmup(trace=True, buckets=(8,))
    traces = [[{"x": float(x), "y": float(y)} for x, y in p] for p in pts]
    served = srv.caption(list(imgs), traces)
    srv.close()
    assert served == single, (
        f"served captions diverge: {served[:2]} vs {single[:2]}"
    )
    print(f"CaptionServer(mesh) OK on {backend}: bucket ladder + mesh "
          f"dispatch reproduce the single-device captions")
    print("probe_mesh_tpu PASS")


if __name__ == "__main__":
    main()
