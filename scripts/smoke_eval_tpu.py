"""TPU smoke: config-driven trace-captioning eval with the fused kernels.

Builds the flagship via the CONFIG path (`Patchioner.from_config` with
`attn_impl: fusedqkv` + `mlp_fused: true` YAML keys — the route a user
takes, unlike bench.py's dataclass override), runs the trace eval pipeline
on synthetic samples, and scores them. Proves the round-2 kernels work
end-to-end behind the public config surface on a real chip.
"""

import json
import sys
import tempfile
import time

import numpy as np
import yaml

from patchioner_tpu.eval import trace_captioning
from patchioner_tpu.models.patchioner import Patchioner

N_IMAGES = 32
BATCH = 16


def main():
    cfg = {
        # mlp.k.yaml flagship schema, shrunk bank for a fast smoke build
        "dino_model": "dinov2_vitb14_reg",
        "prefix_size": 768,
        "support_memory_size": 4096,
        "normalize": True,
        "resize_dim": 518,
        "crop_dim": 518,
        "attn_impl": "fusedqkv",
        "mlp_fused": True,
        "dtype": "bf16",
    }
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(cfg, f)
        cfg_path = f.name
    t0 = time.time()
    model = Patchioner.from_config(cfg_path, allow_missing_weights=True)
    print(json.dumps({"built_s": round(time.time() - t0, 1)}))
    sys.stdout.flush()

    rng = np.random.default_rng(0)
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        ann = {
            f"img{i}.jpg": {
                "captions": [f"synthetic caption {i}"],
                "traces": [[{"x": float(x), "y": float(y), "t": 0.0}
                            for x, y in rng.uniform(0.1, 0.9, (12, 2))]],
            }
            for i in range(N_IMAGES)
        }
        json.dump(ann, f)
        ann_path = f.name

    def loader(paths):
        idx = [int(p.split("img")[-1].split(".")[0]) for p in paths]
        r = np.random.default_rng(42)
        imgs = r.standard_normal((N_IMAGES, 518, 518, 3)).astype(np.float32)
        return imgs[idx]

    t0 = time.time()
    result = trace_captioning.evaluate(
        model, ann_path, image_roots=["/"], batch_size=BATCH, loader=loader
    )
    wall = time.time() - t0
    scores = trace_captioning.compute_scores(result)
    print(json.dumps({
        "n_predictions": len(result["predictions"]),
        "eval_wall_s": round(wall, 1),
        "imgs_per_s": round(N_IMAGES / wall, 2),
        "CIDEr": round(scores.get("CIDEr", -1), 4),
        "sample_pred": result["predictions"][0]["pred"][:60],
    }))


if __name__ == "__main__":
    main()
