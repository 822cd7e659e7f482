"""End-to-end coverage for the per-task eval CLI (eval/run_task.py) — the
equivalent of the reference's four `eval-*/eval_*.py` argparse scripts.

Unlike test_eval_pipelines (which injects fake loaders), these run the REAL
path: argparse -> from_config -> real JPEG loading -> evaluate -> scores ->
CSV, at tiny shapes (depth-2 ViT-B @56px, seeded random weights).
"""

import json

import numpy as np
import pytest
import yaml

from patchioner_tpu.eval import run_task


@pytest.fixture()
def tiny_config(tmp_path, monkeypatch):
    from patchioner_tpu.models import vit

    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    cfg = {
        "decap_weights": "/nonexistent/decap.pt",
        "prefix_size": 768,
        "support_memory_size": 16,
        "dino_model": "dinov2_vitb14_reg",
        "crop_dim": 56,
        "normalize": True,
        "projection_type": "coco",
    }
    p = tmp_path / "model.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _write_jpegs(dirpath, names):
    from PIL import Image

    rng = np.random.default_rng(0)
    dirpath.mkdir(exist_ok=True)
    for name in names:
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        ).save(dirpath / name)
    return str(dirpath)


def _run(argv, capsys):
    run_task.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_trace_task_cli(tiny_config, tmp_path, capsys):
    imgs = _write_jpegs(tmp_path / "imgs", ["17.jpg", "42.jpg"])
    ann = {
        "17": {"captions": ["a dog", "the sky"],
               "traces": [[{"x": 0.1, "y": 0.1}, {"x": 0.3, "y": 0.2}],
                          [{"x": 0.8, "y": 0.8}]]},
        "42": {"captions": ["a cat"], "traces": [[{"x": 0.5, "y": 0.5}]]},
    }
    ann_path = tmp_path / "trace_capt_test.json"
    ann_path.write_text(json.dumps(ann))
    preds = tmp_path / "preds.json"
    csv = tmp_path / "results.csv"
    got = _run([
        "trace", "--config", tiny_config, "--annotations", str(ann_path),
        "--images", imgs, "--batch-size", "2", "--out", str(preds),
        "--csv", str(csv), "--allow-missing-weights",
    ], capsys)
    assert got["task"] == "trace"
    assert "CIDEr" in got["scores"] and "Bleu_4" in got["scores"]
    assert preds.exists() and csv.exists()
    assert len(json.load(open(preds))) == 3


def test_image_task_cli(tiny_config, tmp_path, capsys):
    imgs = _write_jpegs(tmp_path / "imgs", ["a.jpg", "b.jpg"])
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "caption": "a dog runs"},
            {"id": 2, "image_id": 1, "caption": "a brown dog"},
            {"id": 3, "image_id": 2, "caption": "the blue sky"},
        ],
        "categories": [],
    }
    ann_path = tmp_path / "coco.json"
    ann_path.write_text(json.dumps(coco))
    got = _run([
        "image", "--config", tiny_config, "--annotations", str(ann_path),
        "--images", imgs, "--batch-size", "2", "--caption-from",
        "avg_self_attn", "--allow-missing-weights",
    ], capsys)
    assert got["task"] == "image" and "CIDEr" in got["scores"]
    assert got["timing"]["images_per_sec_inference"] > 0


def test_dense_task_cli(tiny_config, tmp_path, capsys):
    imgs = _write_jpegs(tmp_path / "imgs", ["a.jpg", "b.jpg"])
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "caption": "a dog runs",
             "bbox": [10, 10, 50, 60]},
            {"id": 2, "image_id": 1, "caption": "a brown dog",
             "bbox": [20, 20, 60, 60]},
            {"id": 3, "image_id": 2, "caption": "the blue sky",
             "bbox": [0, 0, 30, 30]},
        ],
        "categories": [],
    }
    ann_path = tmp_path / "dense.json"
    ann_path.write_text(json.dumps(coco))
    got = _run([
        "dense", "--config", tiny_config, "--annotations", str(ann_path),
        "--images", imgs, "--batch-size", "2", "--gaussian",
        "--allow-missing-weights",
    ], capsys)
    assert got["task"] == "dense"
    # run_task reports the reference CSV column name (map_score)
    assert 0.0 <= float(got["scores"]["map_score"]) <= 1.0


def test_region_set_task_cli(tiny_config, tmp_path, capsys):
    imgs = _write_jpegs(tmp_path / "imgs", ["7.jpg"])
    ann = {"7": {"two dogs playing": [[10, 10, 40, 40], [30, 30, 56, 56]]}}
    ann_path = tmp_path / "regions.json"
    ann_path.write_text(json.dumps(ann))
    got = _run([
        "region_set", "--config", tiny_config, "--annotations",
        str(ann_path), "--images", imgs, "--limit", "1",
        "--allow-missing-weights",
    ], capsys)
    assert got["task"] == "region_set" and "CIDEr" in got["scores"]
