"""End-to-end eval pipeline tests with synthetic datasets + tiny model."""

import json

import numpy as np
import pytest

import jax

from patchioner_tpu.eval import (
    dense_captioning,
    harness,
    image_captioning,
    region_set_captioning,
    trace_captioning,
)
from patchioner_tpu.eval.densecap_map import densecap_map, iou_xywh
from patchioner_tpu.eval.runner import ExperimentRunner
from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj


@pytest.fixture(scope="module")
def tiny_model():
    key = jax.random.PRNGKey(0)
    vit_cfg = vit.ViTConfig(
        img_size=56, patch_size=14, embed_dim=128, depth=2, num_heads=4,
        num_registers=4, extract_heads=4, pos_grid=4,
    )
    gcfg = gpt2.GPT2Config(vocab_size=49408, n_layer=2, n_head=4, n_embd=128)
    k1, k2, k3 = jax.random.split(key, 3)
    return Patchioner(
        vit_cfg=vit_cfg,
        vit_params=vit.init_vit(k1, vit_cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k2, gcfg, prefix_size=128),
        bank=memproj.prepare_bank(jax.random.normal(k3, (128, 128))),
        bank_texts=[f"caption {i}" for i in range(128)],
    )


def fake_loader_plain(paths_or_infos):
    rng = np.random.default_rng(0)
    return rng.standard_normal((len(paths_or_infos), 56, 56, 3)).astype(np.float32)


def fake_loader_with_sizes(paths_or_infos):
    return fake_loader_plain(paths_or_infos), [(640, 480)] * len(paths_or_infos)


def test_trace_pipeline(tiny_model, tmp_path):
    ann = {
        "17": {
            "captions": ["a dog", "the sky"],
            "traces": [
                [{"x": 0.1, "y": 0.1}, {"x": 0.2, "y": 0.2}],
                [{"x": 0.9, "y": 0.8}],
            ],
        },
        "42": {"captions": ["a cat"], "traces": [[{"x": 0.5, "y": 0.5}]]},
    }
    p = tmp_path / "trace_capt_coco_test.json"
    p.write_text(json.dumps(ann))
    out = tmp_path / "preds.json"
    result = trace_captioning.evaluate(
        tiny_model, str(p), str(tmp_path), batch_size=2,
        loader=fake_loader_plain, out_path=str(out),
    )
    assert len(result["predictions"]) == 3
    assert result["timing"]["images_per_sec_inference"] > 0
    assert out.exists()
    csv_path = tmp_path / "results.csv"
    scores = trace_captioning.compute_scores(
        result, csv_path=str(csv_path), config_row={"model": "tiny", "task": "trace"},
    )
    assert "CIDEr" in scores and "Bleu_4" in scores
    # dedup: second write is skipped
    assert not harness.append_results_csv(
        str(csv_path), {"model": "tiny", "task": "trace"}, ["model", "task"]
    )


def make_coco_json(tmp_path, with_xyxy_boxes=False):
    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg"},
            {"id": 2, "file_name": "b.jpg"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "caption": "a dog runs",
             "bbox": [10, 10, 50, 60] if with_xyxy_boxes else None},
            {"id": 2, "image_id": 1, "caption": "a brown dog",
             "bbox": [20, 20, 80, 90] if with_xyxy_boxes else None},
            {"id": 3, "image_id": 2, "caption": "the blue sky",
             "bbox": [0, 0, 30, 30] if with_xyxy_boxes else None},
        ],
        "categories": [],
    }
    if not with_xyxy_boxes:
        for a in data["annotations"]:
            a.pop("bbox")
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_image_captioning_pipeline(tiny_model, tmp_path):
    p = make_coco_json(tmp_path)
    for mode in ("cls", "avg_self_attn", "patches"):
        result = image_captioning.evaluate(
            tiny_model, p, str(tmp_path), batch_size=2, caption_from=mode,
            loader=fake_loader_plain,
        )
        assert len(result["predictions"]) == 2
        assert result["predictions"][0]["refs"] == ["a dog runs", "a brown dog"]
    scores = image_captioning.compute_scores(result)
    assert set(scores) >= {"CIDEr", "METEOR", "ROUGE_L"}


def test_dense_captioning_pipeline(tiny_model, tmp_path):
    p = make_coco_json(tmp_path, with_xyxy_boxes=True)
    result = dense_captioning.evaluate(
        tiny_model, p, str(tmp_path), batch_size=2, compute_scores=True,
        loader=fake_loader_with_sizes,
    )
    anns = result["predictions"]["annotations"]
    assert len(anns) == 3  # padded dummy boxes dropped
    assert all("caption" in a and "score" in a for a in anns)
    # mAP on self-matching GT boxes with own captions == upper bound check
    gts = [{"image_id": a["image_id"], "bbox": a["bbox"],
            "caption": a["gt_caption"]} for a in anns]
    preds = [{"image_id": a["image_id"], "bbox": a["bbox"],
              "caption": a["gt_caption"], "score": 1.0} for a in anns]
    out = densecap_map(preds, gts)
    assert abs(out["map"] - 1.0) < 1e-9  # perfect captions + boxes


def test_dense_crop_and_cls_modes(tiny_model, tmp_path):
    from PIL import Image

    p = make_coco_json(tmp_path, with_xyxy_boxes=True)

    def pil_loader(infos):
        rng = np.random.default_rng(1)
        return [
            Image.fromarray(
                (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
            )
            for _ in infos
        ]

    # crop-and-caption baseline (reference eval_densecap.py:429)
    r1 = dense_captioning.evaluate(
        tiny_model, p, str(tmp_path), batch_size=2,
        caption_bboxes_type="cls_capt",
        loader=fake_loader_with_sizes, pil_loader=pil_loader,
    )
    anns1 = r1["predictions"]["annotations"]
    assert len(anns1) == 3 and all(a["caption"] for a in anns1)
    # whole-image cls baseline (reference eval_densecap.py:431-435):
    # every box in an image gets the image's caption
    r2 = dense_captioning.evaluate(
        tiny_model, p, str(tmp_path), batch_size=2, caption_from="cls",
        loader=fake_loader_with_sizes,
    )
    anns2 = r2["predictions"]["annotations"]
    by_img = {}
    for a in anns2:
        by_img.setdefault(a["image_id"], set()).add(a["caption"])
    assert all(len(c) == 1 for c in by_img.values())


def test_region_set_cls_baseline(tiny_model, tmp_path):
    ann = {"7": {"two dogs": [[10, 10, 60, 60]]}}
    p = tmp_path / "regions_cls.json"
    p.write_text(json.dumps(ann))
    r = region_set_captioning.evaluate(
        tiny_model, str(p), str(tmp_path), batch_size=2, caption_from="cls",
        loader=fake_loader_with_sizes,
    )
    assert len(r["predictions"]) == 1 and r["predictions"][0]["pred"]


def test_shipped_grid_configs_resolve():
    """The translated reference experiment grids must parse, use the flat
    reference variant schema (evaluation/configs/*.json: scalar axes at the
    top level of each variant dict, not nested — nesting would collapse the
    runner's CSV row keys and the collector's match criteria), name only
    registered tasks, and carry only keys the task's evaluate() accepts."""
    import inspect
    import os

    from patchioner_tpu.eval import (
        dense_captioning as _dense,
        image_captioning as _image,
        region_set_captioning as _region,
        trace_captioning as _trace,
    )
    from patchioner_tpu.eval.runner import TASK_REGISTRY

    sig = {
        "narratives": _trace, "trace_captioning": _trace,
        "image_captioning": _image, "dense_captioning": _dense,
        "controllable_captioning": _region, "region_set_captioning": _region,
    }
    for name in ("main_table", "backbones_ablations"):
        path = os.path.join("configs", "evaluation", f"{name}.json")
        grid = json.load(open(path))
        assert grid["experiments"], name
        for e in grid["experiments"]:
            assert e.get("model_name") or e.get("model"), name
            for task, settings in e["tasks"].items():
                assert task in TASK_REGISTRY, (name, task)
                params = set(
                    inspect.signature(sig[task].evaluate).parameters
                )
                variants = settings if isinstance(settings, list) else [settings]
                for v in variants:
                    for k, val in v.items():
                        assert not isinstance(val, dict), (name, task, k)
                        assert k in params, (name, task, k)


def test_region_set_pipeline(tiny_model, tmp_path):
    ann = {
        "7": {
            "two dogs playing": [[10, 10, 60, 60], [100, 80, 200, 160]],
            "a tree": [[5, 5, 25, 25]],
        }
    }
    p = tmp_path / "regions.json"
    p.write_text(json.dumps(ann))
    result = region_set_captioning.evaluate(
        tiny_model, str(p), str(tmp_path), batch_size=2,
        loader=fake_loader_with_sizes,
    )
    assert len(result["predictions"]) == 2
    scores = region_set_captioning.compute_scores(result)
    assert "CIDEr" in scores


def test_iou_and_map_thresholds():
    assert iou_xywh([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert iou_xywh([0, 0, 10, 10], [20, 20, 5, 5]) == 0.0
    # Non-overlapping prediction -> mAP 0
    out = densecap_map(
        [{"image_id": 1, "bbox": [50, 50, 5, 5], "caption": "x", "score": 1.0}],
        [{"image_id": 1, "bbox": [0, 0, 10, 10], "caption": "x"}],
    )
    assert out["map"] == 0.0


def test_experiment_runner_grid_and_dedup(tiny_model, tmp_path):
    ann = {"9": {"captions": ["a dog"], "traces": [[{"x": 0.5, "y": 0.5}]]}}
    p = tmp_path / "trace.json"
    p.write_text(json.dumps(ann))
    grid = {
        "global_defaults": {},
        "output_directory": str(tmp_path / "results"),
        "experiments": [
            {
                "model": "tiny",
                "tasks": {
                    "trace_captioning": {
                        "caption_mode": ["trace"],  # grid axis (list)
                        "evaluate": {
                            "annotations_path": str(p),
                            "image_roots": str(tmp_path),
                            "batch_size": 1,
                            "loader": fake_loader_plain,
                        },
                    }
                },
            }
        ],
    }
    runner = ExperimentRunner(grid, model_builder=lambda name, s: tiny_model)
    logs = runner.run()
    assert len(logs) == 1 and "CIDEr" in logs[0]
    # second run skips via the results CSV
    logs2 = ExperimentRunner(grid, model_builder=lambda n, s: tiny_model).run()
    assert logs2 == []


def test_runner_subset_variant_not_dedup_skipped(tmp_path, monkeypatch):
    """A variant whose settings are a SUBSET of an earlier variant's (the
    reference grids' `[{caption_from, use_gaussian_weighting: ""},
    {caption_from}]` pattern) must run and collect as its own row — row
    keys span the union of the task's axes with ''-flag normalization
    (runner.variant_key_settings), so flag-set and flag-absent rows cannot
    collide in the CSV or in the collector's matching."""
    from types import SimpleNamespace

    from patchioner_tpu.eval import runner as runner_mod
    from patchioner_tpu.eval.collect_results import ResultsCollector

    calls = []

    def stub_task(model, variant):
        calls.append(dict(variant))
        # distinct scores per variant so mis-attribution is detectable
        return {"CIDEr": 2.0 if "use_gaussian_weighting" in variant else 1.0}

    monkeypatch.setitem(
        runner_mod.TASK_REGISTRY, "trace_captioning", stub_task
    )
    grid = {
        "global_defaults": {},
        "output_directory": str(tmp_path / "results"),
        "experiments": [
            {"model_name": "tiny",  # reference schema key accepted
             "tasks": {"trace_captioning": [
                 {"caption_from": "patches", "use_gaussian_weighting": ""},
                 {"caption_from": "patches"},
             ]}}
        ],
    }
    model = SimpleNamespace(viecap=None, clipcap=None)
    logs = ExperimentRunner(grid, model_builder=lambda n, s: model).run()
    assert len(calls) == 2 and len(logs) == 2
    # dedup still works: a second run skips BOTH rows
    logs2 = ExperimentRunner(grid, model_builder=lambda n, s: model).run()
    assert logs2 == [] and len(calls) == 2

    grid_path = tmp_path / "grid.json"
    grid_path.write_text(json.dumps(grid))
    results = ResultsCollector(grid["output_directory"]).collect_from_config(
        str(grid_path)
    )
    rows = results["trace_captioning"]
    assert [r["found"] for r in rows] == [True, True]
    # trace_captioning is not x100-scaled (TASK_SCORE_COLUMNS default)
    assert [float(r["CIDEr"]) for r in rows] == [2.0, 1.0]


def test_runner_fails_fast_on_fallback_tokenizer(tmp_path, monkeypatch):
    """VERDICT r3 #5: a grid run must not silently produce CSVs when GPT-2
    captions would come from the whitespace fallback tokenizer."""
    from types import SimpleNamespace

    from patchioner_tpu.eval import runner as runner_mod
    from patchioner_tpu.models import patchioner as pmod

    fallback_model = SimpleNamespace(
        viecap=SimpleNamespace(tokenizer=pmod._FallbackWordTokenizer()),
        clipcap=None,
    )
    clean_model = SimpleNamespace(viecap=None, clipcap=None)
    assert pmod.uses_fallback_tokenizer(fallback_model)
    assert not pmod.uses_fallback_tokenizer(clean_model)
    with pytest.raises(RuntimeError, match="GPT2_BPE_DIR"):
        pmod.require_parity_tokenizer(fallback_model, False, "ctx")
    pmod.require_parity_tokenizer(fallback_model, True, "ctx")  # explicit ok
    pmod.require_parity_tokenizer(clean_model, False, "ctx")

    ran = []
    monkeypatch.setitem(
        runner_mod.TASK_REGISTRY, "trace_captioning",
        lambda model, variant: ran.append(1) or {"CIDEr": 1.0},
    )
    grid = {
        "global_defaults": {},
        "output_directory": str(tmp_path / "results"),
        "experiments": [
            {"model": "tiny",
             "tasks": {"trace_captioning": [{"caption_mode": "trace"}]}}
        ],
    }
    with pytest.raises(RuntimeError, match="GPT2_BPE_DIR"):
        ExperimentRunner(
            grid, model_builder=lambda n, s: fallback_model
        ).run()
    assert ran == []  # failed fast: no task executed, no CSV row written
    logs = ExperimentRunner(
        grid, model_builder=lambda n, s: fallback_model,
        allow_tokenizer_fallback=True,
    ).run()
    assert ran == [1] and len(logs) == 1


def test_xla_flops(tiny_model):
    import jax.numpy as jnp

    f = harness.xla_flops(lambda x: x @ x, jnp.ones((64, 64)))
    assert f is None or f >= 2 * 64 * 64 * 64 * 0.5


def test_drawing_annotations():
    """Reference-image rendering for CLIP-S/PAC-S (compute_scores.py:24-49,
    bbox_utils.py:253-298): trace dots alpha-composited, boxes outlined."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from patchioner_tpu.utils import drawing

    img = Image.new("RGB", (100, 80), (0, 255, 0))
    out = drawing.draw_trace_points(
        img, [{"x": 0.5, "y": 0.5}, (0.1, 0.1), (2.0, 0.5)]  # last skipped
    )
    assert out.size == img.size and out.mode == "RGB"
    # dot center at (50, 40): alpha-blended red over green
    r, g, b = out.getpixel((50, 40))
    assert r > 100 and g < 255
    # untouched corner stays green
    assert out.getpixel((99, 79)) == (0, 255, 0)
    # original unmodified
    assert img.getpixel((50, 40)) == (0, 255, 0)

    out2 = drawing.draw_bounding_boxes(
        img, [[10, 10, 60, 50]], captions=["label"]
    )
    assert out2.getpixel((10, 30)) != (0, 255, 0)  # box edge drawn
    assert out2.getpixel((35, 30)) == (0, 255, 0)  # interior untouched
    assert img.getpixel((10, 30)) == (0, 255, 0)


def test_cached_image_features(tmp_path):
    """HDF5 CLIP-S feature cache: misses encoded once, hits read back
    (reference compute_scores.py:166-256)."""
    h5py = pytest.importorskip("h5py")
    import jax

    from patchioner_tpu.eval import pac_score as ps
    from patchioner_tpu.models import clip as clip_mod

    vc = clip_mod.ClipVisionConfig(img_size=32, patch_size=16, width=64,
                                   depth=2, heads=4, proj_dim=48)
    tc = clip_mod.ClipTextConfig(width=64, depth=2, heads=4, proj_dim=48)
    vp = clip_mod.init_clip_vision(jax.random.PRNGKey(0), vc)
    tp = clip_mod.init_clip_text(jax.random.PRNGKey(1), tc)
    scorer = ps.ClipScorer(vp, tp, vc, tc)
    rng = np.random.default_rng(0)
    pix = {f"im{i}": rng.standard_normal((32, 32, 3)).astype("float32")
           for i in range(4)}
    calls = []

    def load(ids):
        calls.extend(ids)
        return np.stack([pix[i] for i in ids])

    cache = str(tmp_path / "c.h5")
    a = ps.cached_image_features(scorer, list(pix), load, cache_path=cache)
    assert len(calls) == 4
    b = ps.cached_image_features(scorer, list(pix), load, cache_path=cache)
    assert len(calls) == 4  # all hits second time
    np.testing.assert_allclose(a, b)
    # partial miss: one new id re-encodes only that id
    pix["im9"] = rng.standard_normal((32, 32, 3)).astype("float32")
    ps.cached_image_features(scorer, list(pix), load, cache_path=cache)
    assert calls.count("im9") == 1 and len(calls) == 5


def test_merge_annotation_parts(tmp_path):
    """Split-annotation merge (reference coco_data_merge_parts.py:
    {**part1, **part2}; later parts win on duplicate ids) + list input to
    load_trace_dataset."""
    p1 = tmp_path / "coco_data_part1.json"
    p2 = tmp_path / "coco_data_part2.json"
    t = [[{"x": 0.5, "y": 0.5}]]
    p1.write_text(json.dumps({
        "1": {"captions": ["a"], "traces": t},
        "2": {"captions": ["old"], "traces": t},
    }))
    p2.write_text(json.dumps({
        "2": {"captions": ["new"], "traces": t},
        "3": {"captions": ["c"], "traces": t},
    }))
    out = tmp_path / "trace_capt_coco_test.json"
    merged = trace_captioning.merge_annotation_parts(
        [str(p1), str(p2)], out_path=str(out)
    )
    assert set(merged) == {"1", "2", "3"}
    assert merged["2"]["captions"] == ["new"]
    assert json.loads(out.read_text()) == merged
    ds = trace_captioning.load_trace_dataset(
        [str(p1), str(p2)], str(tmp_path)
    )
    assert sorted(ds["gt_captions"]) == ["a", "c", "new"]


def test_dense_fused_path_matches_forward_path(tiny_model, tmp_path):
    """The dense eval's fused single-dispatch branch (compute_scores=False)
    must emit the same captions as the forward(bboxes=...) branch
    (compute_scores=True), including run-max dummy-box padding."""
    p = make_coco_json(tmp_path, with_xyxy_boxes=True)
    assert tiny_model.supports_fused_trace_path()
    kw = dict(batch_size=2, loader=fake_loader_with_sizes)
    fused = dense_captioning.evaluate(
        tiny_model, p, str(tmp_path), compute_scores=False, **kw
    )["predictions"]["annotations"]
    ref = dense_captioning.evaluate(
        tiny_model, p, str(tmp_path), compute_scores=True, **kw
    )["predictions"]["annotations"]
    assert [(a["image_id"], a["caption"]) for a in fused] == [
        (a["image_id"], a["caption"]) for a in ref
    ]


def test_region_set_and_image_fused_match_forward_branch(
        tiny_model, tmp_path, monkeypatch):
    """The region-set and image evals' fused single-dispatch branches must
    emit the same predictions as their forward(...) branches (gate forced
    off via supports_fused_trace_path)."""
    ann = {"7": {"two dogs": [[10, 10, 60, 60], [100, 80, 200, 160]],
                 "a tree": [[5, 5, 25, 25]]}}
    p = tmp_path / "regions.json"
    p.write_text(json.dumps(ann))
    kw = dict(batch_size=2, loader=fake_loader_with_sizes)
    fused = region_set_captioning.evaluate(tiny_model, str(p),
                                           str(tmp_path), **kw)
    cj = make_coco_json(tmp_path)
    fused_img = image_captioning.evaluate(
        tiny_model, cj, str(tmp_path), batch_size=2, loader=fake_loader_plain
    )
    monkeypatch.setattr(type(tiny_model), "supports_fused_trace_path",
                        lambda self: False)
    ref = region_set_captioning.evaluate(tiny_model, str(p),
                                         str(tmp_path), **kw)
    ref_img = image_captioning.evaluate(
        tiny_model, cj, str(tmp_path), batch_size=2, loader=fake_loader_plain
    )
    assert ([r["pred"] for r in fused["predictions"]]
            == [r["pred"] for r in ref["predictions"]])
    assert ([r["pred"] for r in fused_img["predictions"]]
            == [r["pred"] for r in ref_img["predictions"]])


def test_runner_variant_axes_reach_evaluate(tiny_model, tmp_path, monkeypatch):
    """Grid-expanded variant axes live at the TOP level of the task dict
    (run_tasks.py:179-223) — each variant must actually change the
    evaluate() call, not just the CSV row key."""
    from patchioner_tpu.eval import image_captioning

    p = make_coco_json(tmp_path)
    seen = []
    orig = image_captioning.evaluate
    import functools

    @functools.wraps(orig)  # keep the signature: the runner merges
    def spy(model, *a, **kw):  # top-level keys by inspecting it
        seen.append(kw.get("caption_from"))
        return orig(model, *a, **kw)

    monkeypatch.setattr(image_captioning, "evaluate", spy)
    grid = {
        "output_directory": str(tmp_path / "res"),
        "experiments": [{
            "model": "tiny",
            "tasks": {"image_captioning": {
                "caption_from": ["cls", "avg_self_attn"],  # grid axis
                "evaluate": {
                    "annotations_path": p,
                    "image_roots": str(tmp_path),
                    "batch_size": 2,
                    "loader": fake_loader_plain,
                },
            }},
        }],
    }
    logs = ExperimentRunner(grid, model_builder=lambda n, s: tiny_model).run()
    assert len(logs) == 2
    assert seen == ["cls", "avg_self_attn"]


def test_from_config_clipcap_transformer_random_init(monkeypatch):
    """allow_missing_weights + mapping_type='transformer' must random-init
    the TRANSFORMER mapper layout (the MLP layout KeyErrors inside
    mapping_network_forward on first use)."""
    import jax.numpy as jnp

    from patchioner_tpu.models import vit

    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    m = Patchioner.from_config(
        {
            "prefix_size": 512,
            "support_memory_size": 0,
            "dino_model": "dinov2_vitb14_reg",
            "crop_dim": 56,
            "normalize": True,
            "projection_type": "coco",
            "clipcap": {"mapping_type": "transformer", "prefix_length": 4,
                        "clip_length": 4, "num_layers": 1},
        },
        allow_missing_weights=True,
    )
    # ClipCap consumes the BACKBONE dim (768 for vitb), not prefix_size
    soft = m.clipcap._project(
        jnp.ones((2, 768), jnp.float32) / 768**0.5)
    assert soft.shape == (2, 4, m.clipcap.gpt2_cfg.n_embd)
    assert np.isfinite(np.asarray(soft)).all()
