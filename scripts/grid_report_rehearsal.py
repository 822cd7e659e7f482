"""Full-grid report rehearsal (VERDICT r3 #6).

Runs the translated reference `main_table` grid END TO END in-process on
CPU: 14 seeded tiny models (DeCap / ViECap / MeaCap families matching the
grid's model names) x 4 tasks x all variant axes through
`eval.runner.ExperimentRunner` -> per-task CSVs ->
`eval.collect_results.ResultsCollector.collect_from_config` ->
summary + markdown + LaTeX tables with variant markers. One committed
artifact (`reports/grid_rehearsal_main_table.md`) proves the reference's
paper-table pipeline (evaluation/run_tasks.py:81-893 ->
evaluation/collect_results.py:77-630) composes at grid scale;
`tests/test_grid_report_rehearsal.py` regenerates it.

Scores are random-init gibberish by design — the artifact checks the
PLUMBING (variant expansion, CSV keying, dedup, collection matching,
marker columns, table rendering), not caption quality. Synthetic pixels
come from a deterministic loader keyed on the image path, so the whole
report is reproducible byte-for-byte on CPU.

Usage: python -m scripts.grid_report_rehearsal [out_dir]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import zlib

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
GRID = os.path.join(REPO, "configs", "evaluation", "main_table.json")


def deterministic_loader(paths_or_infos):
    """Pixels keyed on each path string -> identical across runs and
    independent of batch composition."""
    import numpy as np

    out = []
    for p in paths_or_infos:
        key = zlib.crc32(str(p).encode()) & 0xFFFFFFFF
        rng = np.random.default_rng(key)
        out.append(rng.standard_normal((56, 56, 3)).astype(np.float32))
    return np.stack(out)


def loader_with_sizes(paths_or_infos):
    return deterministic_loader(paths_or_infos), [(640, 480)] * len(
        paths_or_infos
    )


def stage_data(workdir: str) -> dict:
    """Synthetic annotations for all four tasks; returns per-task evaluate
    kwargs to inject into every grid variant."""
    import numpy as np
    from PIL import Image

    os.makedirs(workdir, exist_ok=True)
    # real (tiny) JPEGs: the dense-captioning crop mode opens files with
    # PIL regardless of the injected pixel loader
    for stem in ("a", "b", "1", "2"):
        path = os.path.join(workdir, f"{stem}.jpg")
        if not os.path.exists(path):
            rng = np.random.default_rng(zlib.crc32(stem.encode()))
            Image.fromarray(
                rng.integers(0, 255, (56, 56, 3), np.uint8)
            ).save(path, quality=90)
    trace = {
        "1": {"captions": ["a dog runs in the park"],
              "traces": [[{"x": 0.3, "y": 0.4}, {"x": 0.6, "y": 0.5}]]},
        "2": {"captions": ["the blue sky above"],
              "traces": [[{"x": 0.5, "y": 0.2}, {"x": 0.7, "y": 0.7}]]},
    }
    trace_path = os.path.join(workdir, "trace.json")
    with open(trace_path, "w") as f:
        json.dump(trace, f)

    coco = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"id": 1, "image_id": 1, "caption": "a dog runs",
             "bbox": [10, 10, 50, 60]},
            {"id": 2, "image_id": 1, "caption": "a brown dog",
             "bbox": [20, 20, 80, 90]},
            {"id": 3, "image_id": 2, "caption": "the blue sky",
             "bbox": [5, 5, 40, 40]},
        ],
        "categories": [],
    }
    coco_path = os.path.join(workdir, "coco.json")
    with open(coco_path, "w") as f:
        json.dump(coco, f)

    regions = {
        "1": {"two dogs": [[10, 10, 60, 60], [100, 80, 200, 160]],
              "a tree": [[5, 5, 25, 25]]},
        "2": {"the sky": [[0, 0, 300, 100]]},
    }
    region_path = os.path.join(workdir, "regions.json")
    with open(region_path, "w") as f:
        json.dump(regions, f)

    common = {"image_roots": workdir, "batch_size": 2}
    return {
        "narratives": {**common, "annotations_path": trace_path,
                       "loader": deterministic_loader},
        "image_captioning": {**common, "annotations_path": coco_path,
                             "loader": deterministic_loader},
        "dense_captioning": {**common, "annotations_path": coco_path,
                             "loader": loader_with_sizes},
        "controllable_captioning": {**common, "annotations_path": region_path,
                                    "loader": loader_with_sizes},
    }


def build_tiny_model(name: str, settings=None):
    """Seeded tiny Patchioner for a grid model name; ViECap/MeaCap names get
    the matching decoder family so their grid rows exercise the delegated
    decode path (whitespace tokenizer — the rehearsal passes
    allow_tokenizer_fallback=True, scores are plumbing-only)."""
    import jax
    import numpy as np

    from patchioner_tpu.models import decap, gpt2, vit
    from patchioner_tpu.models.patchioner import (
        Patchioner, _FallbackWordTokenizer,
    )
    from patchioner_tpu.ops import memory_projection as memproj

    seed = zlib.crc32(name.encode()) & 0x7FFFFFFF
    key = jax.random.PRNGKey(seed)
    vit_cfg = vit.ViTConfig(
        img_size=56, patch_size=14, embed_dim=128, depth=2, num_heads=4,
        num_registers=4, extract_heads=4, pos_grid=4,
    )
    gcfg = gpt2.GPT2Config(vocab_size=49408, n_layer=2, n_head=4, n_embd=128)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    viecap = None
    if "viecap" in name or "meacap" in name:
        from patchioner_tpu.models import meacap as meacap_mod
        from patchioner_tpu.models import viecap as viecap_mod

        vcfg = viecap_mod.ViecapConfig(
            continuous_prompt_length=2, clip_project_length=2,
            clip_hidden_size=128, num_layers=1, num_heads=2,
            using_hard_prompt=True, using_greedy_search=True, top_k=2,
            threshold=0.0, max_len=6,
        )
        vg = gpt2.GPT2Config(vocab_size=512, n_layer=1, n_head=2, n_embd=32)
        vg_params = gpt2.init_gpt2(k4, vg)
        mapping = viecap_mod.init_mapping_network(k5, vcfg, vg.n_embd)
        tok = _FallbackWordTokenizer()
        for w in [".", "dog", "sky", "tree", "park", "a", "the"]:
            tok.encode(w)
        rng = np.random.default_rng(seed)
        if "meacap" in name:
            viecap = meacap_mod.MeaCap(
                vcfg, vg, vg_params, mapping,
                memory_captions=["a dog runs", "the blue sky", "a tall tree"],
                memory_clip_embeddings=rng.standard_normal(
                    (3, 128)).astype(np.float32),
                tokenizer=tok, memory_caption_num=2,
            )
        else:
            viecap = viecap_mod.VieCap(
                vcfg, vg, vg_params, mapping,
                entities=["dog", "sky", "tree"],
                texts_embeddings=rng.standard_normal(
                    (3, 128)).astype(np.float32),
                tokenizer=tok,
            )
    return Patchioner(
        vit_cfg=vit_cfg,
        vit_params=vit.init_vit(k1, vit_cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k2, gcfg, prefix_size=128),
        bank=memproj.prepare_bank(jax.random.normal(k3, (128, 128))),
        bank_texts=[f"caption {i}" for i in range(128)],
        viecap=viecap,
    )


def run_rehearsal(out_dir: str, grid_path: str = GRID, models=None,
                  model_builder=None, data_overrides=None, tasks=None,
                  header_note: str = "") -> str:
    """Grid -> CSVs -> collected report. Returns the report markdown.

    `models`: optional model-name subset — the regeneration test slices the
    grid to a few representative models (runs in minutes, produces rows
    byte-identical to the full committed report since pixels/seeds are
    keyed per name/path, not per run order).

    `model_builder` / `data_overrides` / `tasks`: override hooks for the
    TRAINED rehearsal slice (scripts/convergence_proof.py): a real trained
    model + real on-disk data drive the same grid->CSV->collector->table
    pipeline, producing non-zero discriminative cells where the committed
    random-init rehearsal scores 0.0 by design. `data_overrides` maps
    task -> evaluate-kwarg dict replacing the synthetic stage_data block;
    `tasks` restricts each experiment to the named tasks."""
    from patchioner_tpu.eval.collect_results import (
        ResultsCollector, format_rows_with_std, latex_table,
    )
    from patchioner_tpu.eval.runner import ExperimentRunner

    with open(grid_path) as f:
        grid = json.load(f)
    if models is not None:
        grid["experiments"] = [
            e for e in grid["experiments"]
            if (e.get("model_name") or e.get("model")) in models
        ]
    if tasks is not None:
        for e in grid["experiments"]:
            e["tasks"] = {t: s for t, s in e["tasks"].items() if t in tasks}
    if models is not None or tasks is not None:
        # the collector re-reads the grid file for its variant enumeration
        sliced = os.path.join(out_dir, "grid_slice.json")
        os.makedirs(out_dir, exist_ok=True)
        with open(sliced, "w") as f:
            json.dump(grid, f)
        grid_path = sliced
    data_kwargs = stage_data(os.path.join(out_dir, "data"))
    if data_overrides:
        data_kwargs = {**data_kwargs, **data_overrides}
    grid["output_directory"] = os.path.join(out_dir, "results")
    # inject the synthetic data as a nested evaluate block per variant —
    # dict-valued settings stay OUT of the CSV row key and the collector's
    # match criteria, exactly like operational paths should
    for exp in grid["experiments"]:
        for task, settings in exp["tasks"].items():
            variants = settings if isinstance(settings, list) else [settings]
            for v in variants:
                v["evaluate"] = dict(data_kwargs[task])
    runner = ExperimentRunner(
        grid,
        model_builder=model_builder
        or (lambda name, s: build_tiny_model(name, s)),
        allow_tokenizer_fallback=True,  # whitespace tok; plumbing-only run
    )
    logs = runner.run()

    collector = ResultsCollector(grid["output_directory"])
    results = collector.collect_from_config(grid_path)
    grid_name = os.path.splitext(os.path.basename(grid_path))[0]
    lines = [
        f"# Grid report rehearsal — {grid_name}",
        "",
        (header_note or (
            "Generated by `scripts/grid_report_rehearsal.py` (seeded tiny "
            "models, synthetic data, CPU). Scores are random-init "
            "gibberish; this artifact proves the grid -> CSV -> collector "
            "-> table pipeline composes at full grid scale"
        )) + f" ({sum(1 for _ in logs)} rows executed).",
        "",
        "```",
        collector.summary_report(results),
        "```",
        "",
    ]
    for task in results:
        lines += [f"## {task}", "", collector.markdown(task), ""]
        dense = task == "dense_captioning"
        rows = format_rows_with_std(results[task], is_dense_capt=dense)
        cols = list(rows[0].keys()) if rows else []
        lines += ["### collected (reference layout, v±s cells)", ""]
        lines.append("| " + " | ".join(cols) + " |")
        lines.append("|" + "|".join("---" for _ in cols) + "|")
        for r in rows:
            lines.append(
                "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |"
            )
        lines += ["", "### LaTeX (paper table)", "", "```latex",
                  latex_table(results[task], is_dense_capt=dense), "```", ""]
    report = "\n".join(lines)
    with open(os.path.join(out_dir, "report.md"), "w") as f:
        f.write(report)
    return report


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/grid_rehearsal"
    report = run_rehearsal(out_dir)
    print(report[:2000])
    print(f"... report written to {os.path.join(out_dir, 'report.md')}")


if __name__ == "__main__":
    main()
