"""Full-grid report rehearsal regeneration (VERDICT r3 #6).

`reports/grid_rehearsal_main_table.md` is the committed artifact proving
the reference's paper-table pipeline (grid -> runner -> per-task CSVs ->
collector -> markdown + LaTeX with variant markers) composes at full
main_table scale (52 rows, 14 models, 4 tasks). This test regenerates a
slice of it — four models spanning the DeCap / ViECap / MeaCap decoder
families and all four tasks — and asserts every produced table row appears
verbatim in the committed report: seeds and pixels are keyed per model
name / image path, so a slice reproduces the full run's rows bit-for-bit.

Regenerate the full artifact with:
    python -m scripts.grid_report_rehearsal /tmp/grid_rehearsal
    cp /tmp/grid_rehearsal/report.md reports/grid_rehearsal_main_table.md
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "reports", "grid_rehearsal_main_table.md")

SLICE_MODELS = {
    "regionclip_resnet50x4_p32.k",  # cls-only rows
    "mlp.karpathy",                 # full variant fan (gaussian axes)
    "mlp.viecap.k",                 # ViECap delegated decode
    "meacap_invlm.k",               # MeaCap delegated decode
}


def test_rehearsal_slice_matches_committed_report(tmp_path):
    sys.path.insert(0, REPO)
    from scripts.grid_report_rehearsal import run_rehearsal

    report = run_rehearsal(str(tmp_path), models=SLICE_MODELS)
    with open(ARTIFACT) as f:
        committed = f.read()
    committed_lines = set(committed.splitlines())
    # every rendered data row of the slice (markdown table rows and LaTeX
    # body lines carrying a model cell) must exist verbatim in the full
    # committed report
    checked = 0
    for line in report.splitlines():
        is_md_row = line.startswith("|") and not set(line) <= {"|", "-", " "}
        is_tex_row = line.endswith(r" \\") and "&" in line
        if not (is_md_row or is_tex_row):
            continue
        if is_md_row and (line.startswith("| model") or "---" in line):
            continue  # headers are structural, not data
        assert line in committed_lines, f"row not in committed report: {line}"
        checked += 1
    assert checked >= 30, checked  # the slice renders a substantial table

    # and the slice executed every one of its variants (no dedup skips)
    import json

    from patchioner_tpu.eval.collect_results import expand_grid

    with open(os.path.join(tmp_path, "grid_slice.json")) as f:
        grid = json.load(f)
    # enumerate variants EXACTLY as the runner does (list as-is,
    # dict-of-lists through the cartesian expansion)
    expected = sum(
        len(s) if isinstance(s, list) else len(list(expand_grid(s or {})))
        for e in grid["experiments"] for s in e["tasks"].values()
    )
    n_csv_rows = 0
    results_dir = os.path.join(tmp_path, "results")
    for name in os.listdir(results_dir):
        with open(os.path.join(results_dir, name)) as f:
            n_csv_rows += max(0, len(f.read().splitlines()) - 1)
    assert n_csv_rows == expected, (n_csv_rows, expected)
