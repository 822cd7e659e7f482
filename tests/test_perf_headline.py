"""Docs-vs-artifact headline consistency (VERDICT r4 #3).

Three rounds running, the driver's round-end BENCH artifact landed after
the docs were written and the headline numbers drifted (389.4/1.744 in
the docs vs 389.912/1.755 in BENCH_r04.json). These tests make the
restate-after-driver convention self-enforcing: whichever BENCH_r*.json
is newest in the tree is THE headline, and README/PERF/CLAUDE must quote
it. They also pin the closed-form roofline cross-check that ends the
baseline-revision series (PERF.md "Baseline roofline consistency").
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_bench():
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        pytest.skip("no BENCH_r*.json artifacts in the tree")
    with open(paths[-1]) as f:
        rec = json.load(f)
    parsed = rec.get("parsed") or {}
    if not parsed.get("value"):
        pytest.skip(f"{paths[-1]} has no parsed bench record")
    return paths[-1], parsed


def test_docs_quote_newest_bench_artifact():
    path, parsed = _newest_bench()
    value, ratio = parsed["value"], parsed.get("vs_baseline")
    # the headline as the docs should round it: one decimal for captions/s,
    # the ratio verbatim to three decimals
    value_str = f"{value:.1f}"
    ratio_str = None if ratio is None else f"{ratio:g}"
    for doc in ("README.md", "PERF.md", "CLAUDE.md"):
        text = open(os.path.join(REPO, doc)).read()
        assert value_str in text, (
            f"{doc} does not quote the newest bench artifact's "
            f"{value_str} captions/s ({os.path.basename(path)}); restate "
            f"the headline after every driver run"
        )
        if ratio_str is not None:
            assert ratio_str in text, (
                f"{doc} does not quote vs_baseline {ratio_str} from "
                f"{os.path.basename(path)}"
            )


def test_baseline_inside_roofline_band():
    """The floor-corrected baseline must stay inside the physics band —
    the condition under which no further measurement revision is
    warranted (PERF.md 'Baseline roofline consistency')."""
    import sys

    sys.path.insert(0, REPO)
    from scripts import baseline_roofline as rf

    _, parsed = _newest_bench()
    ratio = parsed.get("vs_baseline")
    if not ratio:
        pytest.skip("newest bench artifact has no vs_baseline")
    implied_baseline_cps = parsed["value"] / ratio
    band = rf.predict()["captions_per_sec_band"]
    assert rf.check(implied_baseline_cps), (
        f"baseline implied by the newest artifact "
        f"({implied_baseline_cps:.1f} captions/s) left the roofline band "
        f"{band} — re-audit the measurement before quoting the ratio"
    )


def test_superseded_ratios_not_presented_as_current():
    """The void ratios (4.19/2.14/2.075/2.10 and the builder-session
    1.744) may appear only in honesty-log/history contexts — never as the
    leading headline. Heuristic: the first 40 lines of README/CLAUDE must
    contain the current ratio and not the void ones as bold claims."""
    _, parsed = _newest_bench()
    ratio = parsed.get("vs_baseline")
    if ratio is None:
        pytest.skip("no ratio in newest artifact")
    for doc, head_lines in (("README.md", 60), ("CLAUDE.md", 60)):
        head = "\n".join(
            open(os.path.join(REPO, doc)).read().splitlines()[:head_lines]
        )
        for void in ("4.19", "2.075"):
            assert f"**{void}" not in head, (
                f"{doc} leads with superseded ratio {void}"
            )
        assert re.search(rf"\*\*[^*]*{re.escape(f'{ratio:g}')}", head), (
            f"{doc}'s lead does not bold the current ratio {ratio:g}"
        )
