"""Shared eval-harness plumbing: timing, FLOPs, predictions, results CSVs.

Mirrors the reference's measurement machinery (SURVEY §2.5/§5):
per-phase wall-clock stats (eval_trace_captioning.py:216-262,326-388),
fvcore-style FLOP counting — here free from XLA's cost analysis — and the
config-keyed results CSV with skip-if-exists dedup
(compute_scores.py:72-119,365-404; run_tasks.py:467-600).
"""

from __future__ import annotations

import csv

import json
import os
import time
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = [
    "PhaseTimer",
    "timing_summary",
    "xla_flops",
    "write_predictions",
    "append_results_csv",
    "result_exists",
    "batched",
    "score_and_log",
    "resolve_image_path",
]


class PhaseTimer:
    """Accumulates per-batch wall times for named phases."""

    def __init__(self):
        self.times: dict[str, list] = {}

    def record(self, phase: str, seconds: float):
        self.times.setdefault(phase, []).append(seconds)

    class _Ctx:
        def __init__(self, timer, phase):
            self.timer, self.phase = timer, phase

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            self.timer.record(self.phase, time.perf_counter() - self.t0)

    def phase(self, name: str):
        return self._Ctx(self, name)

    def summary(self, num_items: int) -> dict:
        out = {}
        for phase, ts in self.times.items():
            ts = np.asarray(ts)
            total = float(ts.sum())
            out[phase] = {
                "total_s": total,
                "mean_batch_s": float(ts.mean()),
                "std_batch_s": float(ts.std()),
                "items_per_s": num_items / total if total > 0 else float("inf"),
            }
        return out


def timing_summary(timer: PhaseTimer, num_items: int) -> dict:
    s = timer.summary(num_items)
    inf = s.get("inference", {})
    return {
        "phases": s,
        "images_per_sec_inference": inf.get("items_per_s"),
        "images_per_sec_total": (
            num_items / sum(p["total_s"] for p in s.values()) if s else None
        ),
    }


def xla_flops(fn: Callable, *args, allow_compile: bool = True) -> Optional[float]:
    """FLOPs of one jitted call via XLA cost analysis (replaces the
    reference's fvcore first-batch measurement).

    Pre-compile analysis is tried first (cheap). On the remote-TPU backend
    it returns None rather than raising, so on any miss we fall through to
    post-compile analysis — unless `allow_compile=False` (a second backend
    compile of a flagship-sized program over the TPU tunnel can take many
    minutes; callers with a cheap analytic fallback should disable it)."""
    import jax

    def _flops(cost):
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if not cost:
            return None
        f = cost.get("flops")
        return float(f) if f else None

    try:
        lowered = jax.jit(fn).lower(*args)
        try:
            flops = _flops(lowered.cost_analysis())
        except Exception:
            flops = None
        if flops is None and allow_compile:
            flops = _flops(lowered.compile().cost_analysis())
        return flops
    except Exception:
        return None


def write_predictions(path: str, records) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(records, f)


def score_and_log(
    cands: Sequence[str],
    refs: Sequence[Sequence[str]],
    *,
    csv_path: Optional[str] = None,
    config_row: Optional[dict] = None,
    extra_scores: Optional[dict] = None,
    extra_row: Optional[dict] = None,
) -> dict:
    """Shared scoring tail of every captioning task: corpus metrics +
    per-metric std over instances (reference compute_scores.py:339-357),
    merged with task-supplied extras (PAC-S family), then one config-keyed
    CSV row carrying the METEOR/SPICE variant markers. One body so the
    three task CSVs can never desynchronize on columns or markers."""
    from patchioner_tpu.eval import metrics

    per = metrics.compute_all_metrics(cands, refs)
    scores = {k: v[0] for k, v in per.items()}
    scores.update({f"{k}_std": float(np.std(v[1])) for k, v in per.items()})
    if extra_scores:
        scores.update(extra_scores)
    if csv_path is not None:
        row = dict(config_row or {})
        row.update({k: f"{v:.4f}" for k, v in scores.items()})
        # record which METEOR/SPICE variant ran (lexicon SPICE; synonym
        # stages only when a WordNet corpus is installed) so result CSVs
        # are never compared across machines unawares.
        row.update(metrics.variant_markers())
        if extra_row:
            row.update(extra_row)
        append_results_csv(
            csv_path, row, key_fields=list((config_row or {}).keys())
        )
    return scores


def resolve_image_path(image_roots, file_name: str) -> str:
    """Resolve `file_name` against an ordered list of image roots: first
    root that contains the file wins; otherwise fall back to roots[0] (the
    reference evals' multi-root search, letting the downstream open() raise
    the missing-file error with a concrete path). Accepts a single root
    string. Shared by all four task loaders."""
    if isinstance(image_roots, str):
        image_roots = [image_roots]
    for root in image_roots:
        cand = os.path.join(root, file_name)
        if os.path.exists(cand):
            return cand
    return os.path.join(image_roots[0], file_name)


def _row_key(row: dict, key_fields: Sequence[str]) -> tuple:
    return tuple(str(row.get(k, "")) for k in key_fields)


def result_exists(csv_path: str, row: dict, key_fields: Sequence[str]) -> bool:
    """Skip-if-done check, keyed by the full config combination
    (compute_scores.py:106-119; run_tasks.py:467-600)."""
    if not os.path.exists(csv_path) or not key_fields:
        # With no key fields there is no config identity to match on —
        # every row's key would be the empty tuple and the first row ever
        # written would shadow all later appends.
        return False
    key = _row_key(row, key_fields)
    with open(csv_path, newline="") as f:
        for existing in csv.DictReader(f):
            if _row_key(existing, key_fields) == key:
                return True
    return False


def append_results_csv(
    csv_path: str, row: dict, key_fields: Sequence[str], dedup: bool = True
) -> bool:
    """Append one results row; returns False when an identical config row
    already exists (and dedup is on). Columns grow monotonically."""
    if dedup and result_exists(csv_path, row, key_fields):
        return False
    rows = []
    fields: list = []
    if os.path.exists(csv_path):
        with open(csv_path, newline="") as f:
            reader = csv.DictReader(f)
            fields = list(reader.fieldnames or [])
            rows = list(reader)
    for k in row:
        if k not in fields:
            fields.append(k)
    rows.append({k: row.get(k, "") for k in fields})
    os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
    # atomic replace: the rewrite carries EVERY previously accumulated row,
    # so a crash mid-write must not truncate hours of grid results
    tmp_path = csv_path + f".tmp.{os.getpid()}"
    with open(tmp_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        for r in rows:
            writer.writerow({k: r.get(k, "") for k in fields})
    os.replace(tmp_path, csv_path)
    return True


def batched(items: Sequence, batch_size: int):
    for i in range(0, len(items), batch_size):
        yield i // batch_size, items[i : i + batch_size]


def prefetch(items: Sequence, fn: Callable, depth: int = 2,
             workers: int = 1):
    """Yield `fn(item)` for each item, computing up to `depth` items ahead
    in a background thread.

    The eval pipelines' host work (JPEG decode + resize) otherwise
    serializes with device compute — the accelerator idles while the next
    batch is decoded (reference behavior: a torch DataLoader with workers;
    eval_trace_captioning.py:233-330). With prefetch, the generator's yield
    only blocks when the host falls behind the device, so the
    "preprocessing" phase of PhaseTimer measures true pipeline STALL time,
    not total host work."""
    from concurrent.futures import ThreadPoolExecutor

    if depth < 1:
        for it in items:
            yield fn(it)
        return
    # results are yielded strictly in order (futs[i]); workers>1 only adds
    # overlap between consecutive items' host work/uploads
    with ThreadPoolExecutor(max_workers=max(1, min(workers, depth))) as ex:
        futs = []
        items = list(items)
        for it in items[:depth]:
            futs.append(ex.submit(fn, it))
        for i, _ in enumerate(items):
            if i + depth < len(items):
                futs.append(ex.submit(fn, items[i + depth]))
            yield futs[i].result()


def parallel_image_loader(preprocess_one: Callable, workers: int = None,
                          collate: Callable = None):
    """Batch loader decoding images on a thread pool (PIL JPEG decode and
    resize release the GIL). Single-threaded PIL costs ~10-20 ms/image at
    518px — ~2 s per 128-batch against ~0.34 s of device compute; threads
    bring host work under the device time so prefetch can hide it.
    `collate` combines the per-item results (default: np.stack)."""
    import numpy as _np

    collate = collate or _np.stack
    ex = _shared_decode_pool(workers)

    def load(items):
        return collate(list(ex.map(preprocess_one, items)))

    return load


_DECODE_POOLS: dict = {}


def _shared_decode_pool(workers: int = None):
    """One decode thread pool per worker count, shared process-wide.

    A pool per `parallel_image_loader` call would leak: the returned
    closure pins the executor alive and nothing ever shuts it down, so a
    grid of evaluate() runs accumulates idle worker threads. Decode
    threads are stateless, so sharing is safe."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    workers = workers or min(16, _os.cpu_count() or 8)
    pool = _DECODE_POOLS.get(workers)
    if pool is None:
        pool = _DECODE_POOLS[workers] = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="img-decode"
        )
    return pool


class profile_trace:
    """Context manager around `jax.profiler.trace` — the TPU-native
    replacement for the reference's wall-clock-only instrumentation
    (SURVEY §5: 'TPU equivalent: jax.profiler'). Produces a TensorBoard-
    loadable trace directory; no-ops cleanly if profiling is unavailable.

        with harness.profile_trace("/tmp/trace"):
            model.forward(...)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        try:
            import jax

            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception:
            self._active = False
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax

            jax.profiler.stop_trace()
        return False
