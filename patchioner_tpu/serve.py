"""Dynamic-batching caption server — the production-serving layer.

The reference serves captions one request at a time through its gradio demo
(demo/app.py:417-441: a single `forward` per interaction); there is no
batching layer anywhere in its tree. On TPU that leaves most of the chip
idle: the flagship caption step is compiled for a fixed batch and its cost
is dominated by per-dispatch latency at batch 1, while per-sample cost at
batch 128 is ~40x lower (PERF.md). This module adds the TPU-idiomatic
serving shape around the same model:

* requests (image + optional trace) enqueue from any thread and return
  futures;
* a worker thread coalesces the queue into micro-batches — up to
  `max_batch` items or `max_delay_ms` of accumulation, whichever first;
* batches are padded to a fixed LADDER OF BUCKET SIZES (powers of two up
  to `max_batch`) so XLA compiles one program per bucket instead of one
  per observed batch size — the static-shape discipline that keeps a
  TPU serving deployment from recompiling under load;
* every request mode rides its single-dispatch fused program when the
  model supports it
  (`Patchioner.caption_{traces,bboxes,region_sets,images}_fused`): trace
  points pad to a fixed `trace_points` length, box lists to a fixed
  `max_boxes` count (normalized [0,1] xyxy; a request resolves to the
  list of its per-box captions, or with `region_set=True` to ONE caption
  for the union of its boxes), and whole-image (cls) requests run the
  fused global program.

Padding rows are sliced off before decode results are delivered, so a
request's caption is independent of which bucket or co-batched neighbors
it ran with (pinned by tests/test_serve.py).
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

__all__ = ["CaptionServer", "ServerStats", "ServerOverloaded"]


class ServerOverloaded(RuntimeError):
    """Raised by `submit` when the request queue is at `max_queue` depth.

    Load shedding at the admission boundary: rejecting immediately keeps
    tail latency bounded for admitted requests instead of letting the
    queue grow without bound under sustained overload."""


def _percentile(sorted_vals: list, q: float) -> float:
    if not sorted_vals:
        return 0.0
    idx = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batched_items: int = 0  # real items only (padding rows excluded)
    errors: int = 0
    rejected: int = 0       # load-shed at admission (max_queue)
    completed: int = 0      # futures resolved successfully
    queue_wait_s_sum: float = 0.0   # enqueue -> batch starts staging
    latency_s_sum: float = 0.0      # enqueue -> future resolved
    latency_s_max: float = 0.0
    # bounded reservoir of recent end-to-end latencies for percentiles
    recent_latency_s: collections.deque = dataclasses.field(
        default_factory=lambda: collections.deque(maxlen=2048)
    )

    @property
    def mean_batch_size(self) -> float:
        return self.batched_items / self.batches if self.batches else 0.0


class _Request:
    __slots__ = ("pixels", "trace", "bboxes", "region_set", "future",
                 "t_enq")

    def __init__(self, pixels, trace, bboxes=None, region_set=False):
        self.pixels = pixels
        self.trace = trace
        self.bboxes = bboxes
        self.region_set = region_set
        self.future: Future = Future()
        self.t_enq = time.perf_counter()


class CaptionServer:
    """Batched caption serving over a built `Patchioner`.

    Args:
      model: a `Patchioner` (any backbone/decoder family).
      max_batch: largest micro-batch (and the top bucket size).
      max_delay_ms: how long the worker waits to fill a batch once it
        holds at least one request; the latency/throughput knob.
      trace_points: fixed trace padding length for the fused path (traces
        longer than this are truncated, like any fixed-shape serving
        contract; the flagship eval traces are <64 points).
      preprocess: when True, PIL images are accepted and resized/cropped
        to the model's geometry on the SUBMITTING thread inside
        `submit()` (uint8, normalized on device); arrays are assumed
        preprocessed. Note queue-wait telemetry (`t_enq`) is stamped
        after this resize, so it measures queue time, not client prep.
      workers: worker threads. One worker serializes host staging
        (np.stack of the batch, ~10 ms at 128x518px) with device compute;
        a second lets the next batch stage while the device runs
        (measured: ~30 ms of host machinery per 128-batch, <=9% of the
        flagship device step — workers=2 overlaps it). Device programs
        serialize on the device regardless, so extra workers only overlap
        HOST work; results stay per-request futures, so cross-batch
        completion order doesn't matter.
      mesh: optional `jax.sharding.Mesh` — serve data-parallel over it
        (the v5e-pod deployment shape). The model state replicates onto
        the mesh once (`Patchioner.place_on_mesh`) and every micro-batch
        dp-shards over `dp_axis`; the bucket ladder snaps to multiples of
        the dp size so no program ever pads twice. The caption step has
        no cross-batch communication (PERF.md scaling analysis), so
        throughput scales ~linearly with the dp size.
      dp_axis: mesh axis name carrying the batch (default "dp").
      max_queue: optional admission limit — `submit` raises
        `ServerOverloaded` (and counts it in `stats.rejected`) when the
        queue already holds this many requests, so sustained overload
        sheds load instead of growing tail latency without bound.
    """

    def __init__(self, model, *, max_batch: int = 8,
                 max_delay_ms: float = 5.0, trace_points: int = 64,
                 max_boxes: int = 16, preprocess: bool = True,
                 workers: int = 1, mesh=None, dp_axis: str = "dp",
                 max_queue: Optional[int] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if workers < 1:
            raise ValueError("workers must be >= 1")
        if max_queue is not None and max_queue < 1:
            raise ValueError("max_queue must be >= 1 (or None)")
        self.model = model
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.trace_points = int(trace_points)
        self.max_boxes = int(max_boxes)
        self.preprocess = preprocess
        step = 1
        if mesh is not None:
            if not hasattr(model, "place_on_mesh"):
                raise TypeError(
                    f"{type(model).__name__} does not support mesh serving"
                )
            model.place_on_mesh(mesh, dp_axis)
            if (hasattr(model, "supports_fused_trace_path")
                    and not model.supports_fused_trace_path()):
                import warnings

                warnings.warn(
                    "mesh serving shards the fused caption programs; this "
                    "model doesn't support them (non-DINO backbone or "
                    "ViECap/ClipCap delegation), so requests will run "
                    "single-device through forward()",
                    stacklevel=2,
                )
            step = int(mesh.shape[dp_axis])
            if self.max_batch % step:
                raise ValueError(
                    f"max_batch={max_batch} must be a multiple of the dp "
                    f"size {step} (mesh axis {dp_axis!r})"
                )
        self.buckets = []
        b = step
        while b < self.max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(self.max_batch)
        self.max_queue = max_queue
        self.stats = ServerStats()
        self._t0 = time.perf_counter()
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._drain_lock = threading.Lock()  # one drainer at a time
        self._stats_lock = threading.Lock()
        # serializes submit's closed-check+enqueue against close's
        # sentinel insertion — a request slipping in AFTER the sentinels
        # would never resolve its future
        self._lifecycle_lock = threading.Lock()
        self._workers = [
            threading.Thread(
                target=self._run, name=f"caption-server-{i}", daemon=True
            )
            for i in range(workers)
        ]
        for w in self._workers:
            w.start()

    # ------------------------------------------------------------- client

    def submit(self, image, trace: Optional[Sequence] = None,
               bboxes: Optional[Sequence] = None,
               region_set: bool = False) -> Future:
        """Enqueue one request; resolves to the caption string (or, for a
        `bboxes` request without `region_set`, a LIST of per-box caption
        strings).

        `image`: PIL image (when `preprocess=True`) or a preprocessed
        (H, W, 3) array. `trace`: optional sequence of (x, y) in [0, 1]
        (or {'x','y'} dicts, the reference trace format) — present means a
        trace caption. `bboxes`: optional sequence of up to `max_boxes`
        xyxy boxes with NORMALIZED [0, 1] coordinates of the preprocessed
        square image (scaled to pixels internally) — present means dense
        per-box captions, or, with `region_set=True`, ONE caption for the
        union of the boxes (the reference's controllable captioning,
        src/model.py:1042-1047). Absent both, a whole-image caption.
        """
        if self._closed:
            raise RuntimeError("CaptionServer is closed")
        if trace is not None and bboxes is not None:
            raise ValueError("a request is trace OR bboxes, not both")
        if region_set and (bboxes is None or len(bboxes) == 0):
            # [] must not silently caption an all-zero merged weight map
            raise ValueError("region_set=True requires a non-empty bboxes")
        if trace is not None and len(trace) == 0:
            # an empty trace pools a zero feature -> NaN prefix under
            # normalize=True -> a silent garbage caption; error at the
            # serving boundary like the empty region-set above
            raise ValueError("trace must contain at least one point")
        if self.max_queue is not None and self._q.qsize() >= self.max_queue:
            # shed BEFORE the (possibly expensive) image preprocessing
            with self._stats_lock:
                self.stats.rejected += 1
            raise ServerOverloaded(
                f"request queue at max_queue={self.max_queue}; retry later"
            )
        px = self._prep(image)
        hw = self.model.crop_dim
        if px.ndim != 3 or px.shape[0] != hw or px.shape[1] != hw \
                or px.shape[2] != 3:
            # reject at admission: a malformed pixel array would make
            # np.stack (or the model call) raise for the WHOLE co-batched
            # group, failing every innocent neighbor's future
            raise ValueError(
                f"pixels must be ({hw}, {hw}, 3); got {tuple(px.shape)} "
                f"(preprocess={self.preprocess} does not resize ndarray "
                f"inputs)"
            )
        req = _Request(px, self._norm_trace(trace),
                       self._norm_bboxes(bboxes), region_set=region_set)
        with self._lifecycle_lock:
            if self._closed:
                raise RuntimeError("CaptionServer is closed")
            # definitive admission check under the lock: the early qsize
            # read above is unlocked, so concurrent submitters could all
            # pass it and overshoot max_queue by the submitter concurrency
            if (self.max_queue is not None
                    and self._q.qsize() >= self.max_queue):
                with self._stats_lock:
                    self.stats.rejected += 1
                raise ServerOverloaded(
                    f"request queue at max_queue={self.max_queue}; "
                    f"retry later"
                )
            self._q.put(req)
        with self._stats_lock:
            self.stats.requests += 1
        return req.future

    def caption(self, images: Sequence, traces: Optional[Sequence] = None,
                timeout: Optional[float] = None) -> list:
        """Synchronous convenience: submit all, wait for all."""
        if traces is not None and len(traces) != len(images):
            # zip() would silently drop the tail and misalign results
            raise ValueError(
                f"got {len(images)} images but {len(traces)} traces; "
                f"pass None entries for images without a trace"
            )
        traces = traces if traces is not None else [None] * len(images)
        futs = [self.submit(im, tr) for im, tr in zip(images, traces)]
        return [f.result(timeout=timeout) for f in futs]

    def warmup(self, *, trace: bool = True, cls: bool = False,
               bbox: bool = False, region_set: bool = False,
               buckets: Optional[Sequence[int]] = None,
               pixel_dtype=None) -> None:
        """Pre-compile the bucket ladder before taking traffic.

        XLA compiles one program per (bucket, mode); at flagship scale a
        compile costs minutes (amortized across processes by the
        persistent cache, utils/compile_cache) — a serving deployment
        pays them at startup, not on the first unlucky request. Runs one
        dummy batch per requested bucket/mode through the normal path;
        warmup batches are excluded from `stats` so the /stats telemetry
        reflects real traffic only.
        """
        h, w = self.model.crop_dim, self.model.crop_dim
        # jit programs key on the pixel dtype: PIL-mode servers stage
        # uint8 (_prep -> preprocess_pil_uint8), preprocess=False clients
        # typically submit normalized float32 arrays — warming the wrong
        # dtype would leave the first live request paying the compile.
        # pixel_dtype overrides for unusual client staging.
        if pixel_dtype is None:
            pixel_dtype = np.uint8 if self.preprocess else np.float32
        dummy = np.zeros((h, w, 3), pixel_dtype)
        dummy_trace = self._norm_trace([(0.5, 0.5)])
        dummy_boxes = self._norm_bboxes([(0.1, 0.1, 0.9, 0.9)])
        for b in (buckets if buckets is not None else self.buckets):
            if b > self.max_batch:
                # _bucket() clamps pts/valid to max_batch rows, so a bigger
                # dummy group would crash the fused call with a shape
                # mismatch (and no live batch could ever use the program)
                raise ValueError(
                    f"warmup bucket {b} exceeds max_batch={self.max_batch}"
                )
            # run the group path directly — a queue round-trip could split
            # the dummies into a different (already-compiled) bucket
            if trace:
                self._run_group(
                    [_Request(dummy, dummy_trace) for _ in range(b)],
                    "trace", record_stats=False,
                )
            if cls:
                self._run_group(
                    [_Request(dummy, None) for _ in range(b)], "cls",
                    record_stats=False,
                )
            if bbox:
                self._run_group(
                    [_Request(dummy, None, dummy_boxes) for _ in range(b)],
                    "bbox", record_stats=False,
                )
            if region_set:
                self._run_group(
                    [_Request(dummy, None, dummy_boxes, region_set=True)
                     for _ in range(b)],
                    "region_set", record_stats=False,
                )

    def snapshot(self) -> dict:
        """JSON-ready telemetry for an operations endpoint (/stats).

        Latency percentiles come from a bounded reservoir of the most
        recent 2048 completed requests (end-to-end: enqueue -> future
        resolved, so they include queue wait, host staging, the device
        step, and detokenization). Queue wait alone is reported as a mean
        — a rising wait with a stable device step means the deployment
        needs a bigger bucket / more chips, which is the one signal an
        autoscaler needs."""
        with self._stats_lock:
            s = self.stats
            recent = sorted(s.recent_latency_s)
            done = s.completed
            return {
                "uptime_s": round(time.perf_counter() - self._t0, 3),
                "requests": s.requests,
                "completed": done,
                "rejected": s.rejected,
                "errors": s.errors,
                "batches": s.batches,
                "mean_batch_size": round(s.mean_batch_size, 2),
                "queue_depth": self._q.qsize(),
                "max_queue": self.max_queue,
                "mean_queue_wait_ms": round(
                    s.queue_wait_s_sum / done * 1e3, 3) if done else 0.0,
                "mean_latency_ms": round(
                    s.latency_s_sum / done * 1e3, 3) if done else 0.0,
                "p50_latency_ms": round(_percentile(recent, 0.50) * 1e3, 3),
                "p95_latency_ms": round(_percentile(recent, 0.95) * 1e3, 3),
                "p99_latency_ms": round(_percentile(recent, 0.99) * 1e3, 3),
                "max_latency_ms": round(s.latency_s_max * 1e3, 3),
            }

    def close(self, timeout: Optional[float] = 10.0) -> None:
        with self._lifecycle_lock:
            if self._closed:
                return
            self._closed = True
            for _ in self._workers:
                self._q.put(None)
        for w in self._workers:
            w.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- worker

    def _prep(self, image):
        if self.preprocess and not isinstance(image, np.ndarray):
            from patchioner_tpu.utils import transforms

            return transforms.preprocess_pil_uint8(
                image, self.model.resize_dim, self.model.crop_dim
            )
        return np.asarray(image)

    def _norm_trace(self, trace):
        if trace is None:
            return None
        pts = [
            (float(p["x"]), float(p["y"])) if isinstance(p, dict)
            else (float(p[0]), float(p[1]))
            for p in trace
        ]
        return pts[: self.trace_points]

    def _norm_bboxes(self, bboxes):
        if bboxes is None:
            return None
        if len(bboxes) > self.max_boxes:
            raise ValueError(
                f"{len(bboxes)} boxes > max_boxes={self.max_boxes} (the "
                "fixed-shape serving contract; raise max_boxes at "
                "construction)"
            )
        # normalized [0,1] xyxy -> the model's pixel [x1, y1, w, h]
        # convention (ops/region_pooling.extract_bbox_features; the
        # reference converts stored xyxy the same way before its model
        # call, eval_densecap.py:303-310)
        d = float(self.model.crop_dim)
        out = []
        for b in bboxes:
            x1, y1, x2, y2 = (float(v) for v in b)
            if x2 < x1 or y2 < y1:
                raise ValueError(f"inverted bbox {b!r} (xyxy expected)")
            out.append((x1 * d, y1 * d, (x2 - x1) * d, (y2 - y1) * d))
        return out

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def _drain(self) -> Optional[list]:
        """Block for the first request, then accumulate until max_batch
        or max_delay; None signals shutdown. The lock admits one draining
        worker at a time so concurrent workers build FULL batches instead
        of splitting the queue between partial ones."""
        with self._drain_lock:
            first = self._q.get()
            if first is None:
                return None
            batch = [first]
            deadline = time.perf_counter() + self.max_delay_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._q.put(None)  # keep the shutdown signal
                    break
                batch.append(nxt)
            return batch

    def _run(self) -> None:
        while True:
            batch = self._drain()
            if batch is None:
                return
            # trace / bbox / region-set / cls requests run different
            # programs — split, keep arrival order within each group
            for mode_group, mode in (
                ([r for r in batch if r.trace is not None], "trace"),
                ([r for r in batch
                  if r.bboxes is not None and not r.region_set], "bbox"),
                ([r for r in batch
                  if r.bboxes is not None and r.region_set], "region_set"),
                ([r for r in batch
                  if r.trace is None and r.bboxes is None], "cls"),
            ):
                # Also split by pixel dtype: np.stack over mixed
                # uint8 (device-normalized) and float (pre-normalized)
                # rows would promote everything to float and silently
                # skip the fused step's uint8 normalization for the
                # uint8 rows — run the two populations separately.
                for group in (
                    [r for r in mode_group if r.pixels.dtype == np.uint8],
                    [r for r in mode_group if r.pixels.dtype != np.uint8],
                ):
                    if not group:
                        continue
                    t_start = time.perf_counter()
                    try:
                        caps = self._run_group(group, mode)
                        if len(caps) != len(group):
                            # zip below would silently truncate, leaving
                            # tail futures unresolved forever; raise into
                            # the except-block so every future gets the
                            # error instead
                            raise RuntimeError(
                                f"model returned {len(caps)} captions for "
                                f"a group of {len(group)}"
                            )
                        t_done = time.perf_counter()
                        for r, c in zip(group, caps):
                            # a client-cancelled (or already-resolved)
                            # future must not abort delivery to the REST of
                            # the co-batched group: set_result on it raises
                            # InvalidStateError mid-loop
                            if not r.future.done():
                                r.future.set_result(c)
                        with self._stats_lock:
                            s = self.stats
                            for r in group:
                                lat = t_done - r.t_enq
                                s.completed += 1
                                s.queue_wait_s_sum += t_start - r.t_enq
                                s.latency_s_sum += lat
                                s.latency_s_max = max(s.latency_s_max, lat)
                                s.recent_latency_s.append(lat)
                    except Exception as e:  # noqa: BLE001 — delivered to callers
                        with self._stats_lock:
                            self.stats.errors += 1
                        for r in group:
                            if not r.future.done():
                                r.future.set_exception(e)

    def _fused_ok(self) -> bool:
        return (hasattr(self.model, "supports_fused_trace_path")
                and self.model.supports_fused_trace_path())

    def _run_group(self, group: list, mode: str,
                   record_stats: bool = True) -> list:
        n = len(group)
        nb = self._bucket(n)
        if record_stats:
            with self._stats_lock:
                self.stats.batches += 1
                self.stats.batched_items += n
        imgs = np.stack([r.pixels for r in group])
        if nb > n:  # pad with copies of row 0 — sliced off below
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[:1], nb - n, axis=0)]
            )
        if mode == "trace":
            pts = np.zeros((nb, self.trace_points, 2), np.float32)
            valid = np.zeros((nb, self.trace_points), np.float32)
            for i, r in enumerate(group):
                k = len(r.trace)
                if k:
                    pts[i, :k] = r.trace
                    valid[i, :k] = 1.0
            if self._fused_ok():
                caps = self.model.caption_traces_fused(imgs, pts, valid)
            else:
                traces = [r.trace for r in group]
                traces += [group[0].trace] * (nb - n)
                outs = self.model.forward(
                    imgs, get_cls_capt=False, traces=traces
                )
                caps = outs["trace_capts"]
            return list(caps[:n])
        if mode == "bbox":
            # fixed (nb, max_boxes, 4) shape; dummy [0,0,1,1] padding rows
            # (the dense-captioning convention, eval_densecap.py:330-333)
            # are sliced off per request below
            boxes = np.tile(
                np.asarray([0.0, 0.0, 1.0, 1.0], np.float32),
                (nb, self.max_boxes, 1),
            )
            for i, r in enumerate(group):
                if r.bboxes:
                    boxes[i, : len(r.bboxes)] = r.bboxes
            if self._fused_ok():
                rows = self.model.caption_bboxes_fused(imgs, boxes)
            else:
                rows = self.model.forward(
                    imgs, get_cls_capt=False, bboxes=boxes
                )["bbox_capts"]
            return [
                list(rows[i][: len(r.bboxes)]) for i, r in enumerate(group)
            ]
        if mode == "region_set":
            # fixed (nb, max_boxes, 4) shape; all-negative dummy rows are
            # skipped by the merged-weight-map pooling
            # (ops/region_pooling.extract_bbox_features_single:257)
            boxes = np.full((nb, self.max_boxes, 4), -1.0, np.float32)
            for i, r in enumerate(group):
                if r.bboxes:
                    boxes[i, : len(r.bboxes)] = r.bboxes
            if self._fused_ok():
                caps = self.model.caption_region_sets_fused(imgs, boxes)
            else:
                caps = self.model.forward(
                    imgs, get_cls_capt=False, bboxes=boxes,
                    get_controllable_capts=True,
                )["set_controllable_capts"]
            return list(caps[:n])
        if self._fused_ok():
            caps = self.model.caption_images_fused(imgs)
        else:
            caps = self.model.forward(imgs, get_cls_capt=True)["cls_capt"]
        return list(caps[:n])
