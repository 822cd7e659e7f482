"""Dynamic-batching caption server (patchioner_tpu/serve.py): batching
must be invisible to results — a request's caption equals the direct
single-call caption regardless of bucket padding or co-batched neighbors —
and the queue/futures machinery must survive concurrency and errors."""

import threading

import numpy as np
import pytest

import jax

from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj
from patchioner_tpu.serve import CaptionServer


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
        bank=memproj.prepare_bank(jax.random.normal(k3, (200, 128))),
        bank_texts=[f"caption {i}" for i in range(200)],
        normalize=True,
    )


def _img(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((56, 56, 3)).astype(np.float32)


def _trace(seed, k=5):
    rng = np.random.default_rng(100 + seed)
    return [tuple(p) for p in rng.uniform(0.05, 0.95, (k, 2))]


def test_trace_results_match_direct_forward(tiny_model):
    """Server captions == direct forward(traces=...) per request, even
    though the server pads to buckets and mixes neighbors."""
    imgs = [_img(i) for i in range(5)]
    traces = [_trace(i) for i in range(5)]
    direct = tiny_model.forward(
        np.stack(imgs), get_cls_capt=False, traces=traces
    )["trace_capts"]
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=30,
                       preprocess=False) as srv:
        got = srv.caption(imgs, traces, timeout=300)
    assert got == list(direct)


def test_cls_and_trace_requests_coexist(tiny_model):
    imgs = [_img(10 + i) for i in range(4)]
    traces = [None, _trace(11), None, _trace(13)]
    direct_cls = tiny_model.forward(
        np.stack([imgs[0], imgs[2]]), get_cls_capt=True
    )["cls_capt"]
    direct_tr = tiny_model.forward(
        np.stack([imgs[1], imgs[3]]), get_cls_capt=False,
        traces=[traces[1], traces[3]],
    )["trace_capts"]
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=30,
                       preprocess=False) as srv:
        got = srv.caption(imgs, traces, timeout=300)
    assert got[0] == direct_cls[0] and got[2] == direct_cls[1]
    assert got[1] == direct_tr[0] and got[3] == direct_tr[1]


def test_cancelled_future_does_not_poison_cobatched_requests(tiny_model):
    """Round-3c review regression: set_result on a client-cancelled future
    raises InvalidStateError, which used to abort delivery mid-loop and
    set_exception on every later request in the same co-batched group —
    the neighbors must still get their captions."""
    imgs = [_img(20 + i) for i in range(3)]
    direct = tiny_model.forward(np.stack(imgs), get_cls_capt=True)["cls_capt"]
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=200,
                       preprocess=False) as srv:
        f0 = srv.submit(imgs[0])
        f1 = srv.submit(imgs[1])
        f2 = srv.submit(imgs[2])
        cancelled = f0.cancel()  # pending future in the forming batch
        assert f1.result(timeout=300) == direct[1]
        assert f2.result(timeout=300) == direct[2]
        if not cancelled:  # worker won the race — plain delivery then
            assert f0.result(timeout=300) == direct[0]


def test_batch_composition_independence(tiny_model):
    """The same request produces the same caption at batch 1 (bucket 1)
    and co-batched with others (bucket 4) — padding rows don't leak."""
    img, tr = _img(42), _trace(42)
    with CaptionServer(tiny_model, max_batch=1, max_delay_ms=1,
                       preprocess=False) as srv:
        alone = srv.submit(img, tr).result(timeout=300)
    with CaptionServer(tiny_model, max_batch=8, max_delay_ms=50,
                       preprocess=False) as srv:
        futs = [srv.submit(_img(50 + i), _trace(50 + i)) for i in range(2)]
        futs.append(srv.submit(img, tr))
        got = [f.result(timeout=300) for f in futs]
        assert srv.stats.batches >= 1
        assert srv.stats.mean_batch_size > 1.0
    assert got[2] == alone


def test_concurrent_submitters(tiny_model):
    """Requests from many threads all resolve, each to its own result."""
    results = {}
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=10,
                       preprocess=False) as srv:

        def worker(i):
            results[i] = srv.submit(_img(i), _trace(i)).result(timeout=300)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert srv.stats.requests == 6
    assert len(results) == 6
    for i, cap in results.items():
        direct = tiny_model.forward(
            np.stack([_img(i)]), get_cls_capt=False, traces=[_trace(i)]
        )["trace_capts"][0]
        assert cap == direct


def test_error_propagates_to_future_only(tiny_model):
    """A bad request fails ONLY itself; the server keeps serving. Since
    round 3d malformed arrays are rejected synchronously at admission
    (inside a co-batched group they would fail innocent neighbors'
    futures), so the error arrives as a submit() raise, not via the
    future."""
    with CaptionServer(tiny_model, max_batch=1, max_delay_ms=1,
                       preprocess=False) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((3, 3)), _trace(0))  # wrong image rank
        ok = srv.submit(_img(1), _trace(1)).result(timeout=300)
        assert isinstance(ok, str)


def test_submit_after_close_raises(tiny_model):
    srv = CaptionServer(tiny_model, max_batch=2, preprocess=False)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(_img(0), _trace(0))


def test_trace_dict_format_and_truncation(tiny_model):
    """Reference {'x','y'} dict traces are accepted; overlong traces
    truncate to the fixed serving contract length."""
    img = _img(7)
    pts = _trace(7, k=3)
    as_dicts = [{"x": x, "y": y} for x, y in pts]
    with CaptionServer(tiny_model, max_batch=1, max_delay_ms=1,
                       trace_points=2, preprocess=False) as srv:
        got_dict = srv.submit(img, as_dicts).result(timeout=300)
        got_tup = srv.submit(img, pts).result(timeout=300)
    assert got_dict == got_tup
    direct = tiny_model.forward(
        np.stack([img]), get_cls_capt=False, traces=[pts[:2]]
    )["trace_capts"][0]
    assert got_tup == direct


def test_two_workers_results_still_correct(tiny_model):
    """workers=2 overlaps host staging with compute; results must stay
    identical to direct forward for every request."""
    imgs = [_img(70 + i) for i in range(6)]
    traces = [_trace(70 + i) for i in range(6)]
    direct = tiny_model.forward(
        np.stack(imgs), get_cls_capt=False, traces=traces
    )["trace_capts"]
    with CaptionServer(tiny_model, max_batch=2, max_delay_ms=20,
                       preprocess=False, workers=2) as srv:
        got = srv.caption(imgs, traces, timeout=300)
        assert srv.stats.batches >= 3
    assert got == list(direct)


def test_mixed_pixel_dtypes_coexist(tiny_model):
    """uint8 (device-normalized) and float32 (pre-normalized) requests in
    ONE drained batch must each get the caption they'd get alone — the
    worker splits by dtype so np.stack never promotes the uint8 rows to
    float (which would silently skip their on-device normalization)."""
    rng = np.random.default_rng(3)
    img_u8 = rng.integers(0, 256, (56, 56, 3)).astype(np.uint8)
    img_f32 = _img(91)
    tr_u8, tr_f32 = _trace(91), _trace(92)
    # baselines: each request served alone (bucket 1)
    with CaptionServer(tiny_model, max_batch=1, max_delay_ms=1,
                       preprocess=False) as srv:
        alone_u8 = srv.submit(img_u8, tr_u8).result(timeout=300)
        alone_f32 = srv.submit(img_f32, tr_f32).result(timeout=300)
    # co-batched: one drain holds both dtypes
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=100,
                       preprocess=False) as srv:
        futs = [srv.submit(img_u8, tr_u8), srv.submit(img_f32, tr_f32),
                srv.submit(img_u8, _trace(93))]
        got = [f.result(timeout=300) for f in futs]
        # the split ran the two dtype populations as separate groups
        assert srv.stats.batches >= 2
    assert got[0] == alone_u8
    assert got[1] == alone_f32
    assert isinstance(got[2], str)


def test_warmup_compiles_each_bucket(tiny_model):
    """warmup() runs one dummy batch per bucket/mode and leaves the server
    fully operational; post-warmup results still match direct forward."""
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=5,
                       preprocess=False) as srv:
        assert srv.buckets == [1, 2, 4]
        ran = []
        inner = srv._run_group
        srv._run_group = lambda g, m, **kw: (
            ran.append((len(g), m)), inner(g, m, **kw))[1]
        srv.warmup(trace=True, cls=True)
        srv._run_group = inner
        # one dummy batch per (bucket, mode) actually ran...
        assert sorted(ran) == sorted(
            [(b, m) for b in (1, 2, 4) for m in ("trace", "cls")]
        )
        # ...but warmup dummies are excluded from stats — /stats telemetry
        # reflects real traffic only
        assert srv.stats.batches == 0 and srv.stats.batched_items == 0
        img, tr = _img(90), _trace(90)
        got = srv.submit(img, tr).result(timeout=300)
        assert srv.stats.batches >= 1
    direct = tiny_model.forward(
        np.stack([img]), get_cls_capt=False, traces=[tr]
    )["trace_capts"][0]
    assert got == direct


def _boxes(seed, k=2):
    rng = np.random.default_rng(300 + seed)
    out = []
    for _ in range(k):
        x1, y1 = rng.uniform(0.0, 0.5, 2)
        out.append((x1, y1, x1 + rng.uniform(0.2, 0.5),
                    y1 + rng.uniform(0.2, 0.5)))
    return out


def test_bbox_requests_match_direct_fused(tiny_model):
    """A bbox request resolves to its per-box caption list, equal to the
    direct caption_bboxes_fused call at the same padded geometry,
    regardless of co-batched neighbors or box-count differences. The
    server contract is normalized [0,1] xyxy; the model convention is
    pixel [x1, y1, w, h] — the expected values apply that conversion
    explicitly, so a server-side convention slip fails this test."""
    imgs = [_img(i) for i in range(3)]
    boxes = [_boxes(0, 2), _boxes(1, 3), _boxes(2, 1)]
    with CaptionServer(tiny_model, max_batch=4, preprocess=False,
                       max_boxes=4) as srv:
        futs = [srv.submit(im, bboxes=b) for im, b in zip(imgs, boxes)]
        got = [f.result(timeout=120) for f in futs]
    d = float(tiny_model.crop_dim)
    for i in range(3):
        pad = np.tile(np.asarray([0, 0, 1, 1], np.float32), (1, 4, 1))
        bx = np.asarray(boxes[i], np.float32)
        pad[0, : len(boxes[i])] = np.stack(
            [bx[:, 0] * d, bx[:, 1] * d,
             (bx[:, 2] - bx[:, 0]) * d, (bx[:, 3] - bx[:, 1]) * d], axis=-1
        )
        want = tiny_model.caption_bboxes_fused(
            np.stack([imgs[i]]), pad
        )[0][: len(boxes[i])]
        assert got[i] == want, i
        assert len(got[i]) == len(boxes[i])


def test_all_three_modes_coexist(tiny_model):
    """trace + bbox + cls requests in one submission wave all resolve
    correctly."""
    im = _img(7)
    with CaptionServer(tiny_model, max_batch=8, preprocess=False,
                       max_boxes=2, max_delay_ms=50) as srv:
        f_cls = srv.submit(im)
        f_tr = srv.submit(im, trace=_trace(7))
        f_bb = srv.submit(im, bboxes=_boxes(7, 2))
        cls_c, tr_c, bb_c = (f.result(timeout=120) for f in
                             (f_cls, f_tr, f_bb))
    assert isinstance(cls_c, str) and isinstance(tr_c, str)
    assert isinstance(bb_c, list) and len(bb_c) == 2
    assert cls_c == tiny_model.caption_images_fused(np.stack([im]))[0]


def test_bbox_request_contract_errors(tiny_model):
    with CaptionServer(tiny_model, max_batch=2, preprocess=False,
                       max_boxes=2) as srv:
        with pytest.raises(ValueError, match="max_boxes"):
            srv.submit(_img(0), bboxes=_boxes(0, 3))
        with pytest.raises(ValueError, match="not both"):
            srv.submit(_img(0), trace=_trace(0), bboxes=_boxes(0, 1))


def test_warmup_bbox_bucket(tiny_model):
    with CaptionServer(tiny_model, max_batch=2, preprocess=False,
                       max_boxes=2) as srv:
        srv.warmup(trace=False, bbox=True, buckets=[2])
        f = srv.submit(_img(3), bboxes=_boxes(3, 1))
        assert isinstance(f.result(timeout=120), list)


def test_region_set_requests_match_direct_fused(tiny_model):
    """region_set=True resolves to ONE caption for the union of the boxes,
    equal to the direct caption_region_sets_fused call at the same padded
    geometry ([-1] dummy rows are skipped by the merged-map pooling),
    regardless of co-batched per-box bbox neighbors."""
    imgs = [_img(60 + i) for i in range(2)]
    boxes = [_boxes(60, 2), _boxes(61, 3)]
    with CaptionServer(tiny_model, max_batch=4, preprocess=False,
                       max_boxes=4, max_delay_ms=50) as srv:
        futs = [srv.submit(im, bboxes=b, region_set=True)
                for im, b in zip(imgs, boxes)]
        # a per-box request co-batched in the same wave must not disturb it
        futs.append(srv.submit(_img(62), bboxes=_boxes(62, 1)))
        got = [f.result(timeout=120) for f in futs]
    d = float(tiny_model.crop_dim)
    for i in range(2):
        pad = np.full((1, 4, 4), -1.0, np.float32)
        bx = np.asarray(boxes[i], np.float32)
        pad[0, : len(boxes[i])] = np.stack(
            [bx[:, 0] * d, bx[:, 1] * d,
             (bx[:, 2] - bx[:, 0]) * d, (bx[:, 3] - bx[:, 1]) * d], axis=-1
        )
        want = tiny_model.caption_region_sets_fused(
            np.stack([imgs[i]]), pad
        )[0]
        assert got[i] == want, i
        assert isinstance(got[i], str)
    assert isinstance(got[2], list) and len(got[2]) == 1


def test_region_set_contract_errors(tiny_model):
    with CaptionServer(tiny_model, max_batch=1, preprocess=False,
                       max_boxes=2) as srv:
        with pytest.raises(ValueError, match="non-empty bboxes"):
            srv.submit(_img(0), region_set=True)
        with pytest.raises(ValueError, match="non-empty bboxes"):
            # [] must error like None — an all-dummy box row would
            # silently caption a zero merged weight map
            srv.submit(_img(0), bboxes=[], region_set=True)
        with pytest.raises(ValueError, match="at least one point"):
            # an empty trace pools a zero feature -> NaN prefix -> silent
            # garbage caption; error at the boundary instead
            srv.submit(_img(0), trace=[])


def test_warmup_dtype_matches_staging_mode(tiny_model, monkeypatch):
    """warmup must compile the dtype live traffic will stage: uint8 for
    PIL-mode servers (preprocess=True), float32 for preprocessed-array
    clients — a mismatch leaves the first real request paying the
    flagship compile warmup exists to absorb."""
    seen = {}

    def capture(self, group, mode, record_stats=True):
        seen.setdefault(self.preprocess, set()).add(
            np.asarray(group[0].pixels).dtype
        )
        return ["x"] * len(group)

    monkeypatch.setattr(CaptionServer, "_run_group", capture)
    with CaptionServer(tiny_model, max_batch=1, preprocess=False) as srv:
        srv.warmup(buckets=[1])
        srv.warmup(buckets=[1], pixel_dtype=np.uint8)  # explicit override
    with CaptionServer(tiny_model, max_batch=1, preprocess=True) as srv:
        srv.warmup(buckets=[1])
    assert np.dtype(np.float32) in seen[False]
    assert np.dtype(np.uint8) in seen[False]
    assert seen[True] == {np.dtype(np.uint8)}


def test_warmup_region_set_bucket(tiny_model):
    with CaptionServer(tiny_model, max_batch=2, preprocess=False,
                       max_boxes=2) as srv:
        srv.warmup(trace=False, region_set=True, buckets=[2])
        f = srv.submit(_img(4), bboxes=_boxes(4, 2), region_set=True)
        assert isinstance(f.result(timeout=120), str)


def test_forward_fallback_paths(tiny_model, monkeypatch):
    """With the fused family gated off (as for ViECap/ClipCap-decoder or
    non-DINO models), every request mode serves through forward() with
    identical results."""
    imgs = [_img(200 + i) for i in range(2)]
    tr = _trace(200)
    bxs = _boxes(200, 2)
    with CaptionServer(tiny_model, max_batch=2, preprocess=False,
                       max_boxes=2, max_delay_ms=20) as srv:
        fused = {
            "cls": srv.submit(imgs[0]).result(timeout=300),
            "trace": srv.submit(imgs[0], trace=tr).result(timeout=300),
            "bbox": srv.submit(imgs[0], bboxes=bxs).result(timeout=300),
            "rs": srv.submit(imgs[0], bboxes=bxs,
                             region_set=True).result(timeout=300),
        }
    monkeypatch.setattr(
        type(tiny_model), "supports_fused_trace_path", lambda self: False
    )
    with CaptionServer(tiny_model, max_batch=2, preprocess=False,
                       max_boxes=2, max_delay_ms=20) as srv:
        assert not srv._fused_ok()
        got = {
            "cls": srv.submit(imgs[0]).result(timeout=300),
            "trace": srv.submit(imgs[0], trace=tr).result(timeout=300),
            "bbox": srv.submit(imgs[0], bboxes=bxs).result(timeout=300),
            "rs": srv.submit(imgs[0], bboxes=bxs,
                             region_set=True).result(timeout=300),
        }
    # fused and forward paths produce identical captions (pinned elsewhere
    # per mode at the model level; this pins it THROUGH the server)
    assert got == fused


# ---------------------------------------------------------------- telemetry


def test_stats_snapshot_latency_and_json(tiny_model):
    """snapshot() reports completion/latency telemetry and is JSON-ready
    (the demo's /stats endpoint serializes it verbatim)."""
    import json

    imgs = [_img(300 + i) for i in range(5)]
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=20,
                       preprocess=False) as srv:
        srv.caption(imgs, timeout=300)
        snap = srv.snapshot()
    json.dumps(snap)  # must not raise
    assert snap["requests"] == 5 and snap["completed"] == 5
    assert snap["rejected"] == 0 and snap["errors"] == 0
    assert snap["mean_latency_ms"] > 0
    # queue wait is a component of end-to-end latency
    assert snap["mean_queue_wait_ms"] <= snap["mean_latency_ms"]
    assert (0 < snap["p50_latency_ms"] <= snap["p95_latency_ms"]
            <= snap["p99_latency_ms"] <= snap["max_latency_ms"])
    assert snap["queue_depth"] == 0 and snap["uptime_s"] > 0


def test_warmup_excluded_from_latency_stats(tiny_model):
    with CaptionServer(tiny_model, max_batch=2, max_delay_ms=10,
                       preprocess=False) as srv:
        srv.warmup(trace=False, cls=True, buckets=[1])
        assert srv.snapshot()["completed"] == 0
        srv.submit(_img(310)).result(timeout=300)
        assert srv.snapshot()["completed"] == 1


class _GatedModel:
    """Delegates to a real model but blocks forward() until released —
    makes queue buildup deterministic for the backpressure test."""

    def __init__(self, model):
        self._model = model
        self.entered = threading.Event()
        self.release = threading.Event()

    def __getattr__(self, name):
        return getattr(self._model, name)

    def supports_fused_trace_path(self):
        return False  # route through forward() so the gate sees every batch

    def forward(self, *a, **kw):
        self.entered.set()
        assert self.release.wait(timeout=300)
        return self._model.forward(*a, **kw)


def test_max_queue_sheds_load(tiny_model):
    from patchioner_tpu.serve import ServerOverloaded

    gated = _GatedModel(tiny_model)
    srv = CaptionServer(gated, max_batch=1, max_delay_ms=1,
                        preprocess=False, max_queue=2)
    try:
        f0 = srv.submit(_img(320))          # worker dequeues, blocks in forward
        assert gated.entered.wait(timeout=300)
        f1 = srv.submit(_img(321))          # queued (depth 1)
        f2 = srv.submit(_img(322))          # queued (depth 2 == max_queue)
        with pytest.raises(ServerOverloaded):
            srv.submit(_img(323))           # shed at admission
        assert srv.snapshot()["rejected"] == 1
        gated.release.set()
        for f in (f0, f1, f2):              # admitted requests all complete
            assert isinstance(f.result(timeout=300), str)
        snap = srv.snapshot()
        assert snap["completed"] == 3 and snap["rejected"] == 1
    finally:
        gated.release.set()
        srv.close()


def test_malformed_shape_rejected_at_admission(tiny_model):
    """A wrong-shaped pixel array must be rejected in submit() — inside a
    co-batched group it would make np.stack raise and fail every innocent
    neighbor's future."""
    with CaptionServer(tiny_model, max_batch=4, max_delay_ms=30,
                       preprocess=False) as srv:
        with pytest.raises(ValueError, match="56, 56, 3"):
            srv.submit(np.zeros((50, 50, 3), np.float32))
        # a well-formed neighbor still serves normally
        assert isinstance(srv.submit(_img(0)).result(timeout=300), str)


def test_warmup_bucket_beyond_max_batch_raises(tiny_model):
    srv = CaptionServer(tiny_model, max_batch=2, preprocess=False)
    try:
        with pytest.raises(ValueError, match="exceeds max_batch"):
            srv.warmup(buckets=[4])
    finally:
        srv.close()


def test_region_set_accepts_ndarray_bboxes(tiny_model):
    """bboxes as an ndarray (satisfies the documented 'sequence of xyxy
    boxes' contract) must not crash the empty-check with numpy's ambiguous
    truth value."""
    boxes = np.array([[0.1, 0.1, 0.9, 0.9], [0.2, 0.2, 0.8, 0.8]],
                     np.float32)
    with CaptionServer(tiny_model, max_batch=2, max_delay_ms=20,
                       preprocess=False) as srv:
        cap = srv.submit(_img(1), bboxes=boxes,
                         region_set=True).result(timeout=300)
    assert isinstance(cap, str)
    with CaptionServer(tiny_model, max_batch=2, preprocess=False) as srv:
        with pytest.raises(ValueError, match="non-empty"):
            srv.submit(_img(1), bboxes=np.zeros((0, 4), np.float32),
                       region_set=True)
