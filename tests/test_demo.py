"""Demo HTTP API smoke tests (stdlib server, tiny random model).

Covers the reference's gradio demo surface (demo at repo root of the
reference) as a JSON API: /health, /models, /caption, /caption_trace,
/caption_bboxes, plus error paths.
"""

import base64
import io
import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

import jax

from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def server():
    key = jax.random.PRNGKey(0)
    vit_cfg = vit.ViTConfig(
        img_size=56, patch_size=14, embed_dim=128, depth=2, num_heads=4,
        num_registers=4, extract_heads=4, pos_grid=4,
    )
    gcfg = gpt2.GPT2Config(vocab_size=49408, n_layer=2, n_head=4, n_embd=128)
    k1, k2, k3 = jax.random.split(key, 3)
    model = Patchioner(
        vit_cfg=vit_cfg,
        vit_params=vit.init_vit(k1, vit_cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k2, gcfg, prefix_size=128),
        bank=memproj.prepare_bank(jax.random.normal(k3, (64, 128))),
        bank_texts=[f"caption {i}" for i in range(64)],
        normalize=True,
        config={"dino_model": "tiny-test"},
    )
    from demo.app import make_handler

    httpd = HTTPServer(("127.0.0.1", 0), make_handler(model))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _img_b64():
    rgb = (np.random.default_rng(0).random((60, 70, 3)) * 255).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_models(server):
    code, body = _get(server + "/health")
    assert code == 200 and body["status"] == "ok"
    assert body["model"] == "tiny-test"
    code, body = _get(server + "/models")
    assert code == 200 and body["loaded"] == ["default"]
    code, body = _get(server + "/nope")
    assert code == 404


def test_caption_endpoints(server):
    img = _img_b64()
    code, body = _post(server + "/caption", {"image": img})
    assert code == 200 and isinstance(body["caption"], str)
    # reference Localized-Narratives dict points
    code, body = _post(
        server + "/caption_trace",
        {"image": img,
         "trace": [{"x": 0.1, "y": 0.1}, {"x": 0.5, "y": 0.5}]},
    )
    assert code == 200 and isinstance(body["caption"], str)
    # plain pairs accepted too
    code, body = _post(
        server + "/caption_trace",
        {"image": img, "trace": [[0.1, 0.1], [0.5, 0.5], [0.9, 0.9]]},
    )
    assert code == 200 and isinstance(body["caption"], str)
    code, body = _post(
        server + "/caption_bboxes",
        {"image": img, "bboxes": [[0.0, 0.0, 0.5, 0.5], [0.2, 0.2, 0.9, 0.9]]},
    )
    assert code == 200
    assert len(body["captions"]) == 2


def test_error_paths(server):
    # missing image field -> clean 500 JSON, server stays alive
    code, body = _post(server + "/caption", {})
    assert code == 500 and "error" in body
    # unknown model without --config-dir
    code, body = _post(server + "/caption", {"image": _img_b64(), "model": "x"})
    assert code == 500 and "unknown model" in body["error"]
    # unknown POST endpoint
    code, body = _post(server + "/definitely_not", {"image": _img_b64()})
    assert code == 404
    # server still healthy after the errors
    code, body = _get(server + "/health")
    assert code == 200


def test_strokes_to_traces():
    """Editor stroke layers -> normalized {'x','y','t'} points (reference
    demo/app.py:191-252): scan-order sampling, [0,1] clamping, 0.1*t."""
    from demo.app import strokes_to_traces

    # diagonal RGBA stroke on a 100x100 layer
    layer = np.zeros((100, 100, 4), np.uint8)
    for i in range(0, 100, 2):
        layer[i, i, 3] = 255
    # an empty layer and an RGB layer with a horizontal line
    rgb = np.zeros((50, 200, 3), np.uint8)
    rgb[25, 40:160] = 255
    traces = strokes_to_traces([layer, np.zeros((10, 10, 4), np.uint8), rgb])
    assert len(traces) == 2
    diag = traces[0]
    assert len(diag) == 50
    for p in diag:
        assert abs(p["x"] - p["y"]) < 0.03
        assert 0.0 <= p["x"] <= 1.0
    assert diag[0]["t"] == 0.0 and abs(diag[1]["t"] - 0.1) < 1e-9
    horiz = traces[1]
    assert all(abs(p["y"] - 0.5) < 0.02 for p in horiz)
    assert max(len(t) for t in traces) <= 100
    # the points feed straight into the captioner's trace rasterizer
    from patchioner_tpu.models.patchioner import _traces_to_arrays

    pts, valid = _traces_to_arrays(traces)
    assert pts.shape[0] == 2 and float(valid.sum()) == len(diag) + len(horiz)


@pytest.fixture(scope="module")
def batched_server(server):
    """Same tiny model behind --batch-serve semantics: ThreadingHTTPServer
    + CaptionServer coalescing /caption and /caption_trace."""
    from http.server import ThreadingHTTPServer

    from demo.app import make_handler
    from patchioner_tpu.serve import CaptionServer

    # rebuild the same tiny model the base fixture uses
    key = jax.random.PRNGKey(0)
    vit_cfg = vit.ViTConfig(
        img_size=56, patch_size=14, embed_dim=128, depth=2, num_heads=4,
        num_registers=4, extract_heads=4, pos_grid=4,
    )
    gcfg = gpt2.GPT2Config(vocab_size=49408, n_layer=2, n_head=4, n_embd=128)
    k1, k2, k3 = jax.random.split(key, 3)
    model = Patchioner(
        vit_cfg=vit_cfg,
        vit_params=vit.init_vit(k1, vit_cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k2, gcfg, prefix_size=128),
        bank=memproj.prepare_bank(jax.random.normal(k3, (64, 128))),
        bank_texts=[f"caption {i}" for i in range(64)],
        normalize=True,
        config={"dino_model": "tiny-test"},
    )
    cs = CaptionServer(model, max_batch=4, max_delay_ms=20)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(model, batch_server=cs)
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", cs, server
    httpd.shutdown()
    cs.close()


def test_batched_demo_matches_direct(batched_server):
    """--batch-serve answers == the direct (unbatched) demo answers, and
    concurrent clients actually coalesce into one micro-batch."""
    url, cs, direct_url = batched_server
    img = _img_b64()
    trace = [{"x": 0.1, "y": 0.1}, {"x": 0.5, "y": 0.5}]

    code, direct_cls = _post(direct_url + "/caption", {"image": img})
    assert code == 200
    code, direct_tr = _post(
        direct_url + "/caption_trace", {"image": img, "trace": trace}
    )
    assert code == 200

    code, body = _post(url + "/caption", {"image": img})
    assert code == 200 and body["caption"] == direct_cls["caption"]
    code, body = _post(url + "/caption_trace", {"image": img, "trace": trace})
    assert code == 200 and body["caption"] == direct_tr["caption"]

    # concurrent trace requests through the threaded server coalesce
    b0 = cs.stats.batches
    results = []

    def client():
        results.append(
            _post(url + "/caption_trace", {"image": img, "trace": trace})
        )

    threads = [threading.Thread(target=client) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(c == 200 and b["caption"] == direct_tr["caption"]
               for c, b in results)
    made = cs.stats.batches - b0
    assert made < 4, f"4 concurrent requests made {made} batches (no coalescing)"

    # bboxes route through the server too (fused bbox program); answers
    # must equal the direct path's pixel-xyxy API
    boxes = [[0.0, 0.0, 28.0, 28.0], [14.0, 14.0, 56.0, 56.0]]
    code, direct_bb = _post(
        direct_url + "/caption_bboxes", {"image": img, "bboxes": boxes}
    )
    assert code == 200
    code, body = _post(
        url + "/caption_bboxes", {"image": img, "bboxes": boxes}
    )
    assert code == 200 and body["captions"] == direct_bb["captions"]


def test_stats_endpoint(batched_server):
    url, cs, _ = batched_server
    code, body = _get(url + "/stats")
    assert code == 200
    assert body["requests"] == cs.stats.requests
    # snapshot(): counters + the round-3 telemetry fields
    assert set(body) >= {"requests", "batches", "mean_batch_size", "errors",
                         "queue_depth", "max_queue", "uptime_s",
                         "p50_latency_ms", "p99_latency_ms"}


def test_region_set_endpoint_direct_and_batched(batched_server):
    """/caption_region_set returns ONE caption for the union of the boxes
    on both the direct and --batch-serve paths, and the two agree (the
    batched path round-trips pixel xywh -> normalized xyxy -> pixel xywh)."""
    url, _cs, direct_url = batched_server
    img = _img_b64()
    boxes = [[0.0, 0.0, 28.0, 28.0], [14.0, 14.0, 28.0, 28.0]]  # xywh px
    code, direct = _post(
        direct_url + "/caption_region_set", {"image": img, "bboxes": boxes}
    )
    assert code == 200 and isinstance(direct["caption"], str)
    code, batched = _post(
        url + "/caption_region_set", {"image": img, "bboxes": boxes}
    )
    assert code == 200 and batched["caption"] == direct["caption"]


def test_build_model_accepts_snapshot_dir(tmp_path):
    """demo --config pointed at a save_pretrained directory loads the
    snapshot instead of treating it as YAML."""
    from demo.app import build_model
    from patchioner_tpu.models.patchioner import Patchioner

    m = Patchioner.from_config(
        dict(prefix_size=384, support_memory_size=8,
             dino_model="dinov2_vits14", crop_dim=28,
             projection_type="coco", normalize=True),
        allow_missing_weights=True,
    )
    snap = tmp_path / "snap"
    m.save_pretrained(str(snap))
    m2 = build_model(str(snap), allow_missing_weights=False)
    np.testing.assert_array_equal(
        np.asarray(m.bank.rows), np.asarray(m2.bank.rows)
    )
