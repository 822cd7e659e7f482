"""Interactive captioning demo.

Reference: demo/app.py — a Gradio UI for whole-image / trace / bbox
captioning with model hot-swap. Gradio isn't in this image, so the default
surface is a dependency-free HTTP JSON API (stdlib http.server) exposing the
same three capabilities; when gradio IS importable the same handlers power a
gradio UI (`--ui`).

Run:  python demo/app.py --config configs/mlp.k.yaml [--port 7860]
      [--config-dir configs/]   # enables model hot-swap
API:
  POST /caption           {"image": <base64 jpg/png>[, "model": name]} -> cls caption
  POST /caption_trace     {"image": ..., "trace": [{"x","y"},..]} -> trace caption
  POST /caption_bboxes    {"image": ..., "bboxes": [[x,y,w,h],..]} -> per-box
  POST /caption_region_set {"image": ..., "bboxes": [[x,y,w,h],..]} -> ONE
                          caption for the union of the boxes (controllable)
  GET  /health | /models

Model hot-swap (the reference demo's config dropdown, demo/app.py:108-145):
pass --config-dir; requests with {"model": "<config-stem>"} lazily build and
cache that model.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def strokes_to_traces(layers, max_points: int = 100):
    """Convert editor stroke layers to normalized trace points.

    Mirrors the reference demo's ImageEditor handling (demo/app.py:191-252):
    each layer (PIL image or array, RGBA alpha>0 = drawn, RGB any>0) yields
    one trace of <= `max_points` evenly sampled scan-order pixels as
    {'x','y','t'} dicts with x/y in [0,1] and t = 0.1*index.
    """
    traces = []
    for layer in layers:
        arr = np.asarray(layer)
        if arr.ndim != 3 or arr.size == 0:
            continue
        if arr.shape[2] == 4:
            drawn = arr[:, :, 3] > 0
        else:
            drawn = np.any(arr > 0, axis=2)
        ys, xs = np.where(drawn)
        if len(xs) == 0:
            continue
        h, w = arr.shape[:2]
        n = min(len(xs), max_points)
        idx = np.linspace(0, len(xs) - 1, n, dtype=int)
        pts = [
            {
                "x": min(1.0, max(0.0, float(x) / w if w else 0.0)),
                "y": min(1.0, max(0.0, float(y) / h if h else 0.0)),
                "t": i * 0.1,
            }
            for i, (x, y) in enumerate(zip(xs[idx], ys[idx]))
        ]
        traces.append(pts)
    return traces


def build_model(config_path: str, allow_missing_weights: bool):
    sys.path.insert(0, ".")
    from patchioner_tpu.models.patchioner import Patchioner

    # a save_pretrained snapshot directory restores without the source
    # torch/HDF5 artifacts; anything else goes through the YAML/dict path
    if os.path.isdir(config_path) and os.path.exists(
        os.path.join(config_path, "state.msgpack")
    ):
        return Patchioner.load_pretrained(config_path)
    return Patchioner.from_config(
        config_path, allow_missing_weights=allow_missing_weights
    )


def _decode_image(b64: str, model):
    from PIL import Image

    from patchioner_tpu.utils import transforms

    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    # uint8 contract: the model normalizes on device with ITS OWN
    # image_mean/image_std (encode_images) — host-side preprocess_pil
    # defaults would bake ImageNet stats into a model configured with CLIP
    # stats, silently diverging from the batch-serve path.
    return transforms.preprocess_pil_uint8(
        img, model.resize_dim, model.crop_dim
    )[None]


def make_handler(model, config_dir=None, allow_missing_weights=False,
                 batch_server=None):
    """`batch_server`: an optional `patchioner_tpu.serve.CaptionServer`
    wrapping the default model — /caption, /caption_trace,
    /caption_bboxes, and /caption_region_set requests for it are then
    coalesced into micro-batches across concurrent HTTP clients (run the
    HTTP side threaded, e.g. ThreadingHTTPServer, so requests can
    actually arrive concurrently). Hot-swapped models, and bbox requests
    with more boxes than the server's fixed-shape `max_boxes` contract,
    keep the direct path."""
    models = {"default": model}
    # under ThreadingHTTPServer (--batch-serve) handlers run concurrently:
    # serialize cache mutation so two first requests for the same model
    # don't both pay a multi-minute build, and so /models can snapshot the
    # dict without racing an insert
    models_lock = threading.Lock()

    def resolve(name):
        if name is None or name == "default":
            return models["default"]
        with models_lock:
            if name not in models:
                if config_dir is None:
                    raise KeyError(f"unknown model '{name}' (no --config-dir)")
                import os as _os

                path = _os.path.join(config_dir, f"{name}.yaml")
                if not _os.path.exists(path):
                    raise KeyError(f"no config {path}")
                models[name] = build_model(path, allow_missing_weights)
            return models[name]

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok", "model": model.config.get(
                    "dino_model", "unknown")})
            elif self.path == "/models":
                import glob as _glob
                import os as _os

                available = sorted(
                    _os.path.splitext(_os.path.basename(c))[0]
                    for c in _glob.glob(_os.path.join(config_dir or "", "*.yaml"))
                ) if config_dir else []
                with models_lock:
                    loaded = sorted(models)
                self._reply(200, {"loaded": loaded,
                                  "available": available})
            elif self.path == "/stats" and batch_server is not None:
                self._reply(200, batch_server.snapshot())
            else:
                self._reply(404, {"error": "unknown endpoint"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                serve_paths = ("/caption", "/caption_trace",
                               "/caption_bboxes", "/caption_region_set")
                if (batch_server is not None
                        and req.get("model") in (None, "default")
                        and self.path in serve_paths
                        # boxes/trace points beyond the server's
                        # fixed-shape contract fall back to the direct
                        # path below (the server would silently slice a
                        # long trace to its first trace_points points)
                        and len(req.get("bboxes") or [])
                        <= batch_server.max_boxes
                        and len(req.get("trace") or [])
                        <= batch_server.trace_points):
                    from PIL import Image

                    pil = Image.open(io.BytesIO(base64.b64decode(req["image"])))
                    if self.path in ("/caption_bboxes",
                                     "/caption_region_set"):
                        # API boxes are pixel [x1, y1, w, h] in the
                        # model's square frame (forward's convention);
                        # the server contract is normalized [0,1] xyxy
                        d = float(batch_server.model.crop_dim)
                        norm = [
                            [b[0] / d, b[1] / d,
                             (b[0] + b[2]) / d, (b[1] + b[3]) / d]
                            for b in req["bboxes"]
                        ]
                        if self.path == "/caption_region_set":
                            cap = batch_server.submit(
                                pil, bboxes=norm, region_set=True
                            ).result(timeout=600)
                            self._reply(200, {"caption": cap})
                            return
                        caps = batch_server.submit(
                            pil, bboxes=norm).result(timeout=600)
                        self._reply(200, {"captions": caps})
                        return
                    trace = (req["trace"] if self.path == "/caption_trace"
                             else None)
                    cap = batch_server.submit(pil, trace).result(timeout=600)
                    self._reply(200, {"caption": cap})
                    return
                m = resolve(req.get("model"))
                imgs = _decode_image(req["image"], m)
                if self.path == "/caption":
                    outs = m.forward(imgs, get_cls_capt=True)
                    self._reply(200, {"caption": outs["cls_capt"][0]})
                elif self.path == "/caption_trace":
                    outs = m.forward(
                        imgs, get_cls_capt=False, traces=[req["trace"]]
                    )
                    self._reply(200, {"caption": outs["trace_capts"][0]})
                elif self.path == "/caption_bboxes":
                    boxes = np.asarray([req["bboxes"]], np.float32)
                    outs = m.forward(imgs, get_cls_capt=False, bboxes=boxes)
                    self._reply(200, {"captions": outs["bbox_capts"][0]})
                elif self.path == "/caption_region_set":
                    # one caption for the union of the boxes (the
                    # reference's controllable mode, src/model.py:1042-1047)
                    boxes = np.asarray([req["bboxes"]], np.float32)
                    outs = m.forward(
                        imgs, get_cls_capt=False, bboxes=boxes,
                        get_controllable_capts=True,
                    )
                    self._reply(
                        200, {"caption": outs["set_controllable_capts"][0]}
                    )
                else:
                    self._reply(404, {"error": "unknown endpoint"})
            except Exception as e:  # surface errors to the client
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True,
                   help="model YAML/dict path, or a save_pretrained "
                        "snapshot directory")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--allow-missing-weights", action="store_true")
    p.add_argument("--config-dir", default=None,
                   help="enable per-request model hot-swap from this dir")
    p.add_argument("--ui", action="store_true", help="gradio UI if available")
    p.add_argument("--batch-serve", action="store_true",
                   help="coalesce concurrent /caption and /caption_trace "
                        "requests into micro-batches (serve.CaptionServer)")
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-delay-ms", type=float, default=10.0)
    p.add_argument("--mesh-dp", type=int, default=0,
                   help="with --batch-serve: serve data-parallel over this "
                        "many devices (a dp mesh; 0 = single device)")
    args = p.parse_args(argv)
    from patchioner_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # demo restarts must not re-pay flagship compiles
    model = build_model(args.config, args.allow_missing_weights)

    if args.ui:
        try:
            import gradio as gr
        except ImportError:
            print("gradio not installed — falling back to the HTTP API")
        else:
            def caption(editor_data):
                # ImageEditor payload: background image + stroke layers
                # (reference demo/app.py:148-258): strokes -> trace
                # caption, no strokes -> whole-image caption.
                from patchioner_tpu.utils import transforms

                img = editor_data["background"]
                # uint8: device-side normalization with the model's stats
                x = transforms.preprocess_pil_uint8(
                    img, model.resize_dim, model.crop_dim
                )[None]
                traces = strokes_to_traces(editor_data.get("layers") or [])
                if traces:
                    out = model.forward(x, get_cls_capt=False, traces=traces[:1])
                    return out["trace_capts"][0]
                return model.forward(x, get_cls_capt=True)["cls_capt"][0]

            gr.Interface(
                caption,
                gr.ImageEditor(type="pil"),
                "text",
                description="Draw a trace on the image (or leave it blank "
                            "for a whole-image caption).",
            ).launch(server_port=args.port)
            return

    batch_server = None
    server_cls = HTTPServer
    if args.batch_serve:
        from http.server import ThreadingHTTPServer

        from patchioner_tpu.serve import CaptionServer

        mesh = None
        if args.mesh_dp:
            import jax

            from patchioner_tpu.parallel.sharding import make_mesh

            mesh = make_mesh(
                dp=args.mesh_dp, mp=1,
                devices=jax.devices()[: args.mesh_dp],
            )
        batch_server = CaptionServer(
            model, max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
            mesh=mesh,
        )
        # pre-compile the bucket programs at startup — without this the
        # first live request per (bucket, mode) pays a full XLA compile
        # (minutes at flagship scale) inside its 600 s future timeout
        print("warming up serving buckets (pre-compiling)...")
        batch_server.warmup(trace=True, cls=True, bbox=True,
                            region_set=True)
        server_cls = ThreadingHTTPServer  # concurrent requests can coalesce
    server = server_cls(
        ("0.0.0.0", args.port),
        make_handler(model, args.config_dir, args.allow_missing_weights,
                     batch_server=batch_server),
    )
    print(f"patchioner-tpu demo listening on :{args.port}"
          + (" (batch serving)" if batch_server else ""))
    server.serve_forever()


if __name__ == "__main__":
    main()
