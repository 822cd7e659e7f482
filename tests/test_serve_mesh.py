"""Multi-chip (data-parallel) serving: `Patchioner.place_on_mesh` +
`CaptionServer(mesh=...)`.

The reference has no inference parallelism at all (SURVEY §2.6: torch-DDP
exists only for decoder training, eval is strictly single-GPU) — dp-sharded
serving is TPU-native upside. The contract under test: placing the model on
a mesh must be INVISIBLE to results — every caption equals the single-device
caption, for any batch size (divisible by the dp size or not), any mode, and
any bucket — while the batch actually shards over the mesh.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj
from patchioner_tpu.parallel.sharding import make_mesh
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


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, mp=1, devices=jax.devices()[:4])


def _imgs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 56, 56, 3)).astype(np.float32)


def _traces(n, seed=0, k=6):
    rng = np.random.default_rng(100 + seed)
    pts = rng.uniform(0.05, 0.95, (n, k, 2)).astype(np.float32)
    valid = np.ones((n, k), np.float32)
    return pts, valid


def _boxes(n, nb=3, seed=0):
    rng = np.random.default_rng(300 + seed)
    x1 = rng.uniform(0.0, 20.0, (n, nb, 1))
    y1 = rng.uniform(0.0, 20.0, (n, nb, 1))
    w = rng.uniform(15.0, 30.0, (n, nb, 2))
    return np.concatenate(
        [x1, y1, x1 + w[..., :1], y1 + w[..., 1:]], axis=-1
    ).astype(np.float32)


def test_trace_fused_matches_single_device(tiny_model, mesh):
    """Divisible batch: per-caption equality + the batch really shards."""
    imgs = _imgs(8)
    pts, valid = _traces(8)
    want = tiny_model.caption_traces_fused(imgs, pts, valid)
    try:
        tiny_model.place_on_mesh(mesh)
        got = tiny_model.caption_traces_fused(imgs, pts, valid)
        placed = tiny_model._placed_fused_state()
        sh = placed["vit"]["cls_token"].sharding
        # replicated over all 4 mesh devices, not resident on one
        assert len(sh.device_set) == 4
        assert sh.spec == P()
        # second call reuses the placed state (no re-transfer)
        assert tiny_model._placed_fused_state() is placed
    finally:
        tiny_model.place_on_mesh(None)
    assert got == want


def test_non_divisible_batch_pads_and_slices(tiny_model, mesh):
    """B=5 over dp=4 pads to 8 inside _dispatch_fused; results and result
    COUNT match the unpadded single-device run."""
    imgs = _imgs(5, seed=1)
    pts, valid = _traces(5, seed=1)
    want = tiny_model.caption_traces_fused(imgs, pts, valid)
    try:
        tiny_model.place_on_mesh(mesh)
        got = tiny_model.caption_traces_fused(imgs, pts, valid)
    finally:
        tiny_model.place_on_mesh(None)
    assert len(got) == 5
    assert got == want


def test_bbox_and_global_modes_on_mesh(tiny_model, mesh):
    """rows_per_image slicing (bbox) and the whole-image program both hold
    under dp sharding, including a non-divisible batch."""
    imgs = _imgs(6, seed=2)
    boxes = _boxes(6, nb=3, seed=2)
    want_bb = tiny_model.caption_bboxes_fused(imgs, boxes)
    want_cls = tiny_model.caption_images_fused(imgs)
    try:
        tiny_model.place_on_mesh(mesh)
        got_bb = tiny_model.caption_bboxes_fused(imgs, boxes)
        got_cls = tiny_model.caption_images_fused(imgs)
    finally:
        tiny_model.place_on_mesh(None)
    assert got_bb == want_bb
    assert [len(r) for r in got_bb] == [3] * 6
    assert got_cls == want_cls


def test_region_set_mode_on_mesh(tiny_model, mesh):
    imgs = _imgs(4, seed=3)
    boxes = _boxes(4, nb=2, seed=3)
    want = tiny_model.caption_region_sets_fused(imgs, boxes)
    try:
        tiny_model.place_on_mesh(mesh)
        got = tiny_model.caption_region_sets_fused(imgs, boxes)
    finally:
        tiny_model.place_on_mesh(None)
    assert got == want


def test_place_on_mesh_validation_and_revert(tiny_model, mesh):
    with pytest.raises(ValueError, match="dp_axis"):
        tiny_model.place_on_mesh(mesh, dp_axis="nope")
    tiny_model.place_on_mesh(mesh)
    assert tiny_model._serve_mesh is not None
    tiny_model.place_on_mesh(None)
    assert tiny_model._serve_mesh is None
    assert tiny_model._placed_state_cache is None


def test_quantized_bank_on_mesh(tiny_model, mesh):
    """The int8 serving-memory lever composes with mesh placement: the
    QuantizedBank state (bank_scale leaf included) replicates and the
    captions equal the single-device quantized run."""
    from patchioner_tpu.ops import memory_projection as mp_ops

    imgs = _imgs(4, seed=9)
    pts, valid = _traces(4, seed=9)
    old_bank = tiny_model.bank
    try:
        tiny_model.bank = mp_ops.quantize_bank(old_bank.rows[: old_bank.num_real])
        want = tiny_model.caption_traces_fused(imgs, pts, valid)
        tiny_model.place_on_mesh(mesh)
        got = tiny_model.caption_traces_fused(imgs, pts, valid)
        placed = tiny_model._placed_fused_state()
        assert "bank_scale" in placed
        assert len(placed["bank_scale"].sharding.device_set) == 4
    finally:
        tiny_model.place_on_mesh(None)
        tiny_model.bank = old_bank
    assert got == want


def test_hot_swap_invalidates_placed_state(tiny_model, mesh):
    """Reassigning bank/decoder/vit_params drops the replicated mesh
    state immediately — no stale serving and no pinned old arrays."""
    try:
        tiny_model.place_on_mesh(mesh)
        tiny_model._placed_fused_state()
        assert tiny_model._placed_state_cache is not None
        tiny_model.bank = tiny_model.bank  # hot-swap is an assignment
        assert tiny_model._placed_state_cache is None
        tiny_model._placed_fused_state()
        tiny_model.decoder = tiny_model.decoder
        assert tiny_model._placed_state_cache is None
        tiny_model._placed_fused_state()
        tiny_model.vit_params = tiny_model.vit_params
        assert tiny_model._placed_state_cache is None
    finally:
        tiny_model.place_on_mesh(None)


def test_server_over_mesh_matches_direct_forward(tiny_model, mesh):
    """End-to-end: the batching server on a 4-device mesh returns the same
    captions as direct single-device forward; the bucket ladder snaps to
    multiples of the dp size."""
    imgs = [_imgs(1, seed=10 + i)[0] for i in range(6)]
    pts, valid = _traces(6, seed=10)
    traces = [[tuple(p) for p in pts[i]] for i in range(6)]
    want = tiny_model.caption_traces_fused(np.stack(imgs), pts, valid)
    try:
        with CaptionServer(tiny_model, max_batch=8, max_delay_ms=40,
                           preprocess=False, mesh=mesh) as srv:
            assert srv.buckets == [4, 8]
            got = srv.caption(imgs, traces, timeout=600)
            assert srv.stats.batches >= 1
    finally:
        tiny_model.place_on_mesh(None)
    assert got == list(want)


def test_server_mesh_two_workers(tiny_model, mesh):
    """mesh placement + workers=2: concurrent workers may race into
    _placed_fused_state (benign — both build valid replicated state);
    results must stay equal to single-device captions."""
    imgs = [_imgs(1, seed=40 + i)[0] for i in range(8)]
    pts, valid = _traces(8, seed=40)
    traces = [[tuple(p) for p in pts[i]] for i in range(8)]
    want = tiny_model.caption_traces_fused(np.stack(imgs), pts, valid)
    try:
        with CaptionServer(tiny_model, max_batch=4, max_delay_ms=10,
                           preprocess=False, workers=2, mesh=mesh) as srv:
            got = srv.caption(imgs, traces, timeout=600)
            assert srv.stats.batches >= 2
    finally:
        tiny_model.place_on_mesh(None)
    assert got == list(want)


def test_server_mesh_max_batch_contract(tiny_model, mesh):
    with pytest.raises(ValueError, match="multiple of the dp size"):
        CaptionServer(tiny_model, max_batch=6, mesh=mesh)
    tiny_model.place_on_mesh(None)


def test_eval_harness_composes_with_mesh(tiny_model, mesh, tmp_path):
    """The trace eval pipeline routes through caption_traces_fused, so a
    mesh-placed model runs the whole REAL harness dp-sharded with byte-
    identical predictions — multi-chip eval needs zero harness changes."""
    import json

    from patchioner_tpu.eval import trace_captioning

    ann = {
        str(i): {
            "captions": [f"ref {i}"],
            "traces": [[{"x": 0.2 + 0.1 * (i % 3), "y": 0.3}]],
        }
        for i in range(5)
    }
    p = tmp_path / "trace_capt_coco_test.json"
    p.write_text(json.dumps(ann))

    def loader(infos):
        rng = np.random.default_rng(7)
        return rng.standard_normal(
            (len(infos), 56, 56, 3)
        ).astype(np.float32)

    kw = dict(batch_size=4, loader=loader)
    want = trace_captioning.evaluate(
        tiny_model, str(p), str(tmp_path), **kw
    )["predictions"]
    try:
        tiny_model.place_on_mesh(mesh)
        got = trace_captioning.evaluate(
            tiny_model, str(p), str(tmp_path), **kw
        )["predictions"]
    finally:
        tiny_model.place_on_mesh(None)
    assert got == want
