"""Native snapshot round-trip: save_pretrained / load_pretrained.

The reference has no model persistence of its own — every load re-ports
torch checkpoints + HDF5 banks (src/model.py:666-715). The snapshot is a
self-contained directory (config.json + state.msgpack + meta.json) that
restores the BUILT model bit-for-bit without those source artifacts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.models.patchioner import Patchioner


def _build(tmp_path, **extra):
    cfg = dict(prefix_size=384, support_memory_size=24,
               dino_model="dinov2_vits14", crop_dim=28,
               projection_type="coco", normalize=True,
               calculate_argmax_text=True, **extra)
    return Patchioner.from_config(cfg, allow_missing_weights=True)


def _imgs():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 28, 28, 3)), jnp.float32
    )


def test_snapshot_roundtrip_core(tmp_path):
    m = _build(tmp_path)
    snap = tmp_path / "snap"
    m.save_pretrained(str(snap))
    assert (snap / "config.json").exists()
    assert (snap / "state.msgpack").exists()

    m2 = Patchioner.load_pretrained(str(snap))
    # every array restored exactly
    for a, b in zip(jax.tree_util.tree_leaves(m._snapshot_tree()),
                    jax.tree_util.tree_leaves(m2._snapshot_tree())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m2.bank.num_real == m.bank.num_real
    assert m2.bank_texts == m.bank_texts
    # captions identical (the bank placeholder was fully replaced)
    imgs = _imgs()
    r1 = m.forward(imgs, get_cls_capt=True, get_avg_self_attn_capt=True)
    r2 = m2.forward(imgs, get_cls_capt=True, get_avg_self_attn_capt=True)
    assert r1["cls_capt"] == r2["cls_capt"]
    assert r1["avg_self_attn_capt"] == r2["avg_self_attn_capt"]


def test_snapshot_roundtrip_int8_bank(tmp_path):
    m = _build(tmp_path, memory_bank_int8=True)
    from patchioner_tpu.ops import memory_projection as memproj

    assert isinstance(m.bank, memproj.QuantizedBank)
    snap = tmp_path / "snap8"
    m.save_pretrained(str(snap))
    m2 = Patchioner.load_pretrained(str(snap))
    assert isinstance(m2.bank, memproj.QuantizedBank)
    assert m2.bank.rows.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(m.bank.rows),
                                  np.asarray(m2.bank.rows))
    np.testing.assert_array_equal(np.asarray(m.bank.scale),
                                  np.asarray(m2.bank.scale))
    imgs = _imgs()
    assert (m.forward(imgs, get_cls_capt=True)["cls_capt"]
            == m2.forward(imgs, get_cls_capt=True)["cls_capt"])


def test_snapshot_bf16_bank_dtype_survives(tmp_path):
    m = Patchioner.from_config(
        dict(prefix_size=384, support_memory_size=16,
             dino_model="dinov2_vits14", crop_dim=28,
             projection_type="coco", normalize=True),
        allow_missing_weights=True, dtype=jnp.bfloat16,
    )
    assert m.bank.rows.dtype == jnp.bfloat16
    import tempfile

    with tempfile.TemporaryDirectory() as snap:
        m.save_pretrained(snap)
        m2 = Patchioner.load_pretrained(snap, dtype=jnp.bfloat16)
    assert m2.bank.rows.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(m.bank.rows, np.float32),
        np.asarray(m2.bank.rows, np.float32),
    )


def test_snapshot_w8a8_encoder(tmp_path):
    """encoder_w8a8 builds int8 vit weights; the snapshot must carry the
    int8 + scale leaves and restore the quantized structure."""
    m = _build(tmp_path, encoder_w8a8=True)
    assert m.vit_params["blocks"][0]["qkv"]["w_q"].dtype == jnp.int8
    snap = tmp_path / "snap_w8"
    m.save_pretrained(str(snap))
    m2 = Patchioner.load_pretrained(str(snap))
    blk, blk2 = m.vit_params["blocks"][0], m2.vit_params["blocks"][0]
    assert blk2["qkv"]["w_q"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(blk["qkv"]["w_q"]),
                                  np.asarray(blk2["qkv"]["w_q"]))
    np.testing.assert_array_equal(np.asarray(blk["qkv"]["w_scale"]),
                                  np.asarray(blk2["qkv"]["w_scale"]))
    imgs = _imgs()
    assert (m.forward(imgs, get_cls_capt=True)["cls_capt"]
            == m2.forward(imgs, get_cls_capt=True)["cls_capt"])


def test_serve_from_snapshot(tmp_path):
    """A load_pretrained model serves identically to the original through
    the CaptionServer path."""
    from patchioner_tpu.serve import CaptionServer

    m = _build(tmp_path)
    snap = tmp_path / "snap_serve"
    m.save_pretrained(str(snap))
    m2 = Patchioner.load_pretrained(str(snap))
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(1).random((40, 50, 3)) * 255).astype(np.uint8)
    )
    with CaptionServer(m, max_batch=4) as s1, \
            CaptionServer(m2, max_batch=4) as s2:
        c1 = s1.submit(img).result()
        c2 = s2.submit(img).result()
    assert c1 == c2
