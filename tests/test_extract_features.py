"""CLI coverage for train/extract_features — the feature/bank pre-extraction
entry point (reference: src/clipcap/clipcap_dino_parse_coco.py and the bank
building loop in src/decap/im2txtprojection/im2txtprojection.py:448-560).

All three modes run end to end at tiny shapes on CPU with seeded random
towers (--allow-random): `text` (corpus -> aligned .npy), `bank` (corpus ->
HDF5 with the reference filename scheme, reload-checked), `image`
(folder -> selected backbone token per image).
"""

import json
import os

import numpy as np
import pytest
import torch
import yaml

from patchioner_tpu.io import memory_bank as mb
from patchioner_tpu.train import extract_features, text_spaces


@pytest.fixture()
def corpus(tmp_path):
    caps = [f"a photo of object {i} on a table" for i in range(10)]
    path = tmp_path / "corpus.json"
    path.write_text(json.dumps(
        {"annotations": [
            {"caption": c, "image_id": i} for i, c in enumerate(caps)
        ]}
    ))
    return str(path), caps


def test_text_mode_writes_aligned_features(tmp_path, corpus):
    path, caps = corpus
    out = str(tmp_path / "feats.npy")
    extract_features.main([
        "text", "--data", path, "--out", out, "--allow-random", "--bs", "4",
    ])
    feats = np.load(out)
    assert feats.shape == (len(caps), 512) and feats.dtype == np.float32
    assert np.isfinite(feats).all()
    # alignment: row i is the encoding of caption i (batching must not
    # reorder), checked against a direct same-seed space encode
    space = text_spaces.build_text_space("clip", None)
    want = space.encode_texts(caps, batch_size=len(caps))
    np.testing.assert_allclose(feats, want, rtol=2e-4, atol=2e-4)


def test_text_mode_talk2dino_projection(tmp_path, corpus):
    path, caps = corpus
    g = torch.Generator().manual_seed(3)
    sd = {
        "linear_layer.weight": torch.randn(48, 512, generator=g),
        "linear_layer.bias": torch.randn(48, generator=g),
        "hidden_layers.0.weight": torch.randn(48, 48, generator=g) * 0.1,
        "hidden_layers.0.bias": torch.randn(48, generator=g) * 0.1,
    }
    w = str(tmp_path / "t2d.pth")
    torch.save(sd, w)
    out = str(tmp_path / "feats_t2d.npy")
    extract_features.main([
        "text", "--data", path, "--out", out, "--allow-random",
        "--talk2dino", w, "--bs", "4",
    ])
    feats = np.load(out)
    # projected into the (tiny) Talk2DINO output space
    assert feats.shape == (len(caps), 48) and np.isfinite(feats).all()


def test_bank_mode_reference_filename_and_reload(tmp_path, corpus):
    path, caps = corpus
    extract_features.main([
        "bank", "--data", path, "--size", "8", "--seed", "0",
        "--bank-dir", str(tmp_path), "--allow-random", "--bs", "4",
    ])
    # no --talk2dino -> the clip-prefixed filename branch
    # (im2txtprojection.py filename scheme)
    fname, dataset = mb.bank_filename(
        "coco", support_memory_size=8, use_talk2dino=False)
    assert fname.startswith("clip-")
    bank_path = os.path.join(str(tmp_path), fname)
    assert os.path.exists(bank_path), os.listdir(str(tmp_path))
    bank = mb.load_bank(bank_path, dataset)
    assert bank.embeddings.shape == (8, 512)
    assert len(bank.texts) == 8 and set(bank.texts) <= set(caps)
    # embeddings correspond row-wise to the stored texts
    space = text_spaces.build_text_space("clip", None)
    want = space.encode_texts_for_bank(list(bank.texts), batch_size=8)
    np.testing.assert_allclose(bank.embeddings, want, rtol=2e-4, atol=2e-4)
    # seeded sample draw is reproducible
    assert bank.texts == mb.load_caption_corpus(path, 8, sample=True, seed=0)


def test_bank_mode_explicit_out(tmp_path, corpus):
    path, _ = corpus
    out = str(tmp_path / "mybank.h5")
    extract_features.main([
        "bank", "--data", path, "--size", "6", "--no-sample",
        "--out", out, "--allow-random", "--bs", "3",
    ])
    bank = mb.load_bank(out, "coco_captions")
    assert bank.embeddings.shape == (6, 512)


def test_image_mode_selected_tokens(tmp_path, monkeypatch):
    from PIL import Image

    from patchioner_tpu.models import vit

    # depth-2 ViT-B at 56px: exercises the real from_config dispatch path
    # without 12 CPU layers (same trick as the giant orchestrator test)
    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    cfg = {
        "decap_weights": "/nonexistent/decap.pt",
        "prefix_size": 768,
        "support_memory_size": 16,
        "dino_model": "dinov2_vitb14_reg",
        "crop_dim": 56,
        "normalize": True,
        "projection_type": "coco",
    }
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ["b.jpg", "a.png", "c.jpeg"]:
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        ).save(img_dir / name)

    out = str(tmp_path / "img_feats.npy")
    extract_features.main([
        "image", "--config", str(cfg_path), "--images", str(img_dir),
        "--out", out, "--select", "cls", "--bs", "2", "--allow-random",
    ])
    feats = np.load(out)
    assert feats.shape == (3, 768) and np.isfinite(feats).all()
    names = json.load(open(out + ".names.json"))
    assert names == ["a.png", "b.jpg", "c.jpeg"]  # sorted order

    # avg_self_attn pooling differs from cls and stays finite
    out2 = str(tmp_path / "img_feats_attn.npy")
    extract_features.main([
        "image", "--config", str(cfg_path), "--images", str(img_dir),
        "--out", out2, "--select", "avg_self_attn", "--bs", "2",
        "--allow-random",
    ])
    feats2 = np.load(out2)
    assert feats2.shape == (3, 768) and np.isfinite(feats2).all()
    assert not np.allclose(feats2, feats)
