"""Double-DINO bbox mode: key-masked batched rerun == compact per-box rerun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj


@pytest.fixture(scope="module")
def setup():
    cfg = vit.ViTConfig(img_size=70, patch_size=14, embed_dim=64, depth=2,
                        num_heads=4, num_registers=4, extract_heads=4,
                        pos_grid=5)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    gcfg = gpt2.GPT2Config(vocab_size=300, n_layer=1, n_head=2, n_embd=64)
    model = Patchioner(
        vit_cfg=cfg,
        vit_params=params,
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(jax.random.PRNGKey(1), gcfg, prefix_size=64),
        bank=memproj.prepare_bank(jax.random.normal(jax.random.PRNGKey(2), (64, 64))),
        bank_texts=None,
    )
    imgs = np.random.default_rng(0).standard_normal((2, 70, 70, 3)).astype(np.float32)
    return model, cfg, params, imgs


def compact_rerun_oracle(model, cfg, params, enc, box, img_idx, use_cls):
    """Reference-style compact token list through the same last block."""
    g = cfg.grid_size
    d = cfg.embed_dim
    gb = np.floor(np.asarray(box) / cfg.patch_size).astype(int)
    x1, y1, x2, y2 = gb
    patches = np.asarray(enc["x_norm_patchtokens"][img_idx]).reshape(g, g, d)
    region = patches[y1 : y2 + 1, x1 : x2 + 1].reshape(1, -1, d)
    toks = [region]
    if use_cls:
        regs = np.asarray(enc["x_norm_regtokens"][img_idx])[None]
        cls = np.asarray(enc["x_norm_clstoken"][img_idx]).reshape(1, 1, d)
        toks = [cls, regs, region]
    inp = jnp.asarray(np.concatenate(toks, axis=1))
    out = vit.last_block_rerun(
        params, inp, jnp.ones(inp.shape[:2], bool), cfg
    )
    return np.asarray(out[0])


@pytest.mark.parametrize("use_cls,return_type", [
    (True, "cls"), (True, "avg"), (False, "avg"), (True, "gaussian_avg"),
])
def test_double_dino_matches_compact(setup, use_cls, return_type):
    model, cfg, params, imgs = setup
    enc = model.encode_images(imgs)
    # Boxes in the quirk layout: elements read as [x1, y1, x2, y2] pixels.
    boxes = np.asarray(
        [[[0, 0, 28, 42], [14, 14, 56, 56]], [[0, 14, 42, 28], [28, 0, 69, 69]]],
        np.float32,
    )
    got = np.asarray(
        model._double_dino_features(
            enc, jnp.asarray(boxes), return_type=return_type, use_cls=use_cls,
            gaussian_bbox_variance=0.5,
        )
    )
    ng = cfg.num_global_tokens
    for i in range(2):
        for j in range(2):
            out = compact_rerun_oracle(
                model, cfg, params, enc, boxes[i, j], i, use_cls
            )
            offset = ng if use_cls else 0
            if return_type == "cls":
                want = out[0]
            elif return_type == "avg":
                want = out[offset:].mean(axis=0)
            else:  # gaussian_avg weights the INPUT patches (reference quirk)
                gb = np.floor(boxes[i, j] / cfg.patch_size).astype(int)
                x1, y1, x2, y2 = gb
                g = cfg.grid_size
                patches = np.asarray(enc["x_norm_patchtokens"][i]).reshape(
                    g, g, -1)
                region = patches[y1 : y2 + 1, x1 : x2 + 1]
                hs, ws = region.shape[:2]
                yc = np.linspace(-1, 1, hs) if hs > 1 else np.asarray([-1.0])
                xc = np.linspace(-1, 1, ws) if ws > 1 else np.asarray([-1.0])
                dist = yc[:, None] ** 2 + xc[None, :] ** 2
                w = np.exp(-dist / 0.5)
                w = w / w.sum()
                want = (region * w[..., None]).sum(axis=(0, 1))
            np.testing.assert_allclose(got[i, j], want, rtol=2e-4, atol=2e-4)


def test_double_dino_through_forward(setup):
    model, cfg, params, imgs = setup
    boxes = np.asarray([[[0, 0, 28, 42]], [[14, 14, 56, 56]]], np.float32)
    outs = model.forward(
        imgs, get_cls_capt=False, bboxes=boxes, double_DINO_for_bboxes=True,
        double_DINO_for_bboxes_return_type="avg", double_DINO_use_cls=True,
    )
    assert len(outs["bbox_capts"]) == 2 and len(outs["bbox_capts"][0]) == 1
