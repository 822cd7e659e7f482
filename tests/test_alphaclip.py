"""AlphaCLIP backbone tests: alpha conv math, region batching, orchestration."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import region_pooling as rp


def test_pixel_mask_semantics():
    """Oracle: reference bbox_to_alpha_mask with patch_size=1
    (alpha_mask_utils.py:9-45)."""
    size = 16
    boxes = np.asarray(
        [[2.3, 1.7, 5.0, 3.0], [0, 0, 16, 16], [-1, -1, -1, -1]], np.float32
    )
    got = np.asarray(rp.boxes_to_pixel_masks(jnp.asarray(boxes), size))

    def oracle(bbox):
        m = torch.zeros((size, size))
        x1, y1, w, h = bbox
        x1p = max(0, min(int(x1 // 1), size - 1))
        y1p = max(0, min(int(y1 // 1), size - 1))
        x2p = max(0, min(int((x1 + w) // 1), size))
        y2p = max(0, min(int((y1 + h) // 1), size))
        if x2p > x1p and y2p > y1p:
            m[y1p:y2p, x1p:x2p] = 1.0
        return m.numpy()

    np.testing.assert_array_equal(got[0], oracle(boxes[0]))
    np.testing.assert_array_equal(got[1], oracle(boxes[1]))
    assert got[2].sum() == 0  # dummy box -> empty mask


def test_alpha_conv_changes_features():
    cfg = clip_mod.ClipVisionConfig(img_size=32, patch_size=16, width=64,
                                    depth=2, heads=4, proj_dim=48)
    params = clip_mod.init_clip_vision(jax.random.PRNGKey(0), cfg)
    params["alpha_embed_w"] = clip_mod.init_alpha_embed(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    ones = jnp.ones((1, 32, 32, 1))
    zeros = jnp.zeros((1, 32, 32, 1))
    a = clip_mod.clip_visual_forward(params, x, cfg, alpha=ones)
    b = clip_mod.clip_visual_forward(params, x, cfg, alpha=zeros)
    c = clip_mod.clip_visual_forward(params, x, cfg)  # no alpha
    assert not np.allclose(np.asarray(a["x_norm_clstoken"]),
                           np.asarray(b["x_norm_clstoken"]))
    np.testing.assert_allclose(np.asarray(b["x_norm_clstoken"]),
                               np.asarray(c["x_norm_clstoken"]), rtol=1e-5)


def test_openai_layout_port_matches_hf():
    """Build openai-layout keys from an HF CLIPModel and check both porters
    produce identical params."""
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={"hidden_size": 64, "num_hidden_layers": 1,
                     "num_attention_heads": 4, "intermediate_size": 256},
        vision_config={"hidden_size": 64, "num_hidden_layers": 2,
                       "num_attention_heads": 4, "intermediate_size": 256,
                       "image_size": 32, "patch_size": 16},
        projection_dim=48,
    )
    torch.manual_seed(0)
    hf = CLIPModel(cfg).eval()
    sd = hf.state_dict()
    openai = {
        "visual.conv1.weight": sd["vision_model.embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": sd[
            "vision_model.embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": sd["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": sd["vision_model.post_layernorm.bias"],
        "visual.proj": sd["visual_projection.weight"].T,
    }
    for i in range(2):
        p, q = f"visual.transformer.resblocks.{i}", f"vision_model.encoder.layers.{i}"
        openai[f"{p}.attn.in_proj_weight"] = torch.cat([
            sd[f"{q}.self_attn.q_proj.weight"],
            sd[f"{q}.self_attn.k_proj.weight"],
            sd[f"{q}.self_attn.v_proj.weight"]])
        openai[f"{p}.attn.in_proj_bias"] = torch.cat([
            sd[f"{q}.self_attn.q_proj.bias"],
            sd[f"{q}.self_attn.k_proj.bias"],
            sd[f"{q}.self_attn.v_proj.bias"]])
        openai[f"{p}.attn.out_proj.weight"] = sd[f"{q}.self_attn.out_proj.weight"]
        openai[f"{p}.attn.out_proj.bias"] = sd[f"{q}.self_attn.out_proj.bias"]
        openai[f"{p}.ln_1.weight"] = sd[f"{q}.layer_norm1.weight"]
        openai[f"{p}.ln_1.bias"] = sd[f"{q}.layer_norm1.bias"]
        openai[f"{p}.ln_2.weight"] = sd[f"{q}.layer_norm2.weight"]
        openai[f"{p}.ln_2.bias"] = sd[f"{q}.layer_norm2.bias"]
        openai[f"{p}.mlp.c_fc.weight"] = sd[f"{q}.mlp.fc1.weight"]
        openai[f"{p}.mlp.c_fc.bias"] = sd[f"{q}.mlp.fc1.bias"]
        openai[f"{p}.mlp.c_proj.weight"] = sd[f"{q}.mlp.fc2.weight"]
        openai[f"{p}.mlp.c_proj.bias"] = sd[f"{q}.mlp.fc2.bias"]
    a = clip_mod.port_openai_clip_vision(openai, 2)
    b = clip_mod.port_hf_clip_vision(sd, 2)
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(x, y, rtol=1e-6)


@pytest.fixture(scope="module")
def alphaclip_model():
    cfg = dict(
        prefix_size=48, support_memory_size=100,
        alphaclip_config={"name": "ViT-B/16", "embed_dim": 48,
                          "patch_size": 16},
        dino_model="alphaclip_vitb", clip_model_name="ViT-B/16",
        normalize=True, crop_dim=32, projection_type="coco",
    )
    # shrink towers for test speed
    model = Patchioner.from_config(cfg, allow_missing_weights=True,
                                   random_bank_size=64)
    return model


def test_alphaclip_region_forward(alphaclip_model):
    m = alphaclip_model
    assert m.backbone_type == "AlphaClip"
    imgs = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    boxes = np.asarray(
        [[[0, 0, 16, 16], [-1, -1, -1, -1]], [[8, 8, 16, 16], [0, 0, 32, 32]]],
        np.float32,
    )
    outs = m.forward(imgs, get_cls_capt=False, bboxes=boxes,
                     compute_scores=True, return_n_best_sims=2)
    assert outs["bbox_capts"][0][1] == ""  # dummy box
    assert outs["bbox_scores"][0][1] == 0.0
    assert outs["bbox_sims"][0][1] == []
    assert isinstance(outs["bbox_capts"][1][0], str)
    # different regions give different captions... at minimum valid structure
    assert len(outs["bbox_capts"]) == 2 and len(outs["bbox_capts"][0]) == 2

    # controllable: one caption per image from OR-merged masks
    outs2 = m.forward(imgs, get_cls_capt=False, bboxes=boxes,
                      get_controllable_capts=True)
    assert len(outs2["set_controllable_capts"]) == 2

    # traces
    traces = [[{"x": 0.2, "y": 0.2}], [{"x": 0.7, "y": 0.7}]]
    outs3 = m.forward(imgs, get_cls_capt=False, traces=traces)
    assert len(outs3["trace_capts"]) == 2


def test_alphaclip_region_uint8_matches_float(alphaclip_model):
    """The AlphaCLIP region path bypasses encode_images, so it must apply
    the same device-side uint8 normalization contract — the eval loaders
    ship un-normalized uint8 (transforms.preprocess_pil_uint8) into
    forward(bboxes=...)."""
    from patchioner_tpu.utils import transforms as T

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0 - T.IMAGENET_MEAN)
           / T.IMAGENET_STD).astype(np.float32)
    boxes = np.asarray(
        [[[0, 0, 16, 16], [-1, -1, -1, -1]],
         [[8, 8, 16, 16], [0, 0, 32, 32]]], np.float32)
    a = alphaclip_model.forward(f32, get_cls_capt=False, bboxes=boxes)
    b = alphaclip_model.forward(u8, get_cls_capt=False, bboxes=boxes)
    assert a["bbox_capts"] == b["bbox_capts"]


def test_alphaclip_whole_image(alphaclip_model):
    imgs = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    outs = alphaclip_model.forward(imgs, get_cls_capt=True)
    assert len(outs["cls_capt"]) == 2


def test_alphaclip_trace_scores_and_pixel_masks(alphaclip_model):
    """Round-3c parity additions: the trace branch emits trace_scores
    under compute_scores (reference src/model.py:1270-1282), and trace
    alpha masks rasterize at PIXEL resolution (grid_size=crop_dim,
    patch_size=1 — single-pixel dots, :1084-1086), so two traces landing
    in the SAME patch but different pixels produce different captions'
    features (the old patch-block masks couldn't tell them apart)."""
    m = alphaclip_model
    imgs = np.random.default_rng(2).standard_normal((1, 32, 32, 3)).astype(
        np.float32)
    tr_a = [[(0.10, 0.10), (0.20, 0.20)]]   # pixels (3,3)-(6,6), patch (0,0)
    tr_b = [[(0.05, 0.05), (0.28, 0.28)]]   # same patches, other pixels
    outs = m.forward(imgs, get_cls_capt=False, traces=tr_a,
                     compute_scores=True)
    assert len(outs["trace_capts"]) == 1
    assert len(outs["trace_scores"]) == 1 and np.isfinite(
        outs["trace_scores"][0])

    from patchioner_tpu.models.patchioner import _traces_to_arrays
    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.ops import region_pooling as rp
    import jax.numpy as jnp

    def feats_for(tr):
        pts, valid = _traces_to_arrays(tr)
        mask = (rp.traces_to_grid(jnp.asarray(pts), jnp.asarray(valid), 32)
                > 0).astype(jnp.float32)
        return np.asarray(clip_mod.clip_visual_forward(
            m.vit_params, jnp.asarray(imgs), m.vit_cfg,
            alpha=mask[..., None])["x_norm_clstoken"])

    fa, fb = feats_for(tr_a), feats_for(tr_b)
    assert np.abs(fa - fb).max() > 1e-6, (
        "pixel-resolution masks must distinguish same-patch traces"
    )
