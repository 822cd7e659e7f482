"""Integration tests for the Patchioner orchestrator (tiny shapes, CPU)."""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from patchioner_tpu.models import decap, gpt2, vit
from patchioner_tpu.models.patchioner import Patchioner
from patchioner_tpu.ops import memory_projection as memproj


@pytest.fixture(scope="module")
def tiny_model():
    key = jax.random.PRNGKey(0)
    vit_cfg = vit.ViTConfig(
        img_size=56,
        patch_size=14,
        embed_dim=128,
        depth=2,
        num_heads=4,
        num_registers=4,
        extract_heads=4,
        pos_grid=4,
    )
    gcfg = gpt2.GPT2Config(vocab_size=49408, n_layer=2, n_head=4, n_embd=128)
    k1, k2, k3 = jax.random.split(key, 3)
    bank_emb = jax.random.normal(k3, (200, 128))
    return Patchioner(
        vit_cfg=vit_cfg,
        vit_params=vit.init_vit(k1, vit_cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k2, gcfg, prefix_size=128),
        bank=memproj.prepare_bank(bank_emb),
        bank_texts=[f"caption {i}" for i in range(200)],
        normalize=True,
    )


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 56, 56, 3)).astype(np.float32)


def test_forward_all_global_modes(tiny_model, imgs):
    outs = tiny_model.forward(
        imgs,
        get_cls_capt=True,
        get_avg_self_attn_capt=True,
        get_avg_patch_capt=True,
        get_attn_heads_capt=True,
        get_patch_capts=True,
        get_register_capts=True,
    )
    assert isinstance(outs["cls_capt"][0], str) and len(outs["cls_capt"]) == 2
    assert len(outs["avg_self_attn_capt"]) == 2
    assert len(outs["avg_patch_capt"]) == 2
    assert len(outs["attn_heads_capts"]) == 2
    assert len(outs["attn_heads_capts"][0]) == 4  # extract_heads
    assert len(outs["patch_tokens_capts"][0]) == 16  # 4x4 grid
    assert len(outs["register_capts"][0]) == 4


def test_forward_nchw_input_equivalence(tiny_model, imgs):
    a = tiny_model.forward(imgs, get_cls_capt=True)
    b = tiny_model.forward(imgs.transpose(0, 3, 1, 2), get_cls_capt=True)
    assert a["cls_capt"] == b["cls_capt"]


def test_bbox_captions_nesting_and_scores(tiny_model, imgs):
    boxes = np.array(
        [[[0, 0, 28, 28], [14, 14, 28, 28], [0, 0, 1, 1]]] * 2, np.float32
    )
    outs = tiny_model.forward(
        imgs,
        get_cls_capt=False,
        bboxes=boxes,
        gaussian_avg=True,
        compute_scores=True,
        return_n_best_sims=3,
    )
    assert len(outs["bbox_capts"]) == 2
    assert len(outs["bbox_capts"][0]) == 3
    assert len(outs["bbox_scores"][0]) == 3
    assert len(outs["bbox_sims"][0]) == 3
    assert len(outs["bbox_sims"][0][0]) == 3  # top-3 sims per box


def test_controllable_and_trace_captions(tiny_model, imgs):
    boxes = np.array([[[0, 0, 28, 28], [-100, -100, -1, -1]]] * 2, np.float32)
    traces = [
        [{"x": 0.1, "y": 0.2}, {"x": 0.5, "y": 0.5}],
        [{"x": 0.9, "y": 0.9}],
    ]
    outs = tiny_model.forward(
        imgs,
        get_cls_capt=False,
        bboxes=boxes,
        get_controllable_capts=True,
        traces=traces,
        use_attention_tracing=True,
    )
    assert len(outs["set_controllable_capts"]) == 2
    assert len(outs["trace_capts"]) == 2


def test_cleaning_paths(tiny_model, imgs):
    for after in (True, False):
        outs = tiny_model.forward(
            imgs,
            get_cls_capt=False,
            get_patch_capts=True,
            cleaning_type="orthogonal_projection",
            clean_after_projection=after,
            alpha=0.8,
        )
        assert len(outs["patch_tokens_capts"][0]) == 16


def test_caption_tokens_matches_manual_pipeline(tiny_model, imgs):
    enc = tiny_model.encode_images(imgs)
    cls = enc["x_norm_clstoken"]
    prefix = memproj.memory_project_xla(
        cls, tiny_model.bank.rows[: tiny_model.bank.num_real], normalize=True
    )
    toks, _ = decap.greedy_decode(tiny_model.decoder, prefix, tiny_model.gpt2_cfg)
    want = [tiny_model.tokenizer.decode_caption(r) for r in np.asarray(toks)]
    got = tiny_model.caption_tokens(cls)
    assert got == want


def test_argmax_text_mode(tiny_model, imgs):
    tiny_model.calculate_argmax_text = True
    try:
        outs = tiny_model.forward(imgs, get_cls_capt=True)
        assert all(c.startswith("caption ") for c in outs["cls_capt"])
    finally:
        tiny_model.calculate_argmax_text = False


def test_from_config_giant_swiglu_orchestrator(monkeypatch):
    """The giant (SwiGLU-FFN) backbone must work through the ORCHESTRATOR
    surface, not just vit_forward: from_config name dispatch, 1536-d
    bank/decoder prefix, and cls + trace captioning end to end. Depth is
    monkeypatched to 2 so the test exercises the swiglu plumbing (which
    is per-layer) without 40 CPU layers. Reference giant surface:
    src/model.py:127 (dim dispatch), torch.hub dinov2_vitg14* delegation
    at src/model.py:336-343."""
    giant = dict(vit.VARIANTS["dinov2_vitg14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitg14_reg", giant)
    m = Patchioner.from_config(
        {
            "dino_model": "dinov2_vitg14_reg",
            "crop_dim": 140,
            "prefix_size": 1536,
            "support_memory_size": 128,
            "normalize": True,
            "projection_type": "coco",
        },
        allow_missing_weights=True,
        random_bank_size=128,
    )
    assert m.vit_cfg.ffn == "swiglu"
    assert m.vit_cfg.embed_dim == 1536
    assert m.bank.rows.shape[-1] == 1536
    rng = np.random.default_rng(7)
    imgs = rng.uniform(-1.5, 1.5, (2, 140, 140, 3)).astype(np.float32)
    traces = [np.array([[0.2, 0.2], [0.6, 0.6]], np.float32)] * 2
    outs = m.forward(imgs, traces=traces, get_cls_capt=True)
    assert len(outs["cls_capt"]) == 2
    assert len(outs["trace_capts"]) == 2
    assert all(isinstance(c, str) for c in outs["cls_capt"])


def test_from_config_full_size(tmp_path):
    cfg = {
        "decap_weights": "/nonexistent/decap.pt",
        "prefix_size": 768,
        "support_memory_size": 2000,
        "dino_model": "dinov2_vitb14_reg",
        "normalize": True,
        "projection_type": "coco",
        "kkv_attention": False,
    }
    p = tmp_path / "model.yaml"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.warns(UserWarning, match="kkv_attention"):
        model = Patchioner.from_config(
            str(p), allow_missing_weights=True, random_bank_size=256
        )
    assert model.vit_cfg.embed_dim == 768
    assert model.vit_cfg.num_registers == 4
    assert model.vit_cfg.grid_size == 37
    assert model.bank.num_real == 256
    assert model.gpt2_cfg.n_layer == 4

    with pytest.raises(FileNotFoundError):
        Patchioner.from_config(str(p))  # strict mode needs real weights

    cfg["dino_model"] = "some_unknown_backbone"
    p.write_text(yaml.safe_dump(cfg))
    with pytest.raises(NotImplementedError, match="not wired"):
        Patchioner.from_config(str(p), allow_missing_weights=True)


def test_int8_bank_orchestrator(tiny_model, imgs):
    """memory_bank_int8 extension: a QuantizedBank behind the same
    orchestrator surface — projection, argmax-text, and captions all work,
    and the projection tracks the f32 bank closely."""
    key = jax.random.PRNGKey(0)
    vit_cfg = tiny_model.vit_cfg
    k1, k2, k3 = jax.random.split(key, 3)
    bank_emb = jax.random.normal(k3, (200, 128))
    m8 = Patchioner(
        vit_cfg=vit_cfg,
        vit_params=tiny_model.vit_params,
        gpt2_cfg=tiny_model.gpt2_cfg,
        decoder=tiny_model.decoder,
        bank=memproj.quantize_bank(bank_emb),
        bank_texts=tiny_model.bank_texts,
        normalize=True,
    )
    feats = jax.random.normal(jax.random.PRNGKey(5), (3, 128))
    a = tiny_model.project_features(feats)
    b = m8.project_features(feats)
    cos = jnp.sum(a * b, -1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1))
    assert float(jnp.min(cos)) > 0.995
    # argmax-text over dequantized rows picks the same nearest captions
    m8.calculate_argmax_text = True
    tiny_model.calculate_argmax_text = True
    try:
        assert m8.caption_tokens(feats) == tiny_model.caption_tokens(feats)
    finally:
        m8.calculate_argmax_text = False
        tiny_model.calculate_argmax_text = False
    capts = m8.forward(imgs, get_cls_capt=True)["cls_capt"]
    assert len(capts) == 2 and all(isinstance(c, str) for c in capts)


def test_int8_bank_from_config_flag():
    cfg = {
        "prefix_size": 64,
        "support_memory_size": 64,
        "projection_type": "coco",
        "memory_bank_int8": True,
        "dino_model": "dinov2_vits14",
        "decoding_method": "decap",
    }
    m = Patchioner.from_config(
        cfg, allow_missing_weights=True, random_bank_size=64
    )
    assert m.bank.rows.dtype == jnp.int8


def test_uint8_input_matches_float_path(tiny_model):
    """uint8 batches normalize ON DEVICE (encode_images) and must produce
    captions identical to the host-normalized float path — the input-
    bandwidth optimization (transforms.preprocess_pil_uint8 ships 4x fewer
    bytes over the host->device link) may not change behavior."""
    from patchioner_tpu.utils import transforms as T

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 255, (2, 56, 56, 3)).astype(np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    a = tiny_model.forward(f32, get_cls_capt=True)
    b = tiny_model.forward(u8, get_cls_capt=True)
    assert a["cls_capt"] == b["cls_capt"]


def test_fused_trace_path_matches_forward(tiny_model, imgs):
    """caption_traces_fused (single-dispatch program) must produce captions
    identical to forward(traces=...) in both trace-pool variants."""
    from patchioner_tpu.models.patchioner import _traces_to_arrays

    traces = [[{"x": 0.2, "y": 0.3}, {"x": 0.5, "y": 0.6}],
              [{"x": 0.7, "y": 0.2}]]
    pts, valid = _traces_to_arrays(traces)
    assert tiny_model.supports_fused_trace_path()
    for attn in (False, True):
        want = tiny_model.forward(
            imgs, get_cls_capt=False, traces=traces,
            use_attention_tracing=attn,
        )["trace_capts"]
        got = tiny_model.caption_traces_fused(
            imgs, pts, valid, use_attention_tracing=attn
        )
        assert got == want, f"use_attention_tracing={attn}"


def test_fused_bbox_path_matches_forward(tiny_model, imgs):
    """caption_bboxes_fused (single-dispatch program) must produce captions
    identical to forward(bboxes=...) across the weighting variants,
    including dummy-box padding."""
    bboxes = np.asarray(
        [[[0, 0, 28, 28], [14, 14, 56, 56], [0, 0, 1, 1]],
         [[7, 7, 42, 42], [0, 0, 1, 1], [0, 0, 1, 1]]], np.float32
    )
    for kw in (
        dict(),
        dict(gaussian_avg=True, gaussian_bbox_variance=0.7),
        dict(use_attn_map_for_bboxes=True),
    ):
        want = tiny_model.forward(
            imgs, get_cls_capt=False, bboxes=bboxes,
            gaussian_avg=kw.get("gaussian_avg", False),
            gaussian_bbox_variance=kw.get("gaussian_bbox_variance", 0.5),
            use_attn_map_for_bboxes=kw.get("use_attn_map_for_bboxes", False),
        )["bbox_capts"]
        got = tiny_model.caption_bboxes_fused(imgs, bboxes, **kw)
        assert got == want, kw


def test_fused_global_path_matches_forward(tiny_model, imgs):
    """caption_images_fused must match forward's cls / avg_self_attn /
    avg_patch whole-image captions."""
    want = tiny_model.forward(
        imgs, get_cls_capt=True, get_avg_self_attn_capt=True,
        get_avg_patch_capt=True, gaussian_img_variance=0.5,
    )
    assert tiny_model.caption_images_fused(imgs) == want["cls_capt"]
    assert tiny_model.caption_images_fused(
        imgs, caption_from="avg_self_attn"
    ) == want["avg_self_attn_capt"]
    assert tiny_model.caption_images_fused(
        imgs, caption_from="patches", gaussian_img_variance=0.5
    ) == want["avg_patch_capt"]
    # uniform (>=100) and one-hot-center (0) variance regimes too
    for var in (100.0, 0.0):
        want_v = tiny_model.forward(
            imgs, get_cls_capt=False, get_avg_patch_capt=True,
            gaussian_img_variance=var,
        )["avg_patch_capt"]
        got_v = tiny_model.caption_images_fused(
            imgs, caption_from="patches", gaussian_img_variance=var
        )
        assert got_v == want_v, var
    with pytest.raises(ValueError, match="caption_from"):
        tiny_model.caption_images_fused(imgs, caption_from="nope")


def test_fused_global_cache_ignores_variance_except_patches(tiny_model):
    """gaussian_img_variance shapes only the 'patches' program; cls /
    avg_self_attn must reuse ONE cached program across variance values
    (recompiling a byte-identical flagship program costs minutes on a
    remote backend)."""
    for mode in ("cls", "avg_self_attn"):
        s1 = tiny_model._fused_global_step(mode, 1.0)
        s2 = tiny_model._fused_global_step(mode, 2.0)
        assert s1 is s2, mode
    p1 = tiny_model._fused_global_step("patches", 1.0)
    p2 = tiny_model._fused_global_step("patches", 2.0)
    assert p1 is not p2
    assert tiny_model._fused_global_step("patches", 1.0) is p1


def test_fused_region_set_path_matches_forward(tiny_model, imgs):
    """caption_region_sets_fused must match forward's controllable
    (merged-box-set) captions, dummy boxes included."""
    bboxes = np.asarray(
        [[[0, 0, 28, 28], [14, 14, 56, 56]],
         [[7, 7, 42, 42], [-1, -1, -1, -1]]], np.float32
    )
    for kw in (dict(), dict(gaussian_avg=True, gaussian_bbox_variance=0.7)):
        want = tiny_model.forward(
            imgs, get_cls_capt=False, bboxes=bboxes,
            get_controllable_capts=True,
            gaussian_avg=kw.get("gaussian_avg", False),
            gaussian_bbox_variance=kw.get("gaussian_bbox_variance", 0.5),
        )["set_controllable_capts"]
        got = tiny_model.caption_region_sets_fused(imgs, bboxes, **kw)
        assert got == want, kw
