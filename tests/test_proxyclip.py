"""ProxyCLIP tests: affinity math oracle + orchestrator integration."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.models.patchioner import Patchioner


def test_affinity_math_matches_reference():
    """Oracle: the custom_attn similarity pipeline
    (open_clip_proxy/transformer.py:570-578)."""
    rng = np.random.default_rng(0)
    ex = rng.standard_normal((2, 9, 8)).astype(np.float32)
    beta, gamma = 1.2, 3.0

    t = torch.from_numpy(ex)  # (B, N, C); reference uses (B, C, M) flattened
    q_k = torch.nn.functional.normalize(t.transpose(1, 2), dim=1)
    sim = torch.einsum("bcm,bcn->bmn", q_k, q_k)
    sim = (sim - torch.mean(sim) * beta) * gamma
    sim[sim < 0.0] = float("-inf")
    want = torch.softmax(sim, dim=-1).numpy()

    exn = jnp.asarray(ex)
    exn = exn / jnp.linalg.norm(exn, axis=-1, keepdims=True)
    s = jnp.einsum("bmd,bnd->bmn", exn, exn)
    s = (s - jnp.mean(s) * beta) * gamma
    s = jnp.where(s < 0.0, -jnp.inf, s)
    got = np.asarray(jax.nn.softmax(s, axis=-1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def proxy_model():
    cfg = dict(
        prefix_size=48, support_memory_size=64,
        proxyclip_clipmodel="ViT-B/16", proxyclip_vfm="dinov2",
        dino_model=None, normalize=True, crop_dim=28, projection_type="coco",
    )
    # Shrink both towers by patching config_for-produced sizes via a direct
    # constructor path is complex; use from_config with tiny crop (28 -> 2x2
    # VFM grid) and accept the full-width towers... too slow on CPU. Instead
    # build manually:
    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.models import decap, gpt2, proxyclip, vit
    from patchioner_tpu.ops import memory_projection as memproj

    clip_cfg = clip_mod.ClipVisionConfig(
        img_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    vfm_cfg = vit.ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                            num_heads=4, num_registers=4, extract_heads=4,
                            pos_grid=2)
    pcfg = proxyclip.ProxyClipConfig(clip=clip_cfg, vfm=vfm_cfg)
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    params = {
        "clip": clip_mod.init_clip_vision(k1, clip_cfg),
        "vfm": vit.init_vit(k2, vfm_cfg),
    }
    gcfg = gpt2.GPT2Config(vocab_size=300, n_layer=1, n_head=2, n_embd=48)
    model = Patchioner(
        vit_cfg=pcfg,
        vit_params=params,
        backbone_type="ProxyCLIP",
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(k3, gcfg, prefix_size=48),
        bank=memproj.prepare_bank(jax.random.normal(k4, (64, 48))),
        bank_texts=None,
    )
    return model, vfm_cfg


def test_proxyclip_encode_shapes(proxy_model):
    model, vfm_cfg = proxy_model
    imgs = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    enc = model.encode_images(imgs)
    assert set(enc) == {"x_norm_patchtokens"}
    assert enc["x_norm_patchtokens"].shape == (2, 4, 48)  # VFM 2x2 grid
    norms = np.linalg.norm(np.asarray(enc["x_norm_patchtokens"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_proxyclip_forward_modes(proxy_model):
    model, _ = proxy_model
    imgs = np.random.default_rng(2).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    with pytest.raises(ValueError, match="patch tokens only"):
        model.forward(imgs, get_cls_capt=True)
    with pytest.raises(ValueError, match="no self-attention"):
        model.forward(imgs, get_cls_capt=False, get_avg_self_attn_capt=True)
    outs = model.forward(
        imgs,
        get_cls_capt=False,
        get_avg_patch_capt=True,
        traces=[[{"x": 0.3, "y": 0.3}], [{"x": 0.6, "y": 0.6}]],
        bboxes=np.asarray([[[0, 0, 16, 16]], [[16, 16, 16, 16]]], np.float32),
    )
    assert len(outs["avg_patch_capt"]) == 2
    assert len(outs["trace_capts"]) == 2
    assert len(outs["bbox_capts"][0]) == 1


def test_proxyclip_non_divisible_crop_floors_grid():
    """Both shipped ProxyCLIP configs use crops that are NOT divisible by
    the CLIP patch size (518 and 296 vs patch 16); the reference's strided
    conv1 floors the grid, dropping the bottom/right remainder — the
    reshape-based embed must slice first instead of crashing, and must
    equal running the pre-sliced pixels."""
    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.models import proxyclip, vit

    # VFM patch 14 divides 28; CLIP patch 16 does not (28 -> gc=1, slice 16)
    clip_cfg = clip_mod.ClipVisionConfig(
        img_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    vfm_cfg = vit.ViTConfig(img_size=28, patch_size=14, embed_dim=64,
                            depth=2, num_heads=4, num_registers=4,
                            extract_heads=4, pos_grid=2)
    pcfg = proxyclip.ProxyClipConfig(clip=clip_cfg, vfm=vfm_cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    cp = clip_mod.init_clip_vision(k1, clip_cfg)
    vp = vit.init_vit(k2, vfm_cfg)
    imgs = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 28, 28, 3)),
        jnp.float32,
    )
    out = proxyclip.proxyclip_forward(cp, vp, imgs, pcfg)
    assert out["x_norm_patchtokens"].shape == (2, 4, 48)
    assert np.isfinite(np.asarray(out["x_norm_patchtokens"])).all()
