"""CLIP tower parity vs a random-init transformers CLIPModel."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from patchioner_tpu.models import clip as clip_mod


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "max_position_embeddings": 32,
            "vocab_size": 49408,
            "hidden_act": "quick_gelu",
        },
        vision_config={
            "hidden_size": 64,
            "intermediate_size": 256,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 32,
            "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=48,
    )
    torch.manual_seed(0)
    return CLIPModel(cfg).eval()


def test_vision_parity(hf_clip):
    cfg = clip_mod.ClipVisionConfig(
        img_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    params = clip_mod.port_hf_clip_vision(hf_clip.state_dict(), cfg.depth)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf_clip.get_image_features(torch.from_numpy(x)).numpy()
    out = clip_mod.clip_visual_forward(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg
    )
    np.testing.assert_allclose(
        np.asarray(out["x_norm_clstoken"]), want, rtol=2e-4, atol=2e-4
    )
    assert out["x_norm_patchtokens"].shape == (2, 4, 48)
    assert out["qkv_last"].shape == (2, 5, 3 * 64)


def test_vision_pos_embed_adapts_to_larger_grid(hf_clip):
    """A ported tower (pos-embed stored at the pretraining grid) run at a
    bigger input grid must interpolate the patch pos-embeds exactly like
    the reference's F.interpolate(size=(g,g), mode='bicubic',
    align_corners=False) (INViTE clipfolder/model.py:463) — the bigResize
    configs depend on this."""
    cfg32 = clip_mod.ClipVisionConfig(
        img_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    cfg64 = clip_mod.ClipVisionConfig(
        img_size=64, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    params = clip_mod.port_hf_clip_vision(hf_clip.state_dict(), 2)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    out = clip_mod.clip_visual_forward(params, jnp.asarray(x), cfg64)
    assert out["x_norm_patchtokens"].shape == (2, 16, 48)

    # oracle: pre-interpolate with torch and run with matching shapes
    pos = np.asarray(params["pos_embed"])  # (1, 1+4, 64)
    grid = torch.from_numpy(pos[:, 1:].reshape(1, 2, 2, 64)).permute(0, 3, 1, 2)
    up = torch.nn.functional.interpolate(
        grid, size=(4, 4), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, 16, 64).numpy()
    params_pre = dict(params)
    params_pre["pos_embed"] = jnp.asarray(
        np.concatenate([pos[:, :1], up], axis=1)
    )
    want = clip_mod.clip_visual_forward(params_pre, jnp.asarray(x), cfg64)
    np.testing.assert_allclose(
        np.asarray(out["x_norm_clstoken"]),
        np.asarray(want["x_norm_clstoken"]), rtol=2e-4, atol=2e-4,
    )


def test_vision_skip_last_layers(hf_clip):
    """INViTE-style truncated forward: skipping the last block must equal
    running depth-1 blocks (ln_post+proj still applied)."""
    cfg = clip_mod.ClipVisionConfig(
        img_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=48
    )
    params = clip_mod.port_hf_clip_vision(hf_clip.state_dict(), cfg.depth)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    full = clip_mod.clip_visual_forward(params, x, cfg)
    trunc = clip_mod.clip_visual_forward(params, x, cfg, skip_last_layers=1)
    assert not np.allclose(
        np.asarray(full["x_norm_clstoken"]), np.asarray(trunc["x_norm_clstoken"])
    )
    params1 = dict(params, blocks=params["blocks"][:1])
    one = clip_mod.clip_visual_forward(params1, x, cfg)
    np.testing.assert_allclose(
        np.asarray(trunc["x_norm_clstoken"]),
        np.asarray(one["x_norm_clstoken"]),
        rtol=1e-5,
    )


def test_text_parity(hf_clip):
    cfg = clip_mod.ClipTextConfig(
        width=64, depth=2, heads=4, proj_dim=48, context_length=32
    )
    params = clip_mod.port_hf_clip_text(hf_clip.state_dict(), cfg.depth)
    toks = np.zeros((2, 32), np.int64)
    toks[0, :5] = [49406, 320, 786, 6765, 49407]
    toks[1, :3] = [49406, 525, 49407]
    with torch.no_grad():
        want = hf_clip.get_text_features(torch.from_numpy(toks)).numpy()
    got = clip_mod.clip_text_forward(params, jnp.asarray(toks.astype(np.int32)), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
