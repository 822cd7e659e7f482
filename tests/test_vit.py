"""ViT encoder parity vs a random-init transformers Dinov2WithRegistersModel.

The HF implementation mirrors facebookresearch/dinov2 (the reference's
backbone, src/model.py:343), so porting its random weights and matching
outputs validates the whole encoder stack without any network download.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.io import torch_port
from patchioner_tpu.models import vit


def make_hf_model(num_registers=4, img=56, patch=14, dim=64, heads=4, depth=3):
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
    )

    cfg = Dinov2WithRegistersConfig(
        hidden_size=dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        intermediate_size=dim * 4,
        image_size=img,
        patch_size=patch,
        num_register_tokens=num_registers,
        layerscale_value=0.5,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def ported():
    model, hf_cfg = make_hf_model()
    cfg = vit.ViTConfig(
        img_size=56,
        patch_size=14,
        embed_dim=64,
        depth=3,
        num_heads=4,
        num_registers=4,
        extract_heads=4,
    )
    params = torch_port.port_hf_dinov2(model.state_dict(), cfg.depth, cfg.num_registers)
    return model, cfg, params


def test_forward_parity(ported):
    model, cfg, params = ported
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(torch.from_numpy(x)).last_hidden_state.numpy()
    out = vit.vit_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    ours = np.concatenate(
        [
            np.asarray(out["x_norm_clstoken"])[:, None],
            np.asarray(out["x_norm_regtokens"]),
            np.asarray(out["x_norm_patchtokens"]),
        ],
        axis=1,
    )
    np.testing.assert_allclose(ours, hf_out, rtol=1e-4, atol=1e-4)


def test_pos_embed_interpolation_changes_grid(ported):
    _, cfg, params = ported
    pos = jnp.asarray(params["pos_embed"])
    up = vit.interpolate_pos_embed(pos, 4, 8)
    assert up.shape == (1, 1 + 64, cfg.embed_dim)
    # identity when grids match
    same = vit.interpolate_pos_embed(pos, 4, 4)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))


@pytest.mark.parametrize("src,dst", [(37, 16), (37, 40), (7, 14), (16, 37)])
def test_pos_embed_interpolation_matches_torch_bicubic(src, dst):
    """Oracle: dinov2's interpolate_pos_encoding — torch F.interpolate
    bicubic (A=-0.75, antialias=False) called with the
    scale_factor=(dst+0.1)/src quirk (hub dinov2 vision_transformer.py,
    interpolate_offset=0.1). jax.image.resize (A=-0.5, no offset) fails
    this test in the 1e-3 range."""
    rng = np.random.default_rng(3)
    dim = 24
    pos = rng.standard_normal((1, 1 + src * src, dim)).astype(np.float32)

    grid = torch.from_numpy(pos[:, 1:].reshape(1, src, src, dim))
    sf = float(dst + 0.1) / src
    want = torch.nn.functional.interpolate(
        grid.permute(0, 3, 1, 2), mode="bicubic", antialias=False,
        scale_factor=(sf, sf),
    ).permute(0, 2, 3, 1).reshape(1, dst * dst, dim).numpy()

    got = vit.interpolate_pos_embed(jnp.asarray(pos), src, dst)
    assert got.shape == (1, 1 + dst * dst, dim)
    np.testing.assert_array_equal(np.asarray(got[:, :1]), pos[:, :1])
    np.testing.assert_allclose(np.asarray(got[:, 1:]), want,
                               rtol=1e-4, atol=2e-5)

    # interpolate_offset=0 reproduces torch's size=(dst,dst) call
    want0 = torch.nn.functional.interpolate(
        grid.permute(0, 3, 1, 2), mode="bicubic", antialias=False,
        size=(dst, dst),
    ).permute(0, 2, 3, 1).reshape(1, dst * dst, dim).numpy()
    got0 = vit.interpolate_pos_embed(jnp.asarray(pos), src, dst,
                                     interpolate_offset=0.0)
    np.testing.assert_allclose(np.asarray(got0[:, 1:]), want0,
                               rtol=1e-4, atol=2e-5)


def test_process_self_attention_matches_reference_math(ported):
    """Oracle: the reference's exact quirk chain (src/dino_extraction.py:24-34)
    on a random fused-qkv activation."""
    _, cfg, _ = ported
    b, n, d, h, ng = 2, 21, 64, 4, 5
    rng = np.random.default_rng(1)
    qkv_out = rng.standard_normal((b, n, 3 * d)).astype(np.float32)

    t = torch.from_numpy(qkv_out)
    tq = t.reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
    q, k = tq[0] * 0.125, tq[1]
    attn = q @ k.transpose(-2, -1)
    maps = attn[:, :, 0, ng:]
    want_attn = maps.mean(dim=1).softmax(dim=-1).numpy()

    got_attn, got_maps = vit.process_self_attention(
        jnp.asarray(qkv_out), num_heads=h, num_global_tokens=ng, scale=0.125
    )
    np.testing.assert_allclose(np.asarray(got_attn), want_attn, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_maps), maps.numpy(), rtol=1e-4, atol=1e-5)


def test_kkv_reorder(ported):
    """'kkv' rewiring must equal recomputing attention with K used as Q
    (reference: src/model.py:569-582)."""
    _, cfg, params = ported
    re = vit.reorder_qkv_params(params, "kkv")
    w = np.asarray(params["blocks"][-1]["qkv"]["w"])  # (D, 3D)
    d = w.shape[0]
    got = np.asarray(re["blocks"][-1]["qkv"]["w"])
    np.testing.assert_array_equal(got[:, :d], w[:, d : 2 * d])  # q slot <- k
    np.testing.assert_array_equal(got[:, d : 2 * d], w[:, d : 2 * d])
    np.testing.assert_array_equal(got[:, 2 * d :], w[:, 2 * d :])
    # identity case returns params untouched
    assert vit.reorder_qkv_params(params, "qkv") is params


def test_hub_layout_port_equals_hf_layout(ported):
    """Build a synthetic torch-hub-style state dict from the HF one and check
    both porters agree (covers the layout the real dinov2 checkpoints use)."""
    model, cfg, params_hf = ported
    sd = model.state_dict()
    hub = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "register_tokens": sd["embeddings.register_tokens"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(cfg.depth):
        p, q = f"blocks.{i}", f"encoder.layer.{i}"
        hub[f"{p}.norm1.weight"] = sd[f"{q}.norm1.weight"]
        hub[f"{p}.norm1.bias"] = sd[f"{q}.norm1.bias"]
        hub[f"{p}.attn.qkv.weight"] = torch.cat(
            [
                sd[f"{q}.attention.attention.query.weight"],
                sd[f"{q}.attention.attention.key.weight"],
                sd[f"{q}.attention.attention.value.weight"],
            ]
        )
        hub[f"{p}.attn.qkv.bias"] = torch.cat(
            [
                sd[f"{q}.attention.attention.query.bias"],
                sd[f"{q}.attention.attention.key.bias"],
                sd[f"{q}.attention.attention.value.bias"],
            ]
        )
        hub[f"{p}.attn.proj.weight"] = sd[f"{q}.attention.output.dense.weight"]
        hub[f"{p}.attn.proj.bias"] = sd[f"{q}.attention.output.dense.bias"]
        hub[f"{p}.ls1.gamma"] = sd[f"{q}.layer_scale1.lambda1"]
        hub[f"{p}.ls2.gamma"] = sd[f"{q}.layer_scale2.lambda1"]
        hub[f"{p}.norm2.weight"] = sd[f"{q}.norm2.weight"]
        hub[f"{p}.norm2.bias"] = sd[f"{q}.norm2.bias"]
        hub[f"{p}.mlp.fc1.weight"] = sd[f"{q}.mlp.fc1.weight"]
        hub[f"{p}.mlp.fc1.bias"] = sd[f"{q}.mlp.fc1.bias"]
        hub[f"{p}.mlp.fc2.weight"] = sd[f"{q}.mlp.fc2.weight"]
        hub[f"{p}.mlp.fc2.bias"] = sd[f"{q}.mlp.fc2.bias"]
    params_hub = torch_port.port_dinov2(hub, cfg.depth, cfg.num_registers)

    flat_hf = jnp.concatenate(
        [x.reshape(-1) for x in __import__("jax").tree_util.tree_leaves(params_hf)]
    )
    flat_hub = jnp.concatenate(
        [x.reshape(-1) for x in __import__("jax").tree_util.tree_leaves(params_hub)]
    )
    np.testing.assert_allclose(np.asarray(flat_hf), np.asarray(flat_hub))


def test_w8a8_quantized_forward():
    """W8A8 encoder path: per-channel int8 weights + dynamic per-token
    activation quantization tracks the f32 forward closely (with O(1)
    layerscale so residual contributions are visible — DINOv2 random init
    puts layerscale at 1e-5, which would hide any error)."""
    cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=4,
                        num_heads=4, num_registers=4, extract_heads=4,
                        pos_grid=4)
    p = vit.init_vit(jax.random.PRNGKey(0), cfg)
    for blk in p["blocks"]:
        blk["ls1"] = jnp.ones_like(blk["ls1"])
        blk["ls2"] = jnp.ones_like(blk["ls2"])
    pq = vit.quantize_vit_weights(p)
    assert pq["blocks"][0]["qkv"]["w_q"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = vit.vit_forward(p, x, cfg)
    b = vit.vit_forward(pq, x, cfg)
    for key in ("x_norm_patchtokens", "x_norm_clstoken"):
        va, vb = a[key], b[key]
        cos = jnp.sum(va * vb, -1) / (
            jnp.linalg.norm(va, axis=-1) * jnp.linalg.norm(vb, axis=-1))
        assert float(jnp.min(cos)) > 0.995, key
    # a single quantized dense carries the expected ~1% error (i.e. the
    # quantized path is actually exercised, not silently bypassed)
    blk, blkq = p["blocks"][0]["fc1"], pq["blocks"][0]["fc1"]
    xx = jax.random.normal(jax.random.PRNGKey(2), (8, 128))
    da = xx @ blk["w"] + blk["b"]
    db = vit._dense(xx, blkq)
    rel = float(jnp.linalg.norm(da - db) / jnp.linalg.norm(da))
    assert 1e-4 < rel < 0.05
    # bf16 config: w_scale must survive the in-jit cast as f32
    cfgb = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=4,
                         num_heads=4, num_registers=4, extract_heads=4,
                         pos_grid=4, dtype=jnp.bfloat16)
    c = vit.vit_forward(pq, x, cfgb)["x_norm_patchtokens"]
    cc = c.astype(jnp.float32)
    cos = jnp.sum(a["x_norm_patchtokens"] * cc, -1) / (
        jnp.linalg.norm(a["x_norm_patchtokens"], axis=-1)
        * jnp.linalg.norm(cc, axis=-1))
    assert float(jnp.min(cos)) > 0.99


def test_padded_qkv_attention_extraction_exact():
    """keep_qkv_padded + num_real_k must be bitwise-equal to the
    unpad-slice path: the padded key columns are dropped from the tiny
    logits before the softmax, so skipping the (B, N, 3D) unpad copy
    (the flagship hot path, PERF.md) cannot change extraction results."""
    from jax.experimental.pallas import tpu as pltpu

    # num_heads=2 -> hd=64, the fusedqkv kernel's head geometry
    cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                        num_heads=2, num_registers=4, extract_heads=4,
                        pos_grid=4, attn_impl="fusedqkv")
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    n_real = cfg.num_global_tokens + cfg.grid_size**2
    with pltpu.force_tpu_interpret_mode():
        sliced = vit.vit_forward(params, x, cfg)
        padded = vit.vit_forward(params, x, cfg, keep_qkv_padded=True)
    assert padded["qkv_last"].shape[1] % 128 == 0  # still lane-padded
    assert padded["qkv_last"].shape[1] > sliced["qkv_last"].shape[1]
    a_s, m_s = vit.process_self_attention(
        sliced["qkv_last"], num_heads=cfg.extract_heads,
        num_global_tokens=cfg.num_global_tokens, scale=cfg.extract_scale,
    )
    a_p, m_p = vit.process_self_attention(
        padded["qkv_last"], num_heads=cfg.extract_heads,
        num_global_tokens=cfg.num_global_tokens, scale=cfg.extract_scale,
        num_real_k=n_real,
    )
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_p))
    np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_p))
    # the non-qkv outputs are unaffected by the flag
    np.testing.assert_array_equal(
        np.asarray(sliced["x_norm_patchtokens"]),
        np.asarray(padded["x_norm_patchtokens"]),
    )
    # no-op when nothing is padded (xla attn path) — same shapes, and
    # num_real_k == n is harmless
    cfg_x = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128,
                          depth=2, num_heads=2, num_registers=4,
                          extract_heads=4, pos_grid=4)
    o = vit.vit_forward(params, x, cfg_x, keep_qkv_padded=True)
    assert o["qkv_last"].shape[1] == n_real
    a_n, _ = vit.process_self_attention(
        o["qkv_last"], num_heads=cfg.extract_heads,
        num_global_tokens=cfg.num_global_tokens, scale=cfg.extract_scale,
        num_real_k=n_real,
    )
    assert a_n.shape == a_s.shape


# ------------------------------------------------------------------ SwiGLU


def make_hf_swiglu_model(img=56, patch=14, dim=64, heads=4, depth=3, regs=4):
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
    )

    cfg = Dinov2WithRegistersConfig(
        hidden_size=dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        image_size=img,
        patch_size=patch,
        num_register_tokens=regs,
        layerscale_value=0.5,
        use_swiglu_ffn=True,
    )
    torch.manual_seed(0)
    return Dinov2WithRegistersModel(cfg).eval(), cfg


def test_swiglu_ffn_hidden_formula():
    # giant: 1536*4 -> 2/3 -> 4096 (dinov2 SwiGLUFFNFused & HF agree)
    assert vit.ViTConfig(embed_dim=1536, ffn="swiglu").ffn_hidden == 4096
    # non-multiple-of-8 case rounds up
    assert vit.ViTConfig(embed_dim=64, ffn="swiglu").ffn_hidden == 176
    # plain MLP unchanged
    assert vit.ViTConfig(embed_dim=768).ffn_hidden == 3072


def test_vitg_variant_config():
    cfg = vit.config_for("dinov2_vitg14_reg")
    assert (cfg.embed_dim, cfg.depth, cfg.num_heads) == (1536, 40, 24)
    assert cfg.num_registers == 4 and cfg.ffn == "swiglu"
    # the reference hard-codes 16 extraction heads for every non-'vits'
    # model (src/model.py:336-337) — giant included
    assert cfg.extract_heads == 16 and cfg.extract_scale == 0.125
    assert vit.config_for("dinov2_vitg14").num_registers == 0


def test_swiglu_forward_parity_vs_hf():
    """DINOv2-giant's FFN (use_swiglu_ffn=True): port a random-init HF
    model and match the full forward, as test_forward_parity does for the
    GELU MLP towers."""
    model, _ = make_hf_swiglu_model()
    cfg = vit.ViTConfig(
        img_size=56, patch_size=14, embed_dim=64, depth=3, num_heads=4,
        num_registers=4, extract_heads=4, ffn="swiglu",
    )
    params = torch_port.port_hf_dinov2(model.state_dict(), cfg.depth,
                                       cfg.num_registers)
    blk = params["blocks"][0]
    assert "w12" in blk and "w3" in blk and "fc1" not in blk
    assert blk["w12"]["w"].shape == (64, 2 * cfg.ffn_hidden)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(torch.from_numpy(x)).last_hidden_state.numpy()
    out = vit.vit_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    ours = np.concatenate(
        [
            np.asarray(out["x_norm_clstoken"])[:, None],
            np.asarray(out["x_norm_regtokens"]),
            np.asarray(out["x_norm_patchtokens"]),
        ],
        axis=1,
    )
    np.testing.assert_allclose(ours, hf_out, rtol=1e-4, atol=1e-4)


def test_swiglu_hub_layout_port_equals_hf_layout():
    """Synthetic torch-hub giant layout (blocks.N.mlp.{w12,w3}) ports to the
    same tree as the HF layout (mlp.{weights_in,weights_out})."""
    model, _ = make_hf_swiglu_model()
    sd = model.state_dict()
    params_hf = torch_port.port_hf_dinov2(sd, 3, 4)
    hub = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "register_tokens": sd["embeddings.register_tokens"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(3):
        p, q = f"blocks.{i}", f"encoder.layer.{i}"
        hub[f"{p}.norm1.weight"] = sd[f"{q}.norm1.weight"]
        hub[f"{p}.norm1.bias"] = sd[f"{q}.norm1.bias"]
        hub[f"{p}.attn.qkv.weight"] = torch.cat(
            [sd[f"{q}.attention.attention.{k}.weight"]
             for k in ("query", "key", "value")]
        )
        hub[f"{p}.attn.qkv.bias"] = torch.cat(
            [sd[f"{q}.attention.attention.{k}.bias"]
             for k in ("query", "key", "value")]
        )
        hub[f"{p}.attn.proj.weight"] = sd[f"{q}.attention.output.dense.weight"]
        hub[f"{p}.attn.proj.bias"] = sd[f"{q}.attention.output.dense.bias"]
        hub[f"{p}.ls1.gamma"] = sd[f"{q}.layer_scale1.lambda1"]
        hub[f"{p}.ls2.gamma"] = sd[f"{q}.layer_scale2.lambda1"]
        hub[f"{p}.norm2.weight"] = sd[f"{q}.norm2.weight"]
        hub[f"{p}.norm2.bias"] = sd[f"{q}.norm2.bias"]
        hub[f"{p}.mlp.w12.weight"] = sd[f"{q}.mlp.weights_in.weight"]
        hub[f"{p}.mlp.w12.bias"] = sd[f"{q}.mlp.weights_in.bias"]
        hub[f"{p}.mlp.w3.weight"] = sd[f"{q}.mlp.weights_out.weight"]
        hub[f"{p}.mlp.w3.bias"] = sd[f"{q}.mlp.weights_out.bias"]
    params_hub = torch_port.port_dinov2(hub, 3, 4)
    for a, b in zip(jax.tree_util.tree_leaves(params_hf),
                    jax.tree_util.tree_leaves(params_hub)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_swiglu_quantized_and_fused_knobs():
    """W8A8 quantization covers w12/w3; mlp_fused warns + falls back on
    SwiGLU towers instead of silently running the wrong kernel."""
    import warnings

    cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                        num_heads=4, num_registers=4, extract_heads=4,
                        pos_grid=4, ffn="swiglu")
    p = vit.init_vit(jax.random.PRNGKey(0), cfg)
    for blk in p["blocks"]:
        blk["ls1"] = jnp.ones_like(blk["ls1"])
        blk["ls2"] = jnp.ones_like(blk["ls2"])
    pq = vit.quantize_vit_weights(p)
    assert pq["blocks"][0]["w12"]["w_q"].dtype == jnp.int8
    assert pq["blocks"][0]["w3"]["w_q"].dtype == jnp.int8
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = vit.vit_forward(p, x, cfg)["x_norm_patchtokens"]
    b = vit.vit_forward(pq, x, cfg)["x_norm_patchtokens"]
    cos = jnp.sum(a * b, -1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1))
    assert float(jnp.min(cos)) > 0.995

    cfg_f = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                          num_heads=4, num_registers=4, extract_heads=4,
                          pos_grid=4, ffn="swiglu", mlp_fused=True)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        c = vit.vit_forward(p, x, cfg_f)["x_norm_patchtokens"]
    assert any("SwiGLU" in str(x.message) for x in w)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_last_block_rerun_swiglu():
    """Double-DINO's last-block re-run must dispatch the SwiGLU FFN for
    giant-layout blocks (it hard-coded fc1/fc2 before)."""
    cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                        num_heads=4, num_registers=4, extract_heads=4,
                        pos_grid=4, ffn="swiglu")
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    out = vit.vit_forward(params, x, cfg, return_block_input=True)
    tokens = out["last_block_input"]
    mask = jnp.ones(tokens.shape[:2], bool)
    y = vit.last_block_rerun(params, tokens, mask, cfg)
    assert np.isfinite(np.asarray(y)).all()
    # with the full key mask this must equal the final pre-norm stream
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(out["x_prenorm"]), rtol=2e-5, atol=2e-5)


def test_fusedqkv_proj_quantized_falls_back():
    """attn_impl='fusedqkv_proj' on a W8A8-quantized encoder warns and
    takes the XLA path instead of KeyError-ing on the missing plain proj
    weight (the fused kernel needs an unquantized W_proj to pin) — AND the
    fallback masks the lane-padded key rows the fusedqkv impls add.

    The params are deliberately made adversarial to the pad mask: O(1)
    layerscale (DINOv2's ~1e-5 init hides any attention error — it hid the
    original bug) and nonzero LN/qkv biases (so padded rows carry
    non-trivial garbage keys). Depth 1 is checked tight; depth 2 loose,
    because W8A8's dynamic per-token activation quantization amplifies
    benign fp-order differences (padded vs unpadded contractions)
    discontinuously (~0.02 measured) while the unmasked-pad bug shows as
    ~0.9."""
    import warnings

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    for depth, atol in ((1, 1e-5), (2, 0.1)):
        cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128,
                            depth=depth, num_heads=4, num_registers=4,
                            extract_heads=4, pos_grid=4)
        p = vit.init_vit(jax.random.PRNGKey(0), cfg)
        for blk in p["blocks"]:
            blk["ls1"] = jnp.ones_like(blk["ls1"])
            blk["ls2"] = jnp.ones_like(blk["ls2"])
            blk["norm1"]["bias"] = blk["norm1"]["bias"] + 0.3
            blk["qkv"]["b"] = blk["qkv"]["b"] + 0.1
        pq = vit.quantize_vit_weights(p)
        assert "w" not in pq["blocks"][0]["proj"]
        cfg_fp = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128,
                               depth=depth, num_heads=4, num_registers=4,
                               extract_heads=4, pos_grid=4,
                               attn_impl="fusedqkv_proj")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            a = vit.vit_forward(pq, x, cfg_fp)["x_norm_patchtokens"]
        assert any("fusedqkv_proj" in str(m.message) for m in w)
        b = vit.vit_forward(pq, x, cfg)["x_norm_patchtokens"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=atol)


def test_reorder_qkv_params_rejects_malformed_type():
    cfg = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=1,
                        num_heads=4, num_registers=4, extract_heads=4,
                        pos_grid=4)
    p = vit.init_vit(jax.random.PRNGKey(0), cfg)
    for bad in ("", "qk", "qkvv", "qxv"):
        with pytest.raises(ValueError, match="attention_type"):
            vit.reorder_qkv_params(p, bad)
    out = vit.reorder_qkv_params(p, "kkv")  # valid rewiring still works
    assert out["blocks"][-1]["qkv"]["w"].shape == p["blocks"][-1]["qkv"]["w"].shape
