"""Flash attention kernel parity (interpret mode on CPU) and ViT integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.ops import attention


@pytest.mark.parametrize("n", [96, 130])  # below/above one block, ragged pad
def test_flash_matches_reference(n):
    rng = np.random.default_rng(0)
    b, h, hd = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    want = attention.attention_reference(q, k, v, 0.125)
    got = attention.flash_attention(
        q, k, v, scale=0.125, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_flash_bf16_inputs():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 64)), jnp.bfloat16)
    want = attention.attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), 0.1
    )
    got = attention.flash_attention(
        q, k, v, scale=0.1, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("n", [96, 130, 200])
def test_flash_1pass_matches_reference(n):
    rng = np.random.default_rng(2)
    b, h, hd = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    want = attention.attention_reference(q, k, v, 0.125)
    got = attention.flash_attention_1pass(
        q, k, v, scale=0.125, block_q=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


def test_flash_1pass_bf16_inputs():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 2, 100, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 100, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 100, 64)), jnp.bfloat16)
    want = attention.attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), 0.1
    )
    got = attention.flash_attention_1pass(
        q, k, v, scale=0.1, block_q=64, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("num_real_k", [None, 200])
def test_fused_qkv_matches_split_path(num_real_k):
    rng = np.random.default_rng(4)
    b, n, h, hd = 2, 256, 4, 64
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * hd)), jnp.float32)
    q, k, v = jnp.split(qkv.reshape(b, n, 3, h, hd), 3, axis=2)
    q = q.squeeze(2).transpose(0, 2, 1, 3)
    k = k.squeeze(2).transpose(0, 2, 1, 3)
    v = v.squeeze(2).transpose(0, 2, 1, 3)
    nk = num_real_k or n
    want = attention.attention_reference(
        q, k[:, :, :nk], v[:, :, :nk], hd**-0.5
    ).transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    got = attention.fused_qkv_attention(
        qkv, num_heads=h, scale=hd**-0.5, num_real_k=num_real_k,
        block_q=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("num_real_k,block_q", [(None, 128), (200, 64)])
def test_fused_qkv_proj_matches_unfused(num_real_k, block_q):
    """Epilogue-folded kernel == fused_qkv_attention -> out-proj ->
    layerscale -> residual, on real (padded-key) geometry."""
    rng = np.random.default_rng(5)
    b, n, h, hd = 2, 256, 4, 64
    d = h * hd
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    merged = attention.fused_qkv_attention(
        qkv, num_heads=h, scale=hd**-0.5, num_real_k=num_real_k,
        block_q=128, interpret=True,
    )
    want = x + (merged @ w + bias) * ls
    got = attention.fused_qkv_attention_proj(
        qkv, x, w, bias, ls, num_heads=h, scale=hd**-0.5,
        num_real_k=num_real_k, block_q=block_q, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_vit_fusedqkv_proj_impl_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=128, depth=2,
              num_heads=2, num_registers=4, pos_grid=4)
    cfg_x = vit.ViTConfig(**kw)
    cfg_f = vit.ViTConfig(**kw, attn_impl="fusedqkv_proj")
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = vit.vit_forward(params, x, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        b = vit.vit_forward(params, x, cfg_f)
    for key in ("x_norm_patchtokens", "x_norm_clstoken", "qkv_last"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=5e-4, atol=5e-5,
            err_msg=key,
        )


def test_fused_qkv_rejects_ragged_n():
    qkv = jnp.zeros((1, 130, 3 * 2 * 64))
    with pytest.raises(ValueError, match="N%128"):
        attention.fused_qkv_attention(
            qkv, num_heads=2, scale=0.125, interpret=True
        )


def test_gelu_approx_knob_close_but_distinct():
    from patchioner_tpu.models import vit

    cfg_e = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                          num_heads=2, num_registers=0, pos_grid=4)
    cfg_a = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                          num_heads=2, num_registers=0, pos_grid=4,
                          gelu_approx=True)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_e)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = np.asarray(vit.vit_forward(params, x, cfg_e)["x_norm_patchtokens"])
    b = np.asarray(vit.vit_forward(params, x, cfg_a)["x_norm_patchtokens"])
    assert np.max(np.abs(a - b)) > 0  # genuinely different math
    np.testing.assert_allclose(a, b, rtol=0.1, atol=5e-2)  # but close


def test_vit_fusedqkv_impl_matches_xla():
    """fusedqkv pads N 21->128 internally; outputs must match XLA exactly
    (same math, just transpose-free layout + key masking)."""
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=128, depth=2,
              num_heads=2, num_registers=4, pos_grid=4)
    cfg_x = vit.ViTConfig(**kw)
    cfg_f = vit.ViTConfig(**kw, attn_impl="fusedqkv")
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = vit.vit_forward(params, x, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        b = vit.vit_forward(params, x, cfg_f)
    for key in ("x_norm_patchtokens", "x_norm_clstoken", "qkv_last"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=5e-4, atol=5e-5,
            err_msg=key,
        )


def test_vit_flash_impl_matches_xla():
    from patchioner_tpu.models import vit

    cfg_x = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                          num_heads=2, num_registers=0, pos_grid=4)
    cfg_f = vit.ViTConfig(img_size=56, patch_size=14, embed_dim=128, depth=2,
                          num_heads=2, num_registers=0, pos_grid=4,
                          attn_impl="flash")
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    # interpret-mode pallas on CPU: monkeypatch default via flash kwargs is
    # not exposed through vit_forward, so run the kernel path under
    # force-interpret.
    from jax.experimental.pallas import tpu as pltpu

    a = vit.vit_forward(params, x, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        b = vit.vit_forward(params, x, cfg_f)
    np.testing.assert_allclose(
        np.asarray(a["x_norm_patchtokens"]),
        np.asarray(b["x_norm_patchtokens"]),
        rtol=5e-4, atol=5e-5,
    )
