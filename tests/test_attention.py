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
