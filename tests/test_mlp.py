"""Fused LN+MLP+residual kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.ops import mlp


def _params(rng, d, h, dtype):
    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    return {
        "norm2": {"scale": arr(d), "bias": arr(d)},
        "fc1": {"w": arr(d, h, scale=d**-0.5), "b": arr(h)},
        "fc2": {"w": arr(h, d, scale=h**-0.5), "b": arr(d)},
        "ls2": jnp.full((d,), 1e-2, dtype),
    }


@pytest.mark.parametrize("gelu_approx", [False, True])
def test_fused_ln_mlp_matches_reference_f32(gelu_approx):
    rng = np.random.default_rng(0)
    b, n, d, h = 2, 256, 128, 512
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    p = _params(rng, d, h, jnp.float32)
    want = mlp.ln_mlp_reference(x, p, eps=1e-6, gelu_approx=gelu_approx)
    got = mlp.fused_ln_mlp(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
        p["ls2"], eps=1e-6, gelu_approx=gelu_approx, block_q=128,
        interpret=True,
    )
    # exact-GELU path uses a rational erf with |abs err| < 1.5e-7, which the
    # fc2 reduction amplifies to a few e-6 — tolerance covers that.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_mlp_bf16():
    rng = np.random.default_rng(1)
    b, n, d, h = 1, 128, 128, 512
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    p = _params(rng, d, h, jnp.bfloat16)
    want = mlp.ln_mlp_reference(x, p, eps=1e-6)
    got = mlp.fused_ln_mlp(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
        p["ls2"], eps=1e-6, block_q=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_vit_mlp_fused_matches_xla():
    """mlp_fused (with fusedqkv's padded-N path) must match the plain-XLA
    encoder end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=128, depth=2,
              num_heads=2, num_registers=4, pos_grid=4)
    cfg_x = vit.ViTConfig(**kw)
    cfg_f = vit.ViTConfig(**kw, attn_impl="fusedqkv", mlp_fused=True)
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


def test_fused_ln_mlp_w8_parity():
    """W8A8 variant matches the f32 reference within int8 quantization
    error (per-channel weights + dynamic per-row activations)."""
    rng = np.random.default_rng(2)
    b, n, d, h = 2, 256, 128, 512
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    p = _params(rng, d, h, jnp.float32)
    want = mlp.ln_mlp_reference(x, p, eps=1e-6)
    w1q, w1s, b1, w2q, w2s, b2 = mlp.quantize_mlp_weights(
        p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"]
    )
    got = mlp.fused_ln_mlp_w8(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        w1q, w1s, b1, w2q, w2s, b2, p["ls2"],
        eps=1e-6, block_q=128, interpret=True,
    )
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert diff.max() / np.abs(np.asarray(want)).max() < 0.01


def test_fused_ln_mlp_rejects_ragged_n():
    x = jnp.zeros((1, 130, 128))
    z = jnp.zeros((128,))
    with pytest.raises(ValueError, match="N%"):
        mlp.fused_ln_mlp(x, z, z, jnp.zeros((128, 512)), jnp.zeros((512,)),
                         jnp.zeros((512, 128)), z, z, eps=1e-6,
                         interpret=True)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_dense_parity(dtype):
    """LN+dense kernel == _ln -> _dense (the qkv projection fusion)."""
    from patchioner_tpu.models.vit import _dense, _ln

    rng = np.random.default_rng(6)
    b, n, d, o = 2, 256, 128, 384
    x = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
    g = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    bg = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, o)) * 0.05, dtype)
    bias = jnp.asarray(rng.standard_normal((o,)) * 0.1, dtype)
    want = _dense(_ln(x, {"scale": g, "bias": bg}, 1e-6),
                  {"w": w, "b": bias})
    got = mlp.fused_ln_dense(x, g, bg, w, bias, eps=1e-6, block_q=128,
                             interpret=True)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_dense_residual_parity(dtype):
    """dense+layerscale+residual kernel == _dense -> *ls -> +res (the
    attention out-projection epilogue fusion, `proj_fused`)."""
    from patchioner_tpu.models.vit import _dense

    rng = np.random.default_rng(7)
    b, n, d, o = 2, 256, 384, 128
    x = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
    res = jnp.asarray(rng.standard_normal((b, n, o)), dtype)
    w = jnp.asarray(rng.standard_normal((d, o)) * 0.05, dtype)
    bias = jnp.asarray(rng.standard_normal((o,)) * 0.1, dtype)
    ls = jnp.asarray(rng.uniform(0.5, 1.5, (o,)), dtype)
    want = res + _dense(x, {"w": w, "b": bias}) * ls
    got = mlp.fused_dense_residual(x, res, w, bias, ls, block_q=128,
                                   interpret=True)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_dense_residual_rejects_ragged_n():
    x = jnp.zeros((1, 130, 128))
    with pytest.raises(ValueError, match="N%"):
        mlp.fused_dense_residual(
            x, x, jnp.zeros((128, 128)), jnp.zeros((128,)),
            jnp.ones((128,)), interpret=True,
        )


def test_vit_proj_fused_matches_unfused():
    """proj_fused must not change the model's outputs (identical math,
    fused epilogue)."""
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=128, depth=2,
              num_heads=2, num_registers=4, pos_grid=4,
              attn_impl="fusedqkv", qkv_fused=True)
    cfg_a = vit.ViTConfig(**kw)
    cfg_b = vit.ViTConfig(**kw, proj_fused=True)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_a)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    with pltpu.force_tpu_interpret_mode():
        a = vit.vit_forward(params, x, cfg_a)
        b = vit.vit_forward(params, x, cfg_b)
    for key in ("x_norm_patchtokens", "x_norm_clstoken", "qkv_last"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=5e-5, atol=5e-6,
            err_msg=key,
        )


def test_vit_qkv_fused_matches_unfused():
    """qkv_fused must not change the model's outputs (identical math,
    fused operand read)."""
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=128, depth=2,
              num_heads=2, num_registers=4, pos_grid=4,
              attn_impl="fusedqkv")
    cfg_a = vit.ViTConfig(**kw)
    cfg_b = vit.ViTConfig(**kw, qkv_fused=True)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_a)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    with pltpu.force_tpu_interpret_mode():
        a = vit.vit_forward(params, x, cfg_a)
        b = vit.vit_forward(params, x, cfg_b)
    for key in ("x_norm_patchtokens", "x_norm_clstoken", "qkv_last"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=5e-5, atol=5e-6,
            err_msg=key,
        )


def test_qkv_fused_block_picker():
    """The fused LN+qkv q-block must shrink with the pinned-weight
    footprint: giant's 14.2 MB W_qkv overflows scoped VMEM at bq704
    (measured compile failure, probe_lnqkv_giant round 3b) while ViT-B/L
    run the full-N block."""
    from patchioner_tpu.models.vit import _qkv_fused_block

    # ViT-B (d=768) and ViT-L (d=1024), bf16: whole padded N in one block
    assert _qkv_fused_block(1408, 768, 768 * 3 * 768 * 2, 2) == 704
    assert _qkv_fused_block(1408, 1024, 1024 * 3 * 1024 * 2, 2) == 704
    # giant (d=1536): must step down to a compiling block, not crash
    assert _qkv_fused_block(1408, 1536, 1536 * 3 * 1536 * 2, 2) == 352
    # absurd width: no block fits -> None (caller warns and falls back)
    assert _qkv_fused_block(1408, 8192, 8192 * 3 * 8192 * 2, 2) is None


# ------------------------------------------------------ fused LN + SwiGLU


def _swiglu_params(rng, d, h, dtype):
    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    return {
        "norm2": {"scale": arr(d), "bias": arr(d)},
        "w12": {"w": arr(d, 2 * h, scale=d**-0.5), "b": arr(2 * h)},
        "w3": {"w": arr(h, d, scale=h**-0.5), "b": arr(d)},
        "ls2": jnp.full((d,), 1e-2, dtype),
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_swiglu_parity(dtype):
    rng = np.random.default_rng(0)
    d, h = 128, 256
    p = _swiglu_params(rng, d, h, dtype)
    x = jnp.asarray(rng.standard_normal((2, 256, d)), dtype)
    ref = mlp.ln_swiglu_reference(x, p, eps=1e-6)
    got = mlp.fused_ln_swiglu(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        p["w12"]["w"], p["w12"]["b"], p["w3"]["w"], p["w3"]["b"], p["ls2"],
        eps=1e-6, block_q=128, block_h=128, interpret=True,
    )
    tol = 2e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )
    # multi-tile H accumulation == single-tile (same grid math either way)
    got1 = mlp.fused_ln_swiglu(
        x, p["norm2"]["scale"], p["norm2"]["bias"],
        p["w12"]["w"], p["w12"]["b"], p["w3"]["w"], p["w3"]["b"], p["ls2"],
        eps=1e-6, block_q=256, block_h=256, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got1, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_ln_swiglu_rejects_bad_shapes():
    rng = np.random.default_rng(0)
    p = _swiglu_params(rng, 128, 256, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 200, 128)), jnp.float32)
    with pytest.raises(ValueError, match="N%"):
        mlp.fused_ln_swiglu(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            p["w12"]["w"], p["w12"]["b"], p["w3"]["w"], p["w3"]["b"],
            p["ls2"], eps=1e-6, block_q=128, block_h=128, interpret=True)
    x = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.float32)
    with pytest.raises(ValueError, match="H%"):
        mlp.fused_ln_swiglu(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            p["w12"]["w"], p["w12"]["b"], p["w3"]["w"], p["w3"]["b"],
            p["ls2"], eps=1e-6, block_q=128, block_h=192, interpret=True)


def test_vit_swiglu_fused_matches_xla():
    """mlp_fused on a SwiGLU tower (giant geometry scaled down: hd=64 head
    pairs for fusedqkv, ffn_hidden 1024 %128==0) must match the plain-XLA
    SwiGLU encoder end to end."""
    from jax.experimental.pallas import tpu as pltpu

    from patchioner_tpu.models import vit

    kw = dict(img_size=56, patch_size=14, embed_dim=384, depth=2,
              num_heads=6, num_registers=4, extract_heads=6, pos_grid=4,
              ffn="swiglu")
    cfg_x = vit.ViTConfig(**kw)
    assert cfg_x.ffn_hidden == 1024
    cfg_f = vit.ViTConfig(**kw, attn_impl="fusedqkv", mlp_fused=True)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg_x)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    a = vit.vit_forward(params, x, cfg_x)
    with pltpu.force_tpu_interpret_mode():
        b = vit.vit_forward(params, x, cfg_f)
    for key in ("x_norm_patchtokens", "x_norm_clstoken"):
        np.testing.assert_allclose(
            np.asarray(a[key]), np.asarray(b[key]), rtol=5e-4, atol=5e-5,
            err_msg=key,
        )
