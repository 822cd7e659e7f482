"""CLIP ModifiedResNet parity vs the public torch implementation (loaded from
the reference checkout's vendored INViTE copy purely as a test oracle; skipped
when unavailable)."""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from patchioner_tpu.models import resnet_clip

ORACLE_PATH = "/root/reference/Patch-ioner/src/INViTE/clipfolder/model.py"


def load_oracle_module():
    if not os.path.exists(ORACLE_PATH):
        pytest.skip("reference checkout not available for the torch oracle")
    spec = importlib.util.spec_from_file_location("clip_oracle", ORACLE_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny():
    cfg = resnet_clip.ResNetClipConfig(
        layers=(1, 1, 1, 1), width=16, output_dim=24, heads=4, img_size=64
    )
    return cfg


def test_forward_parity_vs_torch(tiny):
    mod = load_oracle_module()
    torch.manual_seed(0)
    # The vendored ModifiedResNet uses standard BatchNorm; in eval() mode with
    # default running stats it equals our FrozenBN (mean 0, var 1).
    oracle = mod.ModifiedResNet(
        layers=[1, 1, 1, 1], output_dim=24, heads=4,
        input_resolution=64, width=16,
    ).eval()
    # randomize BN stats to exercise the frozen-BN math
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    params = resnet_clip.port_clip_resnet(oracle.state_dict(), tiny, prefix="")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_cls = oracle(torch.from_numpy(x)).numpy()  # attnpool cls
    out = resnet_clip.resnet_spatial_forward(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), tiny
    )
    got_cls = np.asarray(out["x_norm_clstoken"])
    want_norm = want_cls / np.linalg.norm(want_cls, axis=-1, keepdims=True)
    np.testing.assert_allclose(got_cls, want_norm, rtol=2e-3, atol=2e-3)
    # spatial features: unit-norm, grid 64/32=2 -> 4 tokens
    assert out["x_norm_patchtokens"].shape == (2, 4, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["x_norm_patchtokens"]), axis=-1), 1.0,
        rtol=1e-4,
    )


def test_raw_cproj_spatial_path(tiny):
    params = resnet_clip.init_resnet_clip(jax.random.PRNGKey(0), tiny)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    a = resnet_clip.resnet_spatial_forward(params, x, tiny, True)
    b = resnet_clip.resnet_spatial_forward(params, x, tiny, False)
    # same cls, different locals (attnpool-mixed vs direct c_proj)
    np.testing.assert_allclose(
        np.asarray(a["x_norm_clstoken"]), np.asarray(b["x_norm_clstoken"]),
        rtol=1e-5,
    )
    assert not np.allclose(
        np.asarray(a["x_norm_patchtokens"]), np.asarray(b["x_norm_patchtokens"])
    )

def test_layer3_spatial_path(tiny):
    """res5_out=False surfaces raw layer3 features (stride 16, width*16 ch);
    with res5_out=True use_layer3 has no effect (clip_backbone.py:265-283)."""
    params = resnet_clip.init_resnet_clip(jax.random.PRNGKey(0), tiny)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    l3 = resnet_clip.resnet_spatial_forward(
        params, x, tiny, use_layer3=True, res5_out=False
    )
    # 64/16=4 -> 16 tokens, width*16=256 channels, unit-norm, no projection
    assert l3["x_norm_patchtokens"].shape == (1, 16, 16 * 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(l3["x_norm_patchtokens"]), axis=-1), 1.0,
        rtol=1e-4,
    )
    # CLS is still the layer4 attnpool output
    base = resnet_clip.resnet_spatial_forward(params, x, tiny)
    np.testing.assert_allclose(
        np.asarray(l3["x_norm_clstoken"]), np.asarray(base["x_norm_clstoken"]),
        rtol=1e-5,
    )
    # reference quirk: with res5 present, use_layer3 is a no-op
    quirk = resnet_clip.resnet_spatial_forward(
        params, x, tiny, use_layer3=True, res5_out=True
    )
    np.testing.assert_allclose(
        np.asarray(quirk["x_norm_patchtokens"]),
        np.asarray(base["x_norm_patchtokens"]), rtol=1e-6,
    )
