"""Edge-case hardening: degenerate batch/box/trace shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchioner_tpu.ops import memory_projection as memproj
from patchioner_tpu.ops import region_pooling as rp


def test_single_image_single_box():
    tokens = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8))
    out = rp.extract_bbox_features(
        tokens, jnp.asarray([[[0, 0, 14, 14]]], jnp.float32), patch_size=14
    )
    assert out.shape == (1, 1, 8)
    assert bool(jnp.isfinite(out).all())


def test_attention_weights_with_one_box():
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    attn = jax.random.uniform(jax.random.PRNGKey(2), (2, 16), minval=0.01)
    out = rp.extract_bbox_features(
        tokens, jnp.asarray([[[0, 0, 27, 27]]] * 2, jnp.float32),
        patch_size=14, attention_map=attn,
    )
    assert out.shape == (2, 1, 8)
    assert bool(jnp.isfinite(out).all())


def test_trace_with_single_point_and_empty_mask():
    pts = jnp.asarray([[[0.5, 0.5]], [[2.0, 2.0]]], jnp.float32)  # 2nd oob
    valid = jnp.ones((2, 1))
    grid = rp.traces_to_grid(pts, valid, 4)
    assert float(grid[0].sum()) == 1.0
    assert float(grid[1].sum()) == 0.0


def test_memory_project_single_row_bank():
    f = jax.random.normal(jax.random.PRNGKey(3), (2, 128))
    bank = jax.random.normal(jax.random.PRNGKey(4), (1, 128))
    out = memproj.memory_project_xla(f, bank)
    # softmax over one row == that row exactly
    np.testing.assert_allclose(
        np.asarray(out), np.tile(np.asarray(bank), (2, 1)), rtol=1e-5
    )
    out_p = memproj.memory_project_pallas(
        f, bank, block_b=8, block_m=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out), rtol=1e-4)


def test_batch_of_one_through_model():
    from patchioner_tpu.models import decap, gpt2, vit
    from patchioner_tpu.models.patchioner import Patchioner

    cfg = vit.ViTConfig(img_size=28, patch_size=14, embed_dim=64, depth=1,
                        num_heads=2, num_registers=0, extract_heads=2,
                        pos_grid=2)
    gcfg = gpt2.GPT2Config(vocab_size=300, n_layer=1, n_head=2, n_embd=64)
    m = Patchioner(
        vit_cfg=cfg,
        vit_params=vit.init_vit(jax.random.PRNGKey(0), cfg),
        gpt2_cfg=gcfg,
        decoder=decap.init_decap(jax.random.PRNGKey(1), gcfg, 64),
        bank=memproj.prepare_bank(jax.random.normal(jax.random.PRNGKey(2), (32, 64))),
        bank_texts=None,
    )
    img = np.random.default_rng(0).standard_normal((1, 28, 28, 3)).astype(np.float32)
    outs = m.forward(img, get_cls_capt=True,
                     traces=[[{"x": 0.5, "y": 0.5}]],
                     bboxes=np.asarray([[[0, 0, 14, 14]]], np.float32))
    assert len(outs["cls_capt"]) == 1
    assert len(outs["trace_capts"]) == 1
    assert len(outs["bbox_capts"][0]) == 1


def test_runner_cli_dry_run(tmp_path):
    import json

    from patchioner_tpu.eval import runner

    grid = {
        "output_directory": str(tmp_path),
        "experiments": [
            {"model": "m1", "tasks": {"trace_captioning": {
                "caption_mode": ["trace", "cls"]}}}
        ],
    }
    p = tmp_path / "grid.json"
    p.write_text(json.dumps(grid))
    runner.main([str(p), "--dry-run"])
