"""Unit tests for the convergence-proof building blocks
(train/synthetic.py world generator + train/align.py trainer surfaces).

The end-to-end behavior is pinned by tests/test_convergence.py; these are
the fast structural checks (determinism, geometry, masking, config
validation) that localize a failure before the expensive proof runs.
"""

import numpy as np
import pytest


def test_world_grammar_and_split_determinism():
    from patchioner_tpu.train import synthetic

    combos = synthetic.all_combos()
    assert len(combos) == len(synthetic.COLORS) * len(synthetic.SHAPES) * \
        len(synthetic.POSITIONS)
    assert combos[0].caption.startswith("a ")
    # split is deterministic and disjoint
    t1, h1 = synthetic.split_combos(combos, 16, seed=3)
    t2, h2 = synthetic.split_combos(combos, 16, seed=3)
    assert [c.caption for c in t1] == [c.caption for c in t2]
    assert not (set(c.caption for c in t1) & set(c.caption for c in h1))
    assert len(h1) == 16 and len(t1) == len(combos) - 16


def test_render_is_seed_deterministic_and_object_in_quadrant():
    from patchioner_tpu.train import synthetic

    combo = synthetic.Combo("red", "square", "bottom right")
    a = synthetic.render_combo(combo, np.random.default_rng(7), 56)
    b = synthetic.render_combo(combo, np.random.default_rng(7), 56)
    assert np.array_equal(a, b)
    assert a.shape == (56, 56, 3) and a.dtype == np.uint8
    # the red object lives in the bottom-right quadrant only
    red = (a[:, :, 0].astype(int) - a[:, :, 1].astype(int)) > 60
    ys, xs = np.nonzero(red)
    assert ys.min() >= 28 and xs.min() >= 28


def test_trace_points_and_patch_mask_agree_on_quadrant():
    from patchioner_tpu.train import synthetic

    combo = synthetic.Combo("blue", "circle", "top right")
    pts = synthetic.trace_for(combo, np.random.default_rng(0), 20)
    assert all(0.5 <= p["x"] <= 1.0 and 0.0 <= p["y"] <= 0.5 for p in pts)
    mask = synthetic.patch_mask_for(combo, 4).reshape(4, 4)
    assert mask[:2, 2:].all() and mask.sum() == 4


def test_eval_dataset_schema(tmp_path):
    import json

    from patchioner_tpu.train import synthetic

    combos = synthetic.all_combos(("red",), ("square",), ("top left",))
    ann = synthetic.write_eval_dataset(str(tmp_path), combos,
                                       samples_per_combo=2, seed=1)
    data = json.load(open(ann))
    assert len(data) == 2
    for img_id, obj in data.items():
        assert "coco" not in img_id  # loader zfills ids for 'coco' files
        assert obj["captions"] == ["a red square in the top left"]
        assert all(0 <= p["x"] <= 1 for p in obj["traces"][0])
        assert (tmp_path / "images" / f"{img_id}.jpg").exists()


def test_align_config_rejects_mismatched_spaces():
    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.models import vit as vit_mod
    from patchioner_tpu.train import align

    vit_cfg = vit_mod.config_for("dinov2_vits14", img_size=56, embed_dim=128,
                                 depth=1, num_heads=4, num_registers=0,
                                 pos_grid=4)
    text_cfg = clip_mod.ClipTextConfig(width=64, depth=1, heads=2,
                                       proj_dim=96)  # != 128
    with pytest.raises(ValueError, match="share one space"):
        align.AlignConfig(vit=vit_cfg, text=text_cfg)


def test_align_embeds_shapes_and_masked_pooling():
    import jax
    import jax.numpy as jnp

    from patchioner_tpu.models import clip as clip_mod
    from patchioner_tpu.models import vit as vit_mod
    from patchioner_tpu.train import align

    vit_cfg = vit_mod.config_for("dinov2_vits14", img_size=56, embed_dim=64,
                                 depth=1, num_heads=4, num_registers=0,
                                 pos_grid=4)
    text_cfg = clip_mod.ClipTextConfig(context_length=12, width=64, depth=1,
                                       heads=2, proj_dim=64)
    cfg = align.AlignConfig(vit=vit_cfg, text=text_cfg, steps=1, batch=2)
    params = align.init_align(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 56, 56, 3), np.uint8)
    )
    mask = jnp.asarray(np.eye(16, dtype=bool)[:2])  # one patch each
    emb = align.image_embed(params["vit"], px, vit_cfg, mask)
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5
    )
    toks = jnp.zeros((2, 12), jnp.int32).at[:, 0].set(49406).at[:, 1].set(
        49407
    )
    temb = align.text_embed(params["text"], toks, text_cfg)
    assert temb.shape == (2, 64)
