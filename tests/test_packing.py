"""Packed-sequence decoder training (train/packing.py +
decoder_train.decap_loss_packed + gpt2.gpt2_hidden_packed).

Packing is a TPU upside feature with no reference counterpart (the reference
pads every caption to max_seq_len, src/dataset.py); its correctness property
is exact per-token equivalence with the unpacked loss over the same
captions, which these tests pin — loss, accuracy, AND gradients.
"""

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.models import decap, gpt2
from patchioner_tpu.parallel import sharding
from patchioner_tpu.train import decoder_train, packing


def _caption_batch(rng, n=8, t=10, vocab=101):
    """Realistic CaptionDataset row layout: ids then EOT then 0-padding
    (a full-length row keeps EOT as its last token; lengths are derived
    from the EOT position like data.caption_lengths does — a genuine
    interior token id 0 must not truncate the span)."""
    from patchioner_tpu.text import clip_bpe

    toks = rng.integers(1, vocab, (n, t)).astype(np.int32)
    lengths = rng.integers(3, t + 1, n)
    for i, l in enumerate(lengths):
        toks[i, l - 1] = clip_bpe.EOT_TOKEN
        toks[i, l:] = 0
    return toks


def test_pack_captions_roundtrip():
    rng = np.random.default_rng(0)
    toks = _caption_batch(rng)
    pack = packing.pack_captions(toks, row_len=16)
    lengths = (toks != 0).sum(1)
    # every caption appears exactly once, with intact targets and the
    # prefix slot at its start
    seen = {}
    r, l = pack.targets.shape
    for ri in range(r):
        for si in range(1, pack.segment_ids[ri].max() + 1):
            sel = pack.segment_ids[ri] == si
            tgt = pack.targets[ri][sel]
            fi = int(pack.seg_feature_idx[ri, si - 1])
            assert fi not in seen
            seen[fi] = tgt
            np.testing.assert_array_equal(tgt, toks[fi, : lengths[fi]])
            # slot structure: prefix first, then the shifted tokens
            pm = pack.prefix_mask[ri][sel]
            assert pm[0] and not pm[1:].any()
            np.testing.assert_array_equal(
                pack.input_tokens[ri][sel][1:], toks[fi, : lengths[fi] - 1]
            )
            np.testing.assert_array_equal(
                pack.pos_ids[ri][sel], np.arange(lengths[fi])
            )
    assert set(seen) == set(range(len(toks)))
    # pad slots are fully zeroed
    padm = pack.segment_ids == 0
    assert (pack.targets[padm] == 0).all() and not pack.prefix_mask[padm].any()
    assert packing.packing_efficiency(pack) > 0.5


def test_pack_respects_order_and_segment_cap():
    rng = np.random.default_rng(1)
    toks = _caption_batch(rng, n=12, t=8)
    order = np.random.default_rng(2).permutation(12)
    pack = packing.pack_captions(toks, row_len=32, order=order,
                                 max_segments=2)
    assert pack.seg_feature_idx.shape[1] == 2
    assert (np.asarray([s.max() for s in pack.segment_ids]) <= 2).all()
    # next-fit preserves the requested order
    nonpad = [f for ri, row in enumerate(pack.seg_feature_idx)
              for si, f in enumerate(row)
              if (pack.segment_ids[ri] == si + 1).any()]
    np.testing.assert_array_equal(nonpad, order)


def _tiny_setup(vocab=49408, prefix=16):
    # full CLIP vocab so the realistic EOT-terminated rows index wte in range
    cfg = gpt2.GPT2Config(vocab_size=vocab, n_positions=32, n_embd=32,
                          n_layer=2, n_head=2)
    params = decap.init_decap(jax.random.PRNGKey(0), cfg, prefix)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, prefix)).astype(np.float32)
    toks = _caption_batch(rng, n=8, t=10, vocab=vocab)
    return cfg, params, feats, toks


def test_packed_loss_matches_unpacked():
    """Same captions -> identical loss/acc/grads (packing only changes which
    slots do useful work; f32 summation order differs -> tolerances)."""
    cfg, params, feats, toks = _tiny_setup()
    featsj, toksj = jnp.asarray(feats), jnp.asarray(toks)
    pack_np = packing.pack_captions(toks, row_len=16)
    pack = packing.PackedBatch(*(jnp.asarray(a) for a in pack_np))

    def unpacked(p):
        return decoder_train.decap_loss(p, featsj, toksj, cfg,
                                        label_smoothing=0.1)

    def packed(p, chunk=0):
        # seg features: plain gather (no noise) mirrors the unpacked call
        r, s = pack.seg_feature_idx.shape
        sf = featsj[pack.seg_feature_idx.reshape(-1)].reshape(r, s, -1)
        return decoder_train.decap_loss_packed(
            p, sf, pack, cfg, label_smoothing=0.1, loss_chunk=chunk
        )

    (l0, a0), g0 = jax.value_and_grad(unpacked, has_aux=True)(params)
    for chunk in (0, 4):
        (l1, a1), g1 = jax.value_and_grad(
            lambda p: packed(p, chunk), has_aux=True
        )(params)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        np.testing.assert_allclose(float(a1), float(a0), rtol=1e-5)
        for x, y in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=5e-4, atol=1e-6)


def test_packed_train_step_matches_unpacked_on_mesh():
    """One packed train step == one unpacked step (same captions, no noise)
    on the virtual mesh."""
    cfg, params, feats, toks = _tiny_setup()
    tcfg = decoder_train.TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50)
    mesh = sharding.make_mesh(dp=4, mp=2)
    pack_np = packing.pack_captions(toks, row_len=16, max_segments=2)
    # pad rows to a dp multiple with all-zero rows (contribute nothing)
    r = pack_np.targets.shape[0]
    pad = (-r) % 4
    if pad:
        pack_np = packing.PackedBatch(
            *(np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
              for a in pack_np)
        )
    pack = packing.PackedBatch(*(jnp.asarray(a) for a in pack_np))

    outs = []
    for packed in (True, False):
        tx = decoder_train.make_optimizer(tcfg)
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = tx.init(p)
        key = jax.random.PRNGKey(0)
        with mesh:
            if packed:
                step = decoder_train.make_packed_train_step(
                    cfg, tcfg, tx, mesh=mesh
                )
                p, opt_state, m = step(p, opt_state, jnp.asarray(feats),
                                       pack, key)
            else:
                step = decoder_train.make_train_step(cfg, tcfg, tx, mesh=mesh)
                p, opt_state, m = step(p, opt_state, jnp.asarray(feats),
                                       jnp.asarray(toks), key)
        outs.append((jax.tree_util.tree_leaves(p), float(m["loss"]),
                     float(m["acc"])))
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    np.testing.assert_allclose(outs[0][2], outs[1][2], rtol=1e-5)


def test_packed_cli_smoke(tmp_path):
    """--pack_len end-to-end through the training CLI (pre-extracted
    features, mesh, noise, mix)."""
    import json

    from patchioner_tpu.train import cli

    n_caps = 24
    anns = [
        {"image_id": i // 3, "caption": f"caption number {i} about a dog"}
        for i in range(n_caps)
    ]
    data = tmp_path / "captions.json"
    data.write_text(json.dumps({"annotations": anns}))
    feats = np.random.default_rng(0).standard_normal(
        (n_caps, 32)
    ).astype(np.float32)
    fp = tmp_path / "features.npy"
    np.save(fp, feats)
    out = tmp_path / "ckpt"
    cli.main([
        "--data", str(data), "--features", str(fp), "--out_dir", str(out),
        "--epochs", "2", "--bs", "4", "--pack_len", "32",
        "--n_layer", "1", "--n_head", "2", "--n_embd", "32",
        "--prefix_size", "32", "--max_seq_len", "16", "--vocab_size", "49408",
        "--gaussian_noise", "0.016", "--mix_captions",
        "--dp", "4", "--mp", "2", "--limit_steps", "3",
    ])
    log = (out / "train_log.csv").read_text().strip().splitlines()
    assert len(log) >= 1
    loss = float(log[0].split(",")[2])
    assert np.isfinite(loss) and loss > 0
