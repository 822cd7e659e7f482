"""Training CLI + dataset + checkpoint tests (tiny corpus, 8-dev CPU mesh)."""

import json
import random

import numpy as np
import pytest

from patchioner_tpu.train import cli, data


def make_corpus(tmp_path, n_caps=24):
    anns = [
        {"image_id": i // 3, "caption": f"caption number {i} about a dog"}
        for i in range(n_caps)
    ]
    p = tmp_path / "captions.json"
    p.write_text(json.dumps({"annotations": anns}))
    feats = np.random.default_rng(0).standard_normal((n_caps, 32)).astype(np.float32)
    fp = tmp_path / "features.npy"
    np.save(fp, feats)
    return str(p), str(fp)


def test_caption_dataset_and_mix(tmp_path):
    p, _ = make_corpus(tmp_path)
    caps, ids = data.load_coco_captions(p)
    ds = data.CaptionDataset(caps, ids, max_len=16)
    assert ds.tokens.shape == (24, 16)
    assert ds.tokens[0, 0] == 49406  # SOT
    mix = ds.mix_indices(random.Random(0))
    # every mixed index shares the image; the draw is uniform over the
    # image's captions INCLUDING the caption itself
    # (datasetMix.py:49 random.choice(range(num_captions)), no
    # self-exclusion) — with 24 captions at ~1/3 self-probability, both
    # self and non-self pairings must appear
    for i, j in enumerate(mix):
        assert ds.image_ids[i] == ds.image_ids[j]
    pairs = [i == j for i, j in enumerate(mix)]
    assert any(pairs) and not all(pairs)


def test_caption_dataset_raw_slice_truncation():
    """pad_tokens semantics (src/dataset.py:18-24): a too-long caption is
    tokenized at the native 77 and RAW-sliced to max_seq_len — its last
    kept token is whatever the BPE produced there, NO EOT re-insert."""
    from patchioner_tpu.text import clip_bpe

    long_cap = " ".join(["zebra"] * 30)  # >> 6 tokens
    ds = data.CaptionDataset([long_cap], max_len=6)
    tok = clip_bpe.get_tokenizer()
    oracle = np.asarray(tok.tokenize([long_cap], 77))[:, :6]
    np.testing.assert_array_equal(ds.tokens, oracle)
    assert ds.tokens[0, -1] != clip_bpe.EOT_TOKEN
    assert (ds.tokens[0] != 0).all()  # no pad inside a truncated caption


def test_batch_iterator_sharding():
    batches = list(data.batch_iterator(100, 10, num_shards=2, shard_index=0))
    batches2 = list(data.batch_iterator(100, 10, num_shards=2, shard_index=1))
    flat = np.concatenate(batches + batches2)
    assert len(set(flat.tolist())) == 100  # disjoint cover

    # n not divisible by num_shards: shards pad by wrapping to EQUAL batch
    # counts (DistributedSampler semantics) — unequal counts would hang a
    # multi-host SPMD loop on a collective one host never joins
    # incl. n < num_shards (a single wrap slice can only supply n extras;
    # the pad must repeat cyclically like DistributedSampler)
    for n, shards, bs in [(101, 2, 10), (7, 3, 2), (100, 3, 7),
                          (1, 3, 1), (2, 5, 1), (3, 8, 1)]:
        per_shard = [
            list(data.batch_iterator(n, bs, num_shards=shards, shard_index=s))
            for s in range(shards)
        ]
        counts = {len(b) for b in per_shard}
        assert len(counts) == 1, (n, shards, bs, counts)
        covered = set(np.concatenate([np.concatenate(b) for b in per_shard if b]).tolist()) if any(per_shard) else set()
        assert covered <= set(range(n))


def test_cli_trains_and_resumes(tmp_path):
    p, fp = make_corpus(tmp_path)
    out = tmp_path / "ckpt"
    argv = [
        "--data", p, "--features", fp, "--out_dir", str(out),
        "--epochs", "1", "--bs", "8", "--prefix_size", "32",
        "--max_seq_len", "16", "--gaussian_noise", "0.01",
        "--n_layer", "1", "--n_head", "2", "--n_embd", "32",
        "--vocab_size", "49408",
        "--mix_captions", "--dp", "4", "--mp", "2", "--limit_steps", "2",
        "--grad_accum", "2",
    ]
    cli.main(argv)
    assert (out / "train_log.csv").exists()

    from patchioner_tpu.io.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(out))
    assert mgr.latest_step() == 2

    # resume continues from the saved step
    cli.main(argv + ["--resume", "--limit_steps", "3"])
    assert CheckpointManager(str(out)).latest_step() == 3


def test_params_npz_roundtrip(tmp_path):
    import jax

    from patchioner_tpu.io import checkpoints as ckpt
    from patchioner_tpu.models import decap, gpt2

    cfg = gpt2.GPT2Config(vocab_size=101, n_embd=16, n_layer=1, n_head=2)
    params = decap.init_decap(jax.random.PRNGKey(0), cfg, 8)
    path = str(tmp_path / "params.npz")
    ckpt.save_params_npz(path, params)
    restored = ckpt.load_params_npz(path, params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trained_decoder_round_trips_into_captioner(tmp_path, monkeypatch):
    """A decoder trained with THIS framework's CLI loads back into
    `Patchioner.from_config` by pointing `decap_weights` at the Orbax
    out_dir — the native equivalent of the reference's torch.save ->
    torch.load round trip (decoderTraining.py:355-359 -> decap.py:207-218).
    """
    import jax.numpy as jnp
    import yaml

    from patchioner_tpu.io.checkpoints import (
        CheckpointManager, load_decap_from_train_dir,
    )
    from patchioner_tpu.models import vit
    from patchioner_tpu.models.patchioner import Patchioner

    # train 1 step at the captioner's fixed decoder geometry (4L/4H/768)
    anns = [{"image_id": i, "caption": f"a dog number {i}"} for i in range(8)]
    p = tmp_path / "caps.json"
    p.write_text(json.dumps({"annotations": anns}))
    feats = np.random.default_rng(0).standard_normal((8, 768)).astype(
        np.float32)
    fp = tmp_path / "feats.npy"
    np.save(fp, feats)
    out = tmp_path / "ckpt"
    cli.main([
        "--data", str(p), "--features", str(fp), "--out_dir", str(out),
        "--epochs", "1", "--bs", "8", "--prefix_size", "768",
        "--max_seq_len", "16", "--limit_steps", "1", "--loss_chunk", "4",
    ])
    trained = load_decap_from_train_dir(str(out))

    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    cfg = {
        "decap_weights": str(out),
        "prefix_size": 768,
        "support_memory_size": 16,
        "dino_model": "dinov2_vitb14_reg",
        "crop_dim": 56,
        "normalize": True,
        "projection_type": "coco",
    }
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    m = Patchioner.from_config(str(cfg_path), allow_missing_weights=True)
    # the captioner really carries the TRAINED weights, not a random init
    np.testing.assert_array_equal(
        np.asarray(m.decoder.clip_project["w"]),
        np.asarray(trained.clip_project["w"]))
    imgs = np.random.default_rng(1).standard_normal(
        (1, 56, 56, 3)).astype(np.float32)
    outs = m.forward(jnp.asarray(imgs), get_cls_capt=True)
    assert isinstance(outs["cls_capt"][0], str)


def test_mismatched_train_checkpoint_rejected(tmp_path, monkeypatch):
    """A train checkpoint with the wrong decoder geometry fails loudly in
    from_config instead of producing shape errors mid-forward."""
    import yaml

    from patchioner_tpu.models import vit
    from patchioner_tpu.models.patchioner import Patchioner

    p, fp = make_corpus(tmp_path)
    out = tmp_path / "ckpt_small"
    cli.main([
        "--data", p, "--features", fp, "--out_dir", str(out),
        "--epochs", "1", "--bs", "8", "--prefix_size", "32",
        "--max_seq_len", "16", "--n_layer", "1", "--n_head", "2",
        "--n_embd", "32", "--limit_steps", "1",
    ])
    small = dict(vit.VARIANTS["dinov2_vitb14_reg"], depth=2)
    monkeypatch.setitem(vit.VARIANTS, "dinov2_vitb14_reg", small)
    cfg = {
        "decap_weights": str(out),
        "prefix_size": 768,
        "support_memory_size": 16,
        "dino_model": "dinov2_vitb14_reg",
        "crop_dim": 56,
        "normalize": True,
        "projection_type": "coco",
    }
    cfg_path = tmp_path / "model.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="decoder checkpoint"):
        Patchioner.from_config(str(cfg_path), allow_missing_weights=True)


def test_cli_resume_after_completion_runs_no_extra_epochs(tmp_path):
    """A resume of a COMPLETED run must not re-train all epochs on top of
    the checkpoint (round 4: the epoch loop previously restarted at epoch
    0, running the LR schedule off its end to lr=0 and doubling the run)."""
    p, fp = make_corpus(tmp_path)
    out = tmp_path / "ckpt"
    argv = [
        "--data", p, "--features", fp, "--out_dir", str(out),
        "--epochs", "2", "--bs", "8", "--prefix_size", "32",
        "--max_seq_len", "16",
        "--n_layer", "1", "--n_head", "2", "--n_embd", "32",
        "--vocab_size", "49408", "--dp", "4", "--mp", "2",
    ]
    cli.main(argv)
    from patchioner_tpu.io.checkpoints import CheckpointManager

    done_step = CheckpointManager(str(out)).latest_step()
    assert done_step and done_step > 0
    cli.main(argv + ["--resume"])
    assert CheckpointManager(str(out)).latest_step() == done_step
