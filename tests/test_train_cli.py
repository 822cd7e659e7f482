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
    # every mixed index shares the image but differs from the original
    for i, j in enumerate(mix):
        assert ds.image_ids[i] == ds.image_ids[j]
        assert i != j  # all images have 3 captions here


def test_batch_iterator_sharding():
    batches = list(data.batch_iterator(100, 10, num_shards=2, shard_index=0))
    batches2 = list(data.batch_iterator(100, 10, num_shards=2, shard_index=1))
    flat = np.concatenate(batches + batches2)
    assert len(set(flat.tolist())) == 100  # disjoint cover


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
