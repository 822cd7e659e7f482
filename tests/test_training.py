"""Decoder training step: loss parity vs torch, and mesh-sharded execution."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patchioner_tpu.models import decap, gpt2
from patchioner_tpu.parallel import sharding
from patchioner_tpu.train import decoder_train


def test_smoothed_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 6, 11)).astype(np.float32)
    targets = rng.integers(0, 11, (4, 6))
    targets[0, :3] = 0  # ignored positions
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 11),
        torch.from_numpy(targets).reshape(-1),
        ignore_index=0,
        label_smoothing=0.1,
    ).item()
    got, _ = decoder_train._smoothed_ce(
        jnp.asarray(logits), jnp.asarray(targets), 0.1
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def _tiny_setup(vocab=101, prefix=16):
    cfg = gpt2.GPT2Config(vocab_size=vocab, n_positions=32, n_embd=32,
                          n_layer=2, n_head=2)
    params = decap.init_decap(jax.random.PRNGKey(0), cfg, prefix)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, prefix)).astype(np.float32)
    toks = rng.integers(1, vocab, (8, 10)).astype(np.int32)
    toks[:, 7:] = 0  # padding
    return cfg, params, feats, toks


def test_loss_decreases_single_device():
    cfg, params, feats, toks = _tiny_setup()
    tcfg = decoder_train.TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50)
    tx = decoder_train.make_optimizer(tcfg)
    step = decoder_train.make_train_step(cfg, tcfg, tx)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(12):
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(feats), jnp.asarray(toks), key
        )
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_sharded_train_step_matches_single_device():
    """dp x mp sharded step == unsharded step (8 virtual CPU devices)."""
    cfg, params, feats, toks = _tiny_setup()
    bank = np.random.default_rng(1).standard_normal((64, 16)).astype(np.float32)
    tcfg = decoder_train.TrainConfig(
        lr=1e-3, warmup_steps=2, total_steps=50, gaussian_noise=0.0
    )
    tx = decoder_train.make_optimizer(tcfg)
    key = jax.random.PRNGKey(1)

    plain = decoder_train.make_train_step(cfg, tcfg, tx, use_bank=True)
    p1, o1, m1 = plain(
        params, tx.init(params), jnp.asarray(feats), jnp.asarray(toks), key,
        jnp.asarray(bank),
    )

    mesh = sharding.make_mesh(dp=4, mp=2)
    with mesh:
        stepm = decoder_train.make_train_step(
            cfg, tcfg, tx, use_bank=True, mesh=mesh
        )
        p2, o2, m2 = stepm(
            params, tx.init(params), jnp.asarray(feats), jnp.asarray(toks), key,
            jnp.asarray(bank),
        )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_sharded_memory_project_matches_local():
    from patchioner_tpu.ops import memory_projection as mp_ops

    rng = np.random.default_rng(2)
    f = rng.standard_normal((8, 32)).astype(np.float32)
    bank = rng.standard_normal((128, 32)).astype(np.float32)
    mesh = sharding.make_mesh(dp=4, mp=2)
    fn = sharding.sharded_memory_project(mesh, normalize=True)
    with mesh:
        got = fn(jnp.asarray(f), jnp.asarray(bank))
    want = mp_ops.memory_project_xla(jnp.asarray(f), jnp.asarray(bank), normalize=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_capdec_noise_and_projection_pipeline():
    rng = np.random.default_rng(3)
    f = rng.standard_normal((4, 32)).astype(np.float32)
    bank = rng.standard_normal((64, 32)).astype(np.float32)
    out = decoder_train.prepare_features(
        jnp.asarray(f),
        key=jax.random.PRNGKey(0),
        gaussian_noise=0.016,
        bank=jnp.asarray(bank),
    )
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_chunked_loss_matches_unchunked():
    """loss_chunk must be numerically equivalent (loss, acc, AND grads) to the
    plain loss — it only changes how the lm head is applied (chunked under
    lax.scan + jax.checkpoint so the (B, T, V) logits never materialize)."""
    cfg, params, feats, toks = _tiny_setup()
    feats = jnp.asarray(feats)
    toks = jnp.asarray(toks)

    def loss_fn(p, chunk):
        return decoder_train.decap_loss(
            p, feats, toks, cfg, label_smoothing=0.1, loss_chunk=chunk
        )

    (l0, a0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(params, 0)
    # chunk=4 divides T=10 unevenly -> exercises the ignore-index padding.
    for chunk in (4, 10, 64):
        (l1, a1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, chunk)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        np.testing.assert_allclose(float(a1), float(a0), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for x, y in zip(flat0, flat1):
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=5e-5, atol=1e-6
            )


def test_chunked_loss_train_step_and_sharded():
    """The chunked loss trains (loss decreases) and produces the same params
    as the unchunked step on the virtual mesh."""
    cfg, params, feats, toks = _tiny_setup()
    tcfg_c = decoder_train.TrainConfig(
        lr=1e-3, warmup_steps=2, total_steps=50, loss_chunk=4
    )
    tcfg_u = decoder_train.TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50)
    mesh = sharding.make_mesh(dp=4, mp=2)
    outs = []
    for tcfg in (tcfg_c, tcfg_u):
        tx = decoder_train.make_optimizer(tcfg)
        step = decoder_train.make_train_step(cfg, tcfg, tx, mesh=mesh)
        # The train step donates params/opt_state — give each run its own copy.
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt_state = tx.init(p)
        key = jax.random.PRNGKey(0)
        with mesh:
            for _ in range(3):
                p, opt_state, metrics = step(
                    p, opt_state, jnp.asarray(feats), jnp.asarray(toks), key
                )
        outs.append((jax.tree_util.tree_leaves(p), float(metrics["loss"])))
    for a, b in zip(outs[0][0], outs[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4)


def test_grad_accum_matches_single_step():
    """grad_accum=A over (A, M, ...) micro-batches must produce the SAME
    update as the plain step on the flat (A*M, ...) batch — the accumulated
    gradient is the token-count-weighted sum divided by the global mask
    count, i.e. exactly the big-batch CE gradient (noise off; with noise the
    per-micro-batch keys intentionally differ)."""
    cfg, params, feats, toks = _tiny_setup()
    bank = np.random.default_rng(4).standard_normal((64, 16)).astype(np.float32)
    key = jax.random.PRNGKey(2)
    outs = []
    for accum in (1, 2, 4):
        tcfg = decoder_train.TrainConfig(
            lr=1e-3, warmup_steps=2, total_steps=50, grad_accum=accum
        )
        tx = decoder_train.make_optimizer(tcfg)
        step = decoder_train.make_train_step(cfg, tcfg, tx, use_bank=True)
        f = jnp.asarray(feats.reshape(accum, 8 // accum, -1)) if accum > 1 \
            else jnp.asarray(feats)
        t = jnp.asarray(toks.reshape(accum, 8 // accum, -1)) if accum > 1 \
            else jnp.asarray(toks)
        p = jax.tree_util.tree_map(jnp.copy, params)
        p, _, m = step(p, tx.init(p), f, t, key, jnp.asarray(bank))
        outs.append((jax.tree_util.tree_leaves(p), float(m["loss"]),
                     float(m["acc"])))
    for leaves, loss, acc in outs[1:]:
        np.testing.assert_allclose(loss, outs[0][1], rtol=1e-5)
        np.testing.assert_allclose(acc, outs[0][2], rtol=1e-5)
        for a, b in zip(leaves, outs[0][0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_grad_accum_packed_and_sharded():
    """Packed grad_accum == packed plain step, both on the (dp, mp) mesh
    (leading micro-batch axis replicated, rows dp-sharded)."""
    from patchioner_tpu.train import packing

    cfg, params, feats, toks = _tiny_setup()
    tcfg0 = decoder_train.TrainConfig(lr=1e-3, warmup_steps=2, total_steps=50)
    mesh = sharding.make_mesh(dp=4, mp=2)
    pack_np = packing.pack_captions(toks, row_len=16, max_segments=2)
    r = pack_np.targets.shape[0]
    pad = (-r) % 8  # rows divisible by accum * dp
    if pad:
        pack_np = packing.PackedBatch(
            *(np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
              for a in pack_np)
        )
    r = pack_np.targets.shape[0]
    outs = []
    for accum in (1, 2):
        tcfg = decoder_train.TrainConfig(
            lr=1e-3, warmup_steps=2, total_steps=50, grad_accum=accum
        )
        tx = decoder_train.make_optimizer(tcfg)
        if accum > 1:
            pack = packing.PackedBatch(
                *(jnp.asarray(a.reshape((accum, r // accum) + a.shape[1:]))
                  for a in pack_np)
            )
        else:
            pack = packing.PackedBatch(*(jnp.asarray(a) for a in pack_np))
        p = jax.tree_util.tree_map(jnp.copy, params)
        with mesh:
            step = decoder_train.make_packed_train_step(
                cfg, tcfg, tx, mesh=mesh
            )
            p, _, m = step(p, tx.init(p), jnp.asarray(feats), pack,
                           jax.random.PRNGKey(0))
        outs.append((jax.tree_util.tree_leaves(p), float(m["loss"]),
                     float(m["acc"])))
    np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=1e-5)
    np.testing.assert_allclose(outs[1][2], outs[0][2], rtol=1e-5)
    for a, b in zip(outs[1][0], outs[0][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
