"""Parity tests for the support-memory projection op.

Oracle = literal reference math (im2txtprojection.py:353-383) in torch:
sim against normalized bank, softmax(sim/T), recombination with the
UN-normalized bank.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from patchioner_tpu.ops import memory_projection as mp


def oracle(features, bank, temperature=0.01, normalize=False):
    f = torch.from_numpy(features).float()
    b = torch.from_numpy(bank).float()
    bn = b / b.norm(dim=-1, keepdim=True)
    f = f / f.norm(dim=-1, keepdim=True)
    sim = f @ bn.T
    w = (sim / temperature).softmax(dim=-1)
    out = w @ b
    if normalize:
        out = out / out.norm(dim=-1, keepdim=True)
    return out.numpy()


def make_data(b=5, m=700, d=128, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((b, d)).astype(np.float32)
    bank = rng.standard_normal((m, d)).astype(np.float32)
    return f, bank


def test_xla_parity():
    f, bank = make_data()
    for norm in (False, True):
        want = oracle(f, bank, normalize=norm)
        got = mp.memory_project_xla(jnp.asarray(f), jnp.asarray(bank), normalize=norm)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_pallas_interpret_parity():
    f, bank = make_data()
    want = oracle(f, bank, normalize=True)
    got = mp.memory_project_pallas(
        jnp.asarray(f),
        jnp.asarray(bank),
        normalize=True,
        block_b=8,
        block_m=256,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_pallas_prepared_bank_and_padding():
    # m deliberately not a multiple of block_m; masked pads must not leak.
    f, bank = make_data(b=3, m=130, d=128)
    prepared = mp.prepare_bank(jnp.asarray(bank), block_m=64)
    assert prepared.rows.shape[0] == 192
    want = oracle(f, bank)
    got = mp.memory_project_pallas(
        jnp.asarray(f), prepared, block_b=8, block_m=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_partial_combine_matches_full():
    f, bank = make_data(m=512)
    shards = np.split(bank, 4)
    parts = [mp.project_partial(jnp.asarray(f), jnp.asarray(s)) for s in shards]
    stacked = mp.PartialProjection(
        jnp.stack([p.max_sim for p in parts]),
        jnp.stack([p.denom for p in parts]),
        jnp.stack([p.acc for p in parts]),
    )
    got = mp.combine_partials(stacked)
    want = oracle(f, bank)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_sharded_bank_tensor_parallel():
    """Bank sharded over a mesh axis; psum/pmax combine must equal the
    single-device projection (the TP path for >HBM banks / throughput)."""
    from jax import shard_map

    f, bank = make_data(b=4, m=512, d=128)
    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("mp",))

    def tp_project(feats, bank_shard):
        part = mp.project_partial(feats, bank_shard)
        return mp.combine_partials(part, axis_name="mp")

    fn = shard_map(
        tp_project,
        mesh=mesh,
        in_specs=(P(), P("mp", None)),
        out_specs=P(),
    )
    got = fn(jnp.asarray(f), jnp.asarray(bank))
    want = oracle(f, bank)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_argmax_and_topk():
    f, bank = make_data()
    fn = torch.from_numpy(f) / torch.from_numpy(f).norm(dim=-1, keepdim=True)
    bn = torch.from_numpy(bank) / torch.from_numpy(bank).norm(dim=-1, keepdim=True)
    sim = fn @ bn.T
    np.testing.assert_array_equal(
        np.asarray(mp.memory_argmax(jnp.asarray(f), jnp.asarray(bank))),
        sim.argmax(dim=-1).numpy(),
    )
    want = sim.sort(dim=-1, descending=True).values[:, :5].numpy()
    got = mp.memory_topk_sims(jnp.asarray(f), jnp.asarray(bank), 5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_int8_quantized_bank_projection():
    """int8 kernel == XLA projection over the dequantized bank (exact math),
    and close to the f32-bank projection (quantization noise only)."""
    f, bank = make_data(b=4, m=300, d=128)
    q = mp.quantize_bank(jnp.asarray(bank), block_m=128)
    assert q.rows.dtype == jnp.int8
    assert q.rows.shape[0] == 384  # padded

    dequant = np.asarray(q.rows[:300], np.float32) * np.asarray(q.scale[:300])
    got = mp.memory_project_int8(
        jnp.asarray(f), q, normalize=True, block_b=8, block_m=128,
        interpret=True,
    )
    # EXACT oracle of the kernel's math: sim uses the dequantized rows
    # scaled by the ORIGINAL rows' inverse norms (q.inv_norm), softmax at
    # 1/temperature, recombination over the raw dequantized rows. Tight
    # tolerance — a kernel defect worth even ~1% (wrong scale placement,
    # dequantized-row norms, etc.) must fail, not hide in slack.
    f_n = f / np.linalg.norm(f, axis=-1, keepdims=True)
    sim = (f_n @ (dequant * np.asarray(q.inv_norm[:300])).T) / 0.01
    w = np.exp(sim - sim.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want_exact = w @ dequant
    want_exact /= np.linalg.norm(want_exact, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), want_exact, rtol=2e-4,
                               atol=2e-5)
    # and against the unquantized projection within quantization noise
    want_f32 = oracle(f, bank, normalize=True)
    np.testing.assert_allclose(np.asarray(got), want_f32, rtol=0.1, atol=0.05)


def test_quantize_bank_chunked_matches_oneshot():
    """Chunked quantization (CC3M-scale memory fix) is bitwise identical to
    quantizing the whole bank at once."""
    rng = np.random.default_rng(11)
    bank = jnp.asarray(rng.standard_normal((300, 64)), jnp.float32)
    a = mp.quantize_bank(bank, block_m=128, chunk_rows=bank.shape[0])
    b = mp.quantize_bank(bank, block_m=128, chunk_rows=77)
    np.testing.assert_array_equal(np.asarray(a.rows), np.asarray(b.rows))
    np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
    np.testing.assert_array_equal(np.asarray(a.inv_norm),
                                  np.asarray(b.inv_norm))
    assert a.num_real == b.num_real == 300
