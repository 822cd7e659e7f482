"""DeCap/CapDec decoder training — text-only reconstruction, mesh-sharded.

Reference: src/decap/decoderTraining.py:62-387. A frozen text encoder embeds
captions; the embedding is optionally memory-projected (`--im_proj`,
normalize=True) and optionally noised (CapDec, re-normalized); DeCap
reconstructs the caption with CE loss (ignore_index=0, label smoothing 0.1),
AdamW + linear-warmup schedule.

The reference scales with torch DDP over NCCL (:78,232-238). Here the whole
step is ONE jitted program over a `jax.sharding.Mesh`:
  * batch sharded over the 'dp' axis (DistributedSampler equivalent),
  * the support-memory bank sharded over 'mp' (tensor parallelism for the
    projection's (B, M) softmax — XLA inserts the psum/pmax collectives),
  * gradient all-reduce emerges from the sharding, like DDP's but fused.
Metric reductions (loss/accuracy all_reduce, :364-372) fall out of the same
program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from patchioner_tpu.models import decap as decap_mod
from patchioner_tpu.models import gpt2 as gpt2_mod

__all__ = [
    "TrainConfig", "decap_loss", "decap_loss_packed", "make_train_step",
    "make_packed_train_step", "make_optimizer",
]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5  # reference CLI default (decoderTraining.py:418)
    # reference train_decoder default (decoderTraining.py:63; main() never
    # overrides it)
    warmup_steps: int = 1000
    total_steps: int = 100_000
    # the reference optimizer is torch AdamW(model.parameters(), lr)
    # (decoderTraining.py:255) — torch's DEFAULT decoupled weight decay is
    # 0.01, not 0
    weight_decay: float = 0.01
    label_smoothing: float = 0.1  # :229
    gaussian_noise: float = 0.0  # CapDec variant (:314-316)
    grad_clip: Optional[float] = None
    # Chunked lm-head CE: compute logits `loss_chunk` sequence positions at a
    # time under lax.scan + jax.checkpoint so the (B, T, V) f32 logits never
    # materialize (33 GB at B=4096/T=40/V=50257 — the round-3 OOM wall in
    # PERF.md's training table). 0 = the plain unchunked loss. Numerically
    # identical up to f32 summation order (parity-tested incl. grads).
    loss_chunk: int = 0
    # Gradient accumulation: the step takes inputs with a leading
    # (grad_accum,) micro-batch axis, scans the forward+backward over it,
    # and applies ONE optimizer update from the token-count-weighted sum of
    # micro-gradients — exactly the gradient the single big batch would
    # produce (the CE normalizes over non-pad tokens, so micro losses are
    # accumulated as sums and divided by the GLOBAL mask count; parity-tested
    # vs the plain step). Lets batch-size recipes beyond one chip's
    # activation memory train without sharding changes. 1 = off.
    grad_accum: int = 1


def _smoothed_ce(logits, targets, label_smoothing, ignore_index=0):
    """torch.nn.CrossEntropyLoss(ignore_index=0, label_smoothing=0.1) parity:
    mean over non-ignored positions of smoothed NLL."""
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = (targets != ignore_index).astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0), mask


def _smoothed_ce_chunked(hidden, wte, targets, label_smoothing, chunk,
                         ignore_index=0, mask=None):
    """Smoothed CE + argmax accuracy from post-ln_f hidden states, applying
    the tied-wte lm head `chunk` positions at a time.

    Same math as `_smoothed_ce` rearranged so only one (B, chunk, V) logits
    block is ever live: logp = logits - lse, so nll = lse - logits[target]
    and the smoothing term -mean(logp) = lse - mean(logits). The scan body is
    wrapped in jax.checkpoint so the backward pass re-derives each chunk's
    logits instead of keeping them resident.

    `mask` (B, T), when given, overrides the default `targets !=
    ignore_index` scoring mask — prefix training passes its explicit mask
    so a genuine token id 0 under mask=1 still scores (the default is the
    decoder-training convention where 0 is always pad).
    """
    from jax import lax

    b, t, d = hidden.shape
    mask = ((targets != ignore_index) if mask is None else mask).astype(
        jnp.float32
    )
    pad = (-t) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)),
                          constant_values=ignore_index)
        # Padded positions never score.
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n = (t + pad) // chunk
    hidden_c = hidden.reshape(b, n, chunk, d).transpose(1, 0, 2, 3)
    targets_c = targets.reshape(b, n, chunk).transpose(1, 0, 2)
    mask_c = mask.reshape(b, n, chunk).transpose(1, 0, 2)

    def body(carry, inp):
        h, tgt, m = inp
        logits = (h @ wte.T).astype(jnp.float32)  # (B, chunk, V)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt_logit = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        nll = lse - tgt_logit
        smooth = lse - jnp.mean(logits, axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        correct = (jnp.argmax(logits, -1) == tgt).astype(jnp.float32) * m
        loss_sum, mask_sum, corr_sum = carry
        return (
            loss_sum + jnp.sum(loss * m),
            mask_sum + jnp.sum(m),
            corr_sum + jnp.sum(correct),
        ), None

    init = (jnp.zeros((), jnp.float32),) * 3
    (loss_sum, mask_sum, corr_sum), _ = lax.scan(
        jax.checkpoint(body), init, (hidden_c, targets_c, mask_c)
    )
    denom = jnp.maximum(mask_sum, 1.0)
    return loss_sum / denom, corr_sum / denom


def decap_loss(
    params: decap_mod.DecapParams,
    features: jax.Array,
    tokens: jax.Array,
    gpt2_cfg: gpt2_mod.GPT2Config,
    *,
    label_smoothing: float = 0.1,
    loss_chunk: int = 0,
):
    """CE reconstruction loss.

    features: (B, prefix) already projected/noised/normalized.
    tokens:   (B, T) caption token ids, 0-padded.

    Logit/target alignment matches the reference (:323-330): the prefix
    occupies position 0, logits[:, :-1] predict tokens[:, :].

    loss_chunk > 0 computes the lm head + CE in position chunks
    (`_smoothed_ce_chunked`) so the full (B, T, V) logits never materialize.
    """
    prefix_emb = decap_mod.decap_project_prefix(params, features)[:, None, :]
    tok_emb = params.gpt2["wte"][tokens]
    embeds = jnp.concatenate([prefix_emb, tok_emb], axis=1)
    if loss_chunk:
        hidden = gpt2_mod.gpt2_hidden(params.gpt2, embeds, gpt2_cfg)[:, :-1]
        wte = params.gpt2["wte"]
        if gpt2_cfg.dtype != jnp.float32:
            wte = wte.astype(gpt2_cfg.dtype)
        return _smoothed_ce_chunked(
            hidden, wte, tokens, label_smoothing, loss_chunk
        )
    logits = gpt2_mod.gpt2_forward(params.gpt2, embeds, gpt2_cfg)[:, :-1]
    loss, mask = _smoothed_ce(logits, tokens, label_smoothing)
    acc = jnp.sum((jnp.argmax(logits, -1) == tokens) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return loss, acc


def decap_loss_packed(
    params: decap_mod.DecapParams,
    seg_features: jax.Array,
    pack,
    gpt2_cfg: gpt2_mod.GPT2Config,
    *,
    label_smoothing: float = 0.1,
    loss_chunk: int = 0,
):
    """CE reconstruction loss over packed rows (train/packing.py).

    seg_features: (R, S, prefix) — the per-SEGMENT prefix features, already
      run through `prepare_features` (projection/noise are per caption).
    pack: PackedBatch of device arrays; targets align 1:1 with positions
      (position j of a segment predicts target j — same alignment as
      `decap_loss`, reference decoderTraining.py:323-330).

    Packing changes only which slots do useful work; per-token math is
    identical to the unpacked loss (parity-tested in tests/test_packing.py).
    """
    r, s, _ = seg_features.shape
    prefix = decap_mod.decap_project_prefix(
        params, seg_features.reshape(r * s, -1)
    ).reshape(r, s, -1)
    tok_emb = params.gpt2["wte"][pack.input_tokens]  # (R, L, D)
    seg_slot = jnp.maximum(pack.segment_ids - 1, 0)  # (R, L); pads clamp to 0
    pre = jnp.take_along_axis(prefix, seg_slot[..., None], axis=1)
    embeds = jnp.where(
        pack.prefix_mask[..., None], pre.astype(tok_emb.dtype), tok_emb
    )
    hidden = gpt2_mod.gpt2_hidden_packed(
        params.gpt2, embeds, pack.segment_ids, pack.pos_ids, gpt2_cfg
    )
    wte = params.gpt2["wte"]
    if gpt2_cfg.dtype != jnp.float32:
        wte = wte.astype(gpt2_cfg.dtype)
    if loss_chunk:
        return _smoothed_ce_chunked(
            hidden, wte, pack.targets, label_smoothing, loss_chunk
        )
    logits = (hidden @ wte.T).astype(jnp.float32)
    loss, mask = _smoothed_ce(logits, pack.targets, label_smoothing)
    acc = jnp.sum((jnp.argmax(logits, -1) == pack.targets) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return loss, acc


def prepare_features(
    features: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    gaussian_noise: float = 0.0,
    bank=None,
    use_pallas: bool = False,
):
    """The frozen input pipeline (:303-316): optional memory projection
    (normalize=True), L2 normalize, optional CapDec noise + re-normalize."""
    from patchioner_tpu.ops import memory_projection as memproj

    if bank is not None:
        features = memproj.memory_project(
            features, bank, normalize=True, use_pallas=use_pallas
        )
    features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    if gaussian_noise != 0.0:
        features = features + gaussian_noise * jax.random.normal(
            key, features.shape, features.dtype
        )
        features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    return features


def _accum_apply(params, opt_state, tx, micro_grads, xs):
    """Scan `micro_grads` over the leading micro-batch axis of `xs`,
    accumulate SUM gradients and (loss_sum, mask_sum, correct_sum), then
    apply one update normalized by the GLOBAL mask count.

    micro_grads(params, x) -> (sum_grads, loss_sum, mask_sum, correct_sum)
    where sum_grads = d(loss_sum)/d(params). Dividing the accumulated sums
    by the total mask count reproduces the big-batch mean-over-tokens CE
    gradient exactly (up to f32 summation order).
    """

    def body(carry, x):
        g_acc, l_acc, m_acc, c_acc = carry
        g, lsum, msum, csum = micro_grads(params, x)
        return (
            jax.tree_util.tree_map(jnp.add, g_acc, g),
            l_acc + lsum, m_acc + msum, c_acc + csum,
        ), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    z = jnp.zeros((), jnp.float32)
    (g, lsum, msum, csum), _ = jax.lax.scan(body, (zeros, z, z, z), xs)
    denom = jnp.maximum(msum, 1.0)
    grads = jax.tree_util.tree_map(lambda v: v / denom.astype(v.dtype), g)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": lsum / denom, "acc": csum / denom}


def make_optimizer(cfg: TrainConfig):
    """AdamW + linear warmup then linear decay
    (reference: get_linear_schedule_with_warmup, :255,265-267)."""
    sched = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
            optax.linear_schedule(
                cfg.lr, 0.0, max(cfg.total_steps - cfg.warmup_steps, 1)
            ),
        ],
        [cfg.warmup_steps],
    )
    tx = optax.adamw(sched, weight_decay=cfg.weight_decay)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def make_train_step(
    gpt2_cfg: gpt2_mod.GPT2Config,
    train_cfg: TrainConfig,
    tx,
    *,
    use_bank: bool = False,
    mesh=None,
    dp_axis: str = "dp",
    mp_axis: str = "mp",
):
    """Build the jitted (optionally mesh-sharded) train step.

    Signature: step(params, opt_state, features, tokens, key[, bank_rows])
    -> (params, opt_state, metrics dict).

    With `train_cfg.grad_accum > 1`, features/tokens instead carry a leading
    (grad_accum, micro_batch, ...) axis; the step scans forward+backward over
    micro-batches and applies one big-batch-equivalent update (`_accum_apply`;
    CapDec noise keys are split per micro-batch).

    With a mesh: features/tokens shard over `dp_axis` (the micro-batch axis
    when accumulating), bank rows over `mp_axis`, params/opt-state
    replicated — XLA inserts the gradient all-reduce and the projection's
    softmax collectives.
    """
    accum = max(int(train_cfg.grad_accum), 1)

    def micro_grads(params, x, bank_rows=None):
        feats_m, toks_m, k = x
        feats = prepare_features(
            feats_m,
            key=k,
            gaussian_noise=train_cfg.gaussian_noise,
            bank=bank_rows,
            use_pallas=False,
        )
        msum = jnp.sum((toks_m != 0).astype(jnp.float32))

        def loss_sum_fn(p):
            loss, acc = decap_loss(
                p, feats, toks_m, gpt2_cfg,
                label_smoothing=train_cfg.label_smoothing,
                loss_chunk=train_cfg.loss_chunk,
            )
            # loss is mean over the micro-batch's non-pad tokens; its sum
            # form (loss * msum) is what accumulates exactly across
            # micro-batches.
            return loss * msum, acc

        (lsum, acc), g = jax.value_and_grad(loss_sum_fn, has_aux=True)(params)
        return g, lsum, msum, acc * msum

    def step(params, opt_state, features, tokens, key, bank_rows=None):
        if accum > 1:
            keys = jax.random.split(key, accum)
            # The bank is not micro-batched — close over it so the scan
            # never carries (accum,) copies.
            bank = bank_rows if use_bank else None
            mg = lambda p, x: micro_grads(p, x, bank)
            return _accum_apply(
                params, opt_state, tx, mg, (features, tokens, keys)
            )
        feats = prepare_features(
            features,
            key=key,
            gaussian_noise=train_cfg.gaussian_noise,
            bank=bank_rows if use_bank else None,
            use_pallas=False,
        )

        def loss_fn(p):
            return decap_loss(
                p, feats, tokens, gpt2_cfg,
                label_smoothing=train_cfg.label_smoothing,
                loss_chunk=train_cfg.loss_chunk,
            )

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_spec = P(None, dp_axis) if accum > 1 else P(dp_axis)
    dp = NamedSharding(mesh, batch_spec)
    mp = NamedSharding(mesh, P(mp_axis))
    in_shardings = [repl, repl, dp, dp, repl]
    if use_bank:
        in_shardings.append(mp)
    return jax.jit(
        step,
        in_shardings=tuple(in_shardings),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_packed_train_step(
    gpt2_cfg: gpt2_mod.GPT2Config,
    train_cfg: TrainConfig,
    tx,
    *,
    use_bank: bool = False,
    mesh=None,
    dp_axis: str = "dp",
    mp_axis: str = "mp",
):
    """Packed-rows variant of `make_train_step` (see train/packing.py).

    Signature: step(params, opt_state, features, pack, key[, bank_rows])
    -> (params, opt_state, metrics). `features` is the FULL caption-feature
    array (replicated — it stays resident on device across steps);
    `pack.seg_feature_idx` selects this batch's captions, and the frozen
    pipeline (projection / CapDec noise) runs once per segment = once per
    caption, exactly as the unpacked step does per batch row.

    With a mesh the pack's row axis shards over `dp_axis` — prefix gathers
    from the replicated feature array stay local, and the gradient
    all-reduce emerges from the shardings like the unpacked step's.

    With `train_cfg.grad_accum > 1`, every pack leaf carries a leading
    (grad_accum, micro_rows, ...) axis and the step scans micro-batches into
    one big-batch-equivalent update (`_accum_apply`); `features` stays one
    resident unbatched array.
    """
    accum = max(int(train_cfg.grad_accum), 1)

    def micro_grads(params, x, features, bank_rows=None):
        pack_m, k = x
        r, s = pack_m.seg_feature_idx.shape
        seg_feats = features[pack_m.seg_feature_idx.reshape(-1)]
        seg_feats = prepare_features(
            seg_feats,
            key=k,
            gaussian_noise=train_cfg.gaussian_noise,
            bank=bank_rows,
            use_pallas=False,
        ).reshape(r, s, -1)
        msum = jnp.sum((pack_m.targets != 0).astype(jnp.float32))

        def loss_sum_fn(p):
            loss, acc = decap_loss_packed(
                p, seg_feats, pack_m, gpt2_cfg,
                label_smoothing=train_cfg.label_smoothing,
                loss_chunk=train_cfg.loss_chunk,
            )
            return loss * msum, acc

        (lsum, acc), g = jax.value_and_grad(loss_sum_fn, has_aux=True)(params)
        return g, lsum, msum, acc * msum

    def step(params, opt_state, features, pack, key, bank_rows=None):
        if accum > 1:
            keys = jax.random.split(key, accum)
            bank = bank_rows if use_bank else None
            mg = lambda p, x: micro_grads(p, x, features, bank)
            return _accum_apply(params, opt_state, tx, mg, (pack, keys))
        r, s = pack.seg_feature_idx.shape
        seg_feats = features[pack.seg_feature_idx.reshape(-1)]
        seg_feats = prepare_features(
            seg_feats,
            key=key,
            gaussian_noise=train_cfg.gaussian_noise,
            bank=bank_rows if use_bank else None,
            use_pallas=False,
        ).reshape(r, s, -1)

        def loss_fn(p):
            return decap_loss_packed(
                p, seg_feats, pack, gpt2_cfg,
                label_smoothing=train_cfg.label_smoothing,
                loss_chunk=train_cfg.loss_chunk,
            )

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step)

    from patchioner_tpu.train import packing
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    row_spec = P(None, dp_axis) if accum > 1 else P(dp_axis)
    dp = NamedSharding(mesh, row_spec)
    mp = NamedSharding(mesh, P(mp_axis))
    pack_sharding = packing.PackedBatch(*([dp] * 6))
    in_shardings = [repl, repl, repl, pack_sharding, repl]
    if use_bank:
        in_shardings.append(mp)
    return jax.jit(
        step,
        in_shardings=tuple(in_shardings),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
