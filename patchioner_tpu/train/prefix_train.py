"""Prefix-mapper training — the ViECap / ClipCap training loops.

Reference: src/viecap/training/main.py:26-105 (trains the MappingNetwork on
text-only captions with CLIP-feature noise injection, GPT-2 frozen) and
src/clipcap/clipcapTraining.py (trains the MLP/Transformer prefix mapper,
`only_prefix` freezing the language model).

One generic mesh-sharded step covers both: gradients flow ONLY through the
mapper params; the language model stays frozen. CE is the standard HF shift
(prefix positions get ignore labels).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from patchioner_tpu.models import gpt2 as gpt2_mod

__all__ = [
    "PrefixTrainConfig",
    "noise_injection",
    "prefix_loss",
    "make_prefix_train_step",
]


@dataclasses.dataclass(frozen=True)
class PrefixTrainConfig:
    lr: float = 2e-5  # viecap/training/main.py default
    warmup_steps: int = 5000
    total_steps: int = 100_000
    noise_variance: float = 0.016  # ViECap text-only noise (main.py:48)
    # transformers.AdamW's default (the optimizer both reference loops
    # build bare: main.py:51, clipcapTraining.py:300) — NOT torch AdamW's
    # 0.01; prefix_cli passes this through to optax.adamw
    weight_decay: float = 0.0
    # Chunked lm-head CE (same machinery as decoder training's
    # TrainConfig.loss_chunk): the (B, T, V) f32 logits the full head
    # materializes OOM one v5e at B=1024/T=40 (measured,
    # scripts/probe_prefix_train_tpu.py); chunking the head removes them.
    # 0 = plain full-logits loss.
    loss_chunk: int = 0


def noise_injection(features: jax.Array, key, variance: float) -> jax.Array:
    """ViECap feature-noise injection (viecap/training/utils.py:6-22):
    L2-normalize, add sqrt(variance)·N(0,1), re-normalize. The CLI flag is
    a VARIANCE (main.py:122 `--noise_variance`, default 0.016 → std ≈0.126)
    and the perturbation is applied to the *unit-norm* feature — both
    matter: this noise is what bridges the text→image modality gap at
    inference. variance == 0 is the identity (utils.py:14-15)."""
    if not variance:
        return features
    features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    eps = jax.random.normal(key, features.shape, features.dtype)
    features = features + (variance ** 0.5) * eps
    return features / jnp.linalg.norm(features, axis=-1, keepdims=True)


def prefix_loss(
    mapper_params,
    mapper_fn: Callable,
    gpt2_params: dict,
    features: jax.Array,
    tokens: jax.Array,
    mask: jax.Array,
    gpt2_cfg: gpt2_mod.GPT2Config,
    hard_tokens: Optional[jax.Array] = None,
    loss_chunk: int = 0,
):
    """CE of caption tokens given [hard prompt ‖ soft prefix] (or just the
    soft prefix). tokens: (B, T) 0-padded; mask: (B, T) 1 for real tokens.

    mapper_fn(mapper_params, features) -> (B, L, D) soft prompt.

    loss_chunk > 0 applies the tied-wte lm head `loss_chunk` positions at a
    time (decoder_train._smoothed_ce_chunked with smoothing 0) so the
    (B, T, V) f32 logits never materialize — numerically identical.
    """
    soft = mapper_fn(mapper_params, features)
    tok_emb = gpt2_params["wte"][tokens]
    parts = [soft, tok_emb]
    prefix_len = soft.shape[1]
    if hard_tokens is not None:
        parts.insert(0, gpt2_params["wte"][hard_tokens])
        prefix_len += hard_tokens.shape[1]
    embeds = jnp.concatenate(parts, axis=1)
    if loss_chunk:
        from patchioner_tpu.train.decoder_train import _smoothed_ce_chunked

        hidden = gpt2_mod.gpt2_hidden(gpt2_params, embeds, gpt2_cfg)[
            :, prefix_len - 1 : -1
        ]
        wte = gpt2_params["wte"]
        if gpt2_cfg.dtype != jnp.float32:
            wte = wte.astype(gpt2_cfg.dtype)
        # Pass the explicit mask through so a genuine token id 0 ("!" in
        # GPT-2's vocab) under mask=1 scores exactly like the full-logits
        # path.
        return _smoothed_ce_chunked(
            hidden, wte, tokens, 0.0, loss_chunk, mask=mask
        )
    logits = gpt2_mod.gpt2_forward(gpt2_params, embeds, gpt2_cfg)
    # standard shift: position prefix_len-1+i predicts token i
    pred = logits[:, prefix_len - 1 : -1]
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    loss = jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    acc = jnp.sum((jnp.argmax(pred, -1) == tokens) * m) / jnp.maximum(
        jnp.sum(m), 1.0
    )
    return loss, acc


def make_prefix_train_step(
    mapper_fn: Callable,
    gpt2_cfg: gpt2_mod.GPT2Config,
    cfg: PrefixTrainConfig,
    tx,
    *,
    mesh=None,
    dp_axis: str = "dp",
):
    """step(mapper_params, opt_state, gpt2_params, features, tokens, mask,
    key) -> (mapper_params, opt_state, metrics). Gradients ONLY through the
    mapper — the language model is a frozen input (ClipCaptionPrefix
    semantics, clipcap/entrypoint.py:185-193)."""

    def step(mapper_params, opt_state, gpt2_params, features, tokens, mask, key):
        features = noise_injection(features, key, cfg.noise_variance)

        def loss_fn(p):
            return prefix_loss(
                p, mapper_fn, gpt2_params, features, tokens, mask, gpt2_cfg,
                loss_chunk=cfg.loss_chunk,
            )

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            mapper_params
        )
        updates, opt_state = tx.update(grads, opt_state, mapper_params)
        mapper_params = optax.apply_updates(mapper_params, updates)
        return mapper_params, opt_state, {"loss": loss, "acc": acc}

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(dp_axis))
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, dp, dp, dp, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
