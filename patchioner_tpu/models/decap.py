"""DeCap decoder: linear prefix mapper + 4-layer GPT-2, KV-cached greedy decode.

Behavioral parity with the reference's `decoding_batched`
(src/decap/decap.py:116-183): exactly 30 greedy steps for every sequence
(no early stop — truncation at '<|endoftext|>' happens at detokenization),
temperature 1, per-step chosen-token log-probs summed over all 30 steps and
exponentiated into the sequence score.

The reference re-runs the full growing context each step; here a `lax.scan`
over a static KV cache does one fused step per token.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from patchioner_tpu.models import gpt2

__all__ = ["DecapParams", "decap_project_prefix", "greedy_decode", "decap_caption_tokens"]

ENTRY_LENGTH = 30  # reference: src/decap/decap.py:127
EOT_TOKEN = 49407  # CLIP BPE '<|endoftext|>'


class DecapParams(NamedTuple):
    gpt2: dict
    clip_project: dict  # single linear: prefix_size -> n_embd (decap.py:71)


def init_decap(key: jax.Array, cfg: gpt2.GPT2Config, prefix_size: int) -> DecapParams:
    """Init matches the reference exactly: GPT-2 layers via the HF scheme
    (gpt2.init_gpt2) and clip_project via torch nn.Linear's DEFAULT init —
    kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for the weight and
    U(±1/sqrt(fan_in)) for the bias (MLP((prefix_size, n_embd)),
    src/decap/decap.py:46-58,71). DeCap trains this layer from scratch, so
    init IS training semantics (round 4; previously normal/sqrt(fan_in)
    weights + zero bias, an undocumented deviation)."""
    k1, k2, k3 = jax.random.split(key, 3)
    import math

    bound = 1.0 / math.sqrt(prefix_size)
    return DecapParams(
        gpt2=gpt2.init_gpt2(k1, cfg),
        clip_project={
            "w": jax.random.uniform(
                k2, (prefix_size, cfg.n_embd), jnp.float32, -bound, bound
            ),
            "b": jax.random.uniform(
                k3, (cfg.n_embd,), jnp.float32, -bound, bound
            ),
        },
    )


def decap_project_prefix(params: DecapParams, features: jax.Array) -> jax.Array:
    """The MLP((prefix_size, n_embd)) prefix mapper — a single linear layer
    (reference: src/decap/decap.py:46-58,71)."""
    return features @ params.clip_project["w"] + params.clip_project["b"]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def greedy_decode(
    params: DecapParams,
    prefix: jax.Array,
    cfg: gpt2.GPT2Config,
    n_steps: int = ENTRY_LENGTH,
) -> tuple[jax.Array, jax.Array]:
    """Greedy argmax decode from a projected prefix embedding.

    Args:
      params: DecapParams.
      prefix: (B, prefix_size) projected image/text embedding.
      cfg: GPT-2 config (static).
      n_steps: number of generated tokens (always generated in full, like the
        reference loop).

    Returns:
      tokens (B, n_steps) int32, scores (B,) = exp(sum step log-probs).
    """
    b = prefix.shape[0]
    emb0 = decap_project_prefix(params, prefix)  # (B, D)
    cache = gpt2.init_kv_cache(cfg, b, n_steps + 1)

    def step(carry, _):
        emb, cache = carry
        logits, cache = gpt2.gpt2_step(params.gpt2, emb, cache, cfg)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.argmax(logits, axis=-1)  # (B,)
        lp = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
        next_emb = params.gpt2["wte"][tok]
        return (next_emb, cache), (tok, lp)

    (_, _), (tokens, lps) = jax.lax.scan(
        step, (emb0, cache), None, length=n_steps
    )
    tokens = tokens.T.astype(jnp.int32)  # (B, n_steps)
    scores = jnp.exp(jnp.sum(lps, axis=0))  # (B,)
    return tokens, scores


def decap_caption_tokens(
    params: DecapParams,
    features: jax.Array,
    cfg: gpt2.GPT2Config,
    n_steps: int = ENTRY_LENGTH,
) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper: features are already in prefix space."""
    return greedy_decode(params, features, cfg, n_steps)
