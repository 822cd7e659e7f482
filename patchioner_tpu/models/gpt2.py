"""GPT-2 language model, functional JAX with a static-shape KV cache.

Backs every decoder family in the framework: DeCap/CapDec (4-layer GPT-2 with
a linear prefix mapper — reference: src/decap/decap.py:61-79), ViECap/MeaCap
and ClipCap (full pretrained GPT-2 with soft/hard prompts).

The reference's batched greedy decode re-feeds the *entire* growing
`inputs_embeds` every step — O(T²·L) recompute with dynamic shapes
(src/decap/decap.py:116-183). Here decoding is a `lax.scan` over a
pre-allocated KV cache: fixed shapes, one compile, O(T·L) per sequence, and
the scan body is a single fused step on the MXU.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "GPT2Config",
    "DECAP_DECODER_CONFIG",
    "GPT2_BASE_CONFIG",
    "init_gpt2",
    "gpt2_forward",
    "gpt2_hidden",
    "gpt2_hidden_packed",
    "init_kv_cache",
    "gpt2_step",
    "gpt2_candidates_step",
    "commit_candidate",
    "KVCache",
]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


# The DeCap decoder config, values from the reference's decoder_config.pkl
# (src/decap/decap.py:67-69): a 4-layer / 4-head / 768-wide GPT-2.
DECAP_DECODER_CONFIG = GPT2Config(n_layer=4, n_head=4, n_embd=768)
GPT2_BASE_CONFIG = GPT2Config()


def init_gpt2(key: jax.Array, cfg: GPT2Config) -> dict:
    """HF GPT2LMHeadModel init distribution — DeCap trains its decoder FROM
    SCRATCH (decap.py: GPT2LMHeadModel(config)), so the init is part of the
    training semantics: every weight ~N(0, initializer_range=0.02)
    (embeddings included), EXCEPT the residual-output projections
    (attn/mlp c_proj), which HF rescales to 0.02/sqrt(2*n_layer) per the
    GPT-2 paper's residual-accumulation scheme (_init_weights).

    Documented deviation: the reference's HF decoder also applies dropout
    0.1 (decoder_config.pkl attn/embd/resid_pdrop, active in training since
    decoderTraining.py never .eval()s the decoder); this functional rebuild
    trains deterministically with no dropout."""
    keys = iter(jax.random.split(key, 2 + 4 * cfg.n_layer))
    d = cfg.n_embd
    resid_std = 0.02 / (2 * cfg.n_layer) ** 0.5

    def dense(k, fi, fo, std=0.02):
        return {
            "w": jax.random.normal(k, (fi, fo), jnp.float32) * std,
            "b": jnp.zeros((fo,), jnp.float32),
        }

    def ln():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    params = {
        "wte": jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32) * 0.02,
        "wpe": jax.random.normal(next(keys), (cfg.n_positions, d), jnp.float32) * 0.02,
        "ln_f": ln(),
        "blocks": [],
    }
    for _ in range(cfg.n_layer):
        params["blocks"].append(
            {
                "ln_1": ln(),
                "attn": {
                    "c_attn": dense(next(keys), d, 3 * d),
                    "c_proj": dense(next(keys), d, d, std=resid_std),
                },
                "ln_2": ln(),
                "mlp": {
                    "c_fc": dense(next(keys), d, 4 * d),
                    "c_proj": dense(next(keys), 4 * d, d, std=resid_std),
                },
            }
        )
    return params


def _ln(x, p, eps):
    # f32 statistics regardless of activation dtype (bf16-safe).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"] + p["b"]


def _gelu_new(x):
    # HF "gelu_new" == tanh approximation.
    return jax.nn.gelu(x, approximate=True)


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, H, T_max, hd)
    v: jax.Array  # (L, B, H, T_max, hd)
    length: jax.Array  # () int32 — number of valid positions


def init_kv_cache(cfg: GPT2Config, batch: int, max_len: int,
                  dtype=None) -> KVCache:
    dtype = dtype or cfg.dtype
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, cfg.head_dim)
    return KVCache(
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
    )


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _attn_full(q, k, v, scale, mask=None):
    """Full-sequence attention; `mask` (broadcastable to (B, H, Tq, Tk),
    True = attend) overrides the default causal mask (used by the packed
    path's causal-AND-segment-local mask)."""
    t, s = q.shape[-2], k.shape[-2]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    if mask is None:
        mask = jnp.tril(jnp.ones((t, s), bool), k=s - t)
    logits = jnp.where(mask, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _blocks(params: dict, x: jax.Array, cfg: GPT2Config, mask=None) -> jax.Array:
    """The transformer trunk shared by `gpt2_hidden` (causal) and
    `gpt2_hidden_packed` (explicit segment mask): blocks + final LN.
    Positions must already be added to `x`; params already in cfg.dtype."""
    scale = 1.0 / math.sqrt(cfg.head_dim)
    for blk in params["blocks"]:
        h = _ln(x, blk["ln_1"], cfg.ln_eps)
        qkv = _dense(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = _attn_full(
            _split_heads(q, cfg.n_head),
            _split_heads(k, cfg.n_head),
            _split_heads(v, cfg.n_head),
            scale,
            mask=mask,
        )
        x = x + _dense(_merge_heads(a), blk["attn"]["c_proj"])
        h = _ln(x, blk["ln_2"], cfg.ln_eps)
        x = x + _dense(_gelu_new(_dense(h, blk["mlp"]["c_fc"])), blk["mlp"]["c_proj"])
    return _ln(x, params["ln_f"], cfg.ln_eps)


@functools.partial(jax.jit, static_argnames=("cfg", "pos_offset"))
def gpt2_hidden(params: dict, embeds: jax.Array, cfg: GPT2Config,
                pos_offset: int = 0) -> jax.Array:
    """Full-sequence forward -> post-ln_f hidden states (B, T, D) in cfg.dtype.

    The transformer half of `gpt2_forward`, split out so callers that want to
    apply the tied-wte lm head in chunks (e.g. the chunked training CE in
    train/decoder_train.py, which must never materialize the full (B, T, V)
    logits) can do so without paying the forward twice.
    """
    b, t, d = embeds.shape
    if cfg.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    x = embeds.astype(cfg.dtype) + params["wpe"][pos_offset : pos_offset + t].astype(
        cfg.dtype
    )
    return _blocks(params, x, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def gpt2_hidden_packed(params: dict, embeds: jax.Array, segment_ids: jax.Array,
                       pos_ids: jax.Array, cfg: GPT2Config) -> jax.Array:
    """Packed-sequence forward -> post-ln_f hidden states (B, L, D).

    Rows hold several independent captions back to back (see
    train/packing.py). Attention is causal AND segment-local — position q
    attends to k iff k <= q and segment_ids[q] == segment_ids[k] != 0 — and
    positions are per-segment (`wpe[pos_ids]`), so each packed caption sees
    exactly the attention pattern and position embeddings it would see alone
    in a padded row. Padding slots carry segment id 0 and attend to nothing
    (their softmax row sees only the all -1e30 logits; outputs are masked by
    the loss).
    """
    b, t, d = embeds.shape
    if cfg.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    x = embeds.astype(cfg.dtype) + jnp.take(params["wpe"], pos_ids, axis=0).astype(
        cfg.dtype
    )
    causal = jnp.tril(jnp.ones((t, t), bool))
    seg_ok = (segment_ids[:, :, None] == segment_ids[:, None, :]) & (
        segment_ids[:, None, :] != 0
    )
    mask = (causal[None] & seg_ok)[:, None]  # (B, 1, L, L)
    return _blocks(params, x, cfg, mask=mask)


@functools.partial(jax.jit, static_argnames=("cfg", "pos_offset"))
def gpt2_forward(params: dict, embeds: jax.Array, cfg: GPT2Config,
                 pos_offset: int = 0) -> jax.Array:
    """Full-sequence forward over input embeddings -> logits (B, T, V).

    Matches HF `GPT2LMHeadModel(inputs_embeds=...)`: add wpe positions, run
    blocks, final LN, logits via tied wte.
    """
    x = gpt2_hidden(params, embeds, cfg, pos_offset)
    if cfg.dtype != jnp.float32:
        wte = params["wte"].astype(cfg.dtype)
    else:
        wte = params["wte"]
    return (x @ wte.T).astype(jnp.float32)


def gpt2_prefill(
    params: dict, embeds: jax.Array, cfg: GPT2Config, max_len: int,
    return_hidden: bool = False,
):
    """Full-prompt prefill: run causal attention over (B, T, D) embeddings,
    return last-position logits and a KV cache of capacity `max_len` primed
    with the prompt's keys/values (positions 0..T-1).

    With `return_hidden=True` also returns the post-ln_f hidden states
    (B, T, D) in float32 — HF's `output_hidden_states[-1]`, needed by
    contrastive search's degeneration penalty."""
    b, t, d = embeds.shape
    if cfg.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    cache = init_kv_cache(cfg, b, max_len)
    x = embeds.astype(cfg.dtype) + params["wpe"][:t].astype(cfg.dtype)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    new_k, new_v = cache.k, cache.v
    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln_1"], cfg.ln_eps)
        qkv = _dense(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.n_head)
        k = _split_heads(k, cfg.n_head)
        v = _split_heads(v, cfg.n_head)
        new_k = new_k.at[li, :, :, :t, :].set(k.astype(new_k.dtype))
        new_v = new_v.at[li, :, :, :t, :].set(v.astype(new_v.dtype))
        a = _attn_full(q, k, v, scale)
        x = x + _dense(_merge_heads(a), blk["attn"]["c_proj"])
        h = _ln(x, blk["ln_2"], cfg.ln_eps)
        x = x + _dense(_gelu_new(_dense(h, blk["mlp"]["c_fc"])), blk["mlp"]["c_proj"])
    x = _ln(x, params["ln_f"], cfg.ln_eps)
    logits = (x[:, -1] @ params["wte"].T).astype(jnp.float32)
    cache = KVCache(new_k, new_v, jnp.asarray(t, jnp.int32))
    if return_hidden:
        return logits, cache, x.astype(jnp.float32)
    return logits, cache


def gpt2_step(
    params: dict, embed: jax.Array, cache: KVCache, cfg: GPT2Config
) -> tuple[jax.Array, KVCache]:
    """One decode step: (B, D) embedding at position cache.length -> logits
    (B, V) and the updated cache. Jit-safe inside lax.scan (static shapes)."""
    b, d = embed.shape
    if cfg.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    idx = cache.length
    x = embed.astype(cfg.dtype) + jnp.take(params["wpe"], idx, axis=0).astype(cfg.dtype)
    x = x[:, None, :]  # (B, 1, D)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    max_len = cache.k.shape[-2]
    pos_mask = (jnp.arange(max_len) <= idx)[None, None, :]  # (1,1,T)

    new_k, new_v = cache.k, cache.v
    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln_1"], cfg.ln_eps)
        qkv = _dense(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, cfg.n_head)  # (B, H, 1, hd)
        k = _split_heads(k, cfg.n_head)[:, :, 0]  # (B, H, hd)
        v = _split_heads(v, cfg.n_head)[:, :, 0]
        # store k/v at (layer li, position idx)
        new_k = new_k.at[li, :, :, idx, :].set(k.astype(new_k.dtype))
        new_v = new_v.at[li, :, :, idx, :].set(v.astype(new_v.dtype))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, new_k[li].astype(q.dtype)
        ).astype(jnp.float32)
        logits = jnp.where(pos_mask[:, :, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", w, new_v[li].astype(x.dtype))
        x = x + _dense(_merge_heads(a), blk["attn"]["c_proj"])
        h = _ln(x, blk["ln_2"], cfg.ln_eps)
        x = x + _dense(_gelu_new(_dense(h, blk["mlp"]["c_fc"])), blk["mlp"]["c_proj"])
    x = _ln(x, params["ln_f"], cfg.ln_eps)
    logits = (x[:, 0] @ params["wte"].T).astype(jnp.float32)
    return logits, KVCache(new_k, new_v, idx + 1)


def gpt2_candidates_step(
    params: dict, embeds: jax.Array, cache: KVCache, cfg: GPT2Config
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Evaluate K candidate next-tokens per sequence against a SHARED cache.

    The reference expands past_key_values to a (b*k) batch every step
    (src/viecap/search.py:599-617) — O(b·k·T·D) HBM traffic per layer per
    step. Here candidates attend to the shared (b,)-cache plus their own
    key/value, so the cache is never duplicated; only the selected
    candidate is committed afterwards via `commit_candidate`.

    Args:
      embeds: (B, K, D) candidate token embeddings (all at position
        cache.length).
    Returns:
      logits (B, K, V) f32, post-ln_f hidden (B, K, D) f32,
      cand_k / cand_v (L, B, K, H, hd) — per-candidate keys/values to commit.
    """
    b, kk, d = embeds.shape
    if cfg.dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(cfg.dtype) if p.dtype == jnp.float32 else p,
            params,
        )
    idx = cache.length
    x = embeds.astype(cfg.dtype) + jnp.take(params["wpe"], idx, axis=0).astype(
        cfg.dtype
    )  # (B, K, D)
    scale = 1.0 / math.sqrt(cfg.head_dim)
    max_len = cache.k.shape[-2]
    past_mask = (jnp.arange(max_len) < idx)[None, None, None, :]  # (1,1,1,T)

    cand_ks, cand_vs = [], []
    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln_1"], cfg.ln_eps)
        qkv = _dense(h, blk["attn"]["c_attn"])
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (B, K, D)
        hd = cfg.head_dim
        q = q.reshape(b, kk, cfg.n_head, hd)
        k = k.reshape(b, kk, cfg.n_head, hd)
        v = v.reshape(b, kk, cfg.n_head, hd)
        cand_ks.append(k)
        cand_vs.append(v)
        pk = cache.k[li].astype(q.dtype)  # (B, H, T, hd)
        pv = cache.v[li].astype(q.dtype)
        logits_past = jnp.einsum(
            "bkhd,bhtd->bkht", q * scale, pk
        ).astype(jnp.float32)
        logits_past = jnp.where(past_mask, logits_past, -1e30)
        logits_self = jnp.sum(q * scale * k, axis=-1).astype(jnp.float32)
        # softmax over [past positions, self]
        all_logits = jnp.concatenate(
            [logits_past, logits_self[..., None]], axis=-1
        )
        w = jax.nn.softmax(all_logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bkht,bhtd->bkhd", w[..., :-1], pv)
        a = a + w[..., -1, None] * v
        x = x + _dense(a.reshape(b, kk, d), blk["attn"]["c_proj"])
        h = _ln(x, blk["ln_2"], cfg.ln_eps)
        x = x + _dense(_gelu_new(_dense(h, blk["mlp"]["c_fc"])), blk["mlp"]["c_proj"])
    x = _ln(x, params["ln_f"], cfg.ln_eps)
    logits = (x @ params["wte"].T).astype(jnp.float32)
    cand_k = jnp.stack(cand_ks)  # (L, B, K, H, hd)
    cand_v = jnp.stack(cand_vs)
    return logits, x.astype(jnp.float32), cand_k, cand_v


def commit_candidate(
    cache: KVCache, cand_k: jax.Array, cand_v: jax.Array, select: jax.Array
) -> KVCache:
    """Write the selected candidate's keys/values at position cache.length.

    select: (B,) int32 — index into the K axis of `cand_k`/`cand_v`."""
    b = select.shape[0]
    sel_k = cand_k[:, jnp.arange(b), select]  # (L, B, H, hd)
    sel_v = cand_v[:, jnp.arange(b), select]
    idx = cache.length
    new_k = cache.k.at[:, :, :, idx, :].set(sel_k.astype(cache.k.dtype))
    new_v = cache.v.at[:, :, :, idx, :].set(sel_v.astype(cache.v.dtype))
    return KVCache(new_k, new_v, idx + 1)
