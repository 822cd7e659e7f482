"""ViECap — entity-aware prefix captioning, TPU-native.

Reference: src/viecap/ (entrypoint.py, ClipCap.py, search.py,
retrieval_categories.py, utils.py). Flow: a CLIP-space image feature is
(a) mapped to `continuous_prompt_length` soft-prompt embeddings by a
transformer MappingNetwork, (b) matched against a precomputed entity-text
embedding vocabulary to build the hard prompt "There are {entities} in
image."; both are concatenated (order by soft_prompt_first/only_hard_prompt)
and decoded by a full pretrained GPT-2 with greedy or width-5 beam search.

TPU redesign: greedy search runs as one `lax.scan` over a KV cache primed by
`gpt2_prefill` (the reference uses HF past_key_values, search.py:155-164);
beam search keeps the reference's exact scoring quirks (length-normalized
ranking, stopped-beam logit masking, trunc division for source recovery,
search.py:193-285) but is KV-cached and batched as a width-5 "batch".

The GPT-2 text tokenizer is pluggable (`tokenizer=`): the standard one needs
HF vocab files that a zero-egress environment may lack — pass any object with
encode/decode.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import pickle
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from patchioner_tpu.models import gpt2 as gpt2_mod

__all__ = [
    "ViecapConfig",
    "mapping_network_forward",
    "init_mapping_network",
    "port_mapping_network",
    "retrieve_entities",
    "compose_discrete_prompt",
    "greedy_search",
    "beam_search",
    "beam_search_batched",
    "contrastive_search",
    "assemble_prompt_embeds",
    "run_search",
    "sentence_perplexity",
    "VieCap",
    "load_entities_text",
]

VOCAB_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "viecap_vocabulary"
)


@dataclasses.dataclass(frozen=True)
class ViecapConfig:
    # Reference defaults: src/viecap/entrypoint.py:61-80
    continuous_prompt_length: int = 10
    clip_project_length: int = 10
    clip_hidden_size: int = 512
    num_layers: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    temperature: float = 0.01
    top_k: int = 3
    threshold: float = 0.2
    using_hard_prompt: bool = False
    soft_prompt_first: bool = False
    only_hard_prompt: bool = False
    using_greedy_search: bool = False
    beam_width: int = 5
    max_len: int = 64
    name_of_entities_text: str = "vinvl_vgoi_entities"
    prompt_ensemble: bool = False
    ln_eps: float = 1e-5
    # Serving lever (OFF = reference parity): pad the hard prompt to the
    # next multiple of this many tokens instead of the per-batch max, so
    # the jitted prefill+search program compiles once per BUCKET instead of
    # once per distinct prompt length (minutes per compile on a TPU).
    # Pad tokens are attended either way (reference pad_sequence semantics,
    # search.py prefixes carry no attention mask), so a bucket boundary
    # changes numerics vs per-batch padding — deliberate opt-in divergence.
    hard_prompt_pad_multiple: int = 0


# ------------------------------------------------------- mapping network


def init_mapping_network(key: jax.Array, cfg: ViecapConfig, d_model: int) -> dict:
    """Init matches the reference's torch modules: every linear is a plain
    nn.Linear (src/viecap/ClipCap.py:52-78,122-155), i.e. DEFAULT
    kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) weights and
    U(±1/sqrt(fan_in)) biases; prefix_const is torch.randn (standard
    normal, ClipCap.py:152). The mapper trains from scratch
    (train/prefix_cli.py), so init IS training semantics (round 4;
    previously normal/sqrt(fan_in) weights + zero biases)."""
    import math

    ks = iter(jax.random.split(key, 3 + 10 * cfg.num_layers))

    def dense(k, fi, fo, bias=True):
        kw, kb = jax.random.split(k)
        bound = 1.0 / math.sqrt(fi)
        p = {"w": jax.random.uniform(kw, (fi, fo), jnp.float32,
                                     -bound, bound)}
        p["b"] = (
            jax.random.uniform(kb, (fo,), jnp.float32, -bound, bound)
            if bias else None
        )
        return p

    params = {
        "linear": dense(next(ks), cfg.clip_hidden_size,
                        cfg.clip_project_length * d_model),
        "prefix_const": jax.random.normal(
            next(ks), (cfg.continuous_prompt_length, d_model)
        ),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "norm1": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
                "to_queries": dense(next(ks), d_model, d_model, bias=False),
                "to_keys_values": dense(next(ks), d_model, 2 * d_model, bias=False),
                "project": dense(next(ks), d_model, d_model),
                "norm2": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
                "fc1": dense(next(ks), d_model, int(d_model * cfg.mlp_ratio)),
                "fc2": dense(next(ks), int(d_model * cfg.mlp_ratio), d_model),
            }
        )
    return params


def port_mapping_network(sd, prefix: str = "mapping_network.", num_layers: int = 8) -> dict:
    """Port torch MappingNetwork weights (src/viecap/ClipCap.py:122-155).
    TransformerLayer attention linears have bias=False (ClipCap.py:78)."""

    from patchioner_tpu.io.torch_port import _np

    def lin(name, bias=True):
        p = {"w": _np(sd[f"{prefix}{name}.weight"]).T}
        p["b"] = _np(sd[f"{prefix}{name}.bias"]) if bias else None
        return p

    params = {
        "linear": lin("linear"),
        "prefix_const": _np(sd[f"{prefix}prefix_const"]),
        "layers": [],
    }
    for i in range(num_layers):
        q = f"transformer.layers.{i}"
        params["layers"].append(
            {
                "norm1": {
                    "scale": _np(sd[f"{prefix}{q}.norm1.weight"]),
                    "bias": _np(sd[f"{prefix}{q}.norm1.bias"]),
                },
                "to_queries": lin(f"{q}.attn.to_queries", bias=False),
                "to_keys_values": lin(f"{q}.attn.to_keys_values", bias=False),
                "project": lin(f"{q}.attn.project"),
                "norm2": {
                    "scale": _np(sd[f"{prefix}{q}.norm2.weight"]),
                    "bias": _np(sd[f"{prefix}{q}.norm2.bias"]),
                },
                "fc1": lin(f"{q}.mlp.fc1"),
                "fc2": lin(f"{q}.mlp.fc2"),
            }
        )
    return params


def _lin(x, p):
    y = x @ p["w"]
    return y if p["b"] is None else y + p["b"]


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


@functools.partial(jax.jit, static_argnames=("cfg", "d_model"))
def mapping_network_forward(
    params: dict, x: jax.Array, cfg: ViecapConfig, d_model: int
) -> jax.Array:
    """(B, clip_hidden) -> (B, continuous_prompt_length, d_model).

    Projected feature tokens + learnable prefix run through an 8-layer
    self-attention transformer (relu MLP, ratio 2.0); output keeps only the
    prefix positions (ClipCap.py:141-153)."""
    b = x.shape[0]
    proj = _lin(x, params["linear"]).reshape(b, cfg.clip_project_length, d_model)
    prefix = jnp.broadcast_to(
        params["prefix_const"][None], (b, cfg.continuous_prompt_length, d_model)
    )
    h = jnp.concatenate([proj, prefix], axis=1)
    nh = cfg.num_heads
    hd = d_model // nh
    for layer in params["layers"]:
        q_in = _ln(h, layer["norm1"], cfg.ln_eps)
        # Reference quirk (ClipCap.py:93): keys/values come from the RAW
        # residual stream (key_value=None -> `query` argument pre-norm1? no:
        # attn(self.norm1(query), key_value) with key_value None means
        # key_value = normed query). So K/V use the SAME normed input.
        qs = _lin(q_in, layer["to_queries"]).reshape(b, -1, nh, hd)
        kv = _lin(q_in, layer["to_keys_values"]).reshape(b, -1, 2, nh, hd)
        ks, vs = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bnmh", qs, ks) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=2)
        out = jnp.einsum("bnmh,bmhd->bnhd", attn, vs).reshape(b, -1, d_model)
        h = h + _lin(out, layer["project"])
        h = h + _lin(
            jax.nn.relu(_lin(_ln(h, layer["norm2"], cfg.ln_eps), layer["fc1"])),
            layer["fc2"],
        )
    return h[:, cfg.clip_project_length :]


# -------------------------------------------------------- entity retrieval


def _finish_entities(raw, all_entities: bool) -> List[str]:
    """Reference postprocess applied to every vocabulary
    (load_annotations.py:84-87,98-101,133-136,146-149): lower+strip, the
    optional single-word filter, then SORT. The sort is load-bearing —
    the shipped `*_embeddings_*.pickle` matrices were encoded over the
    sorted order, so an unsorted list misnames every retrieved entity."""
    ents = [str(e).lower().strip() for e in raw]
    if not all_entities:
        ents = [e for e in ents if len(e.split()) == 1]
    ents.sort()
    return ents


def load_entities_text(name: str, path: str, all_entities: bool = True) -> List[str]:
    """Entity vocabularies (reference: src/viecap/load_annotations.py).
    Supported: coco_entities (json list of 80 categories), vinvl_vgoi_entities
    (json class2ind dict), visual_genome_entities (pickle, the 'joint'
    object set), open_image (csv DisplayName column), vinvl_vg_entities
    (json object_count keys)."""
    if name == "coco_entities":
        with open(path) as f:
            return _finish_entities(json.load(f), all_entities)
    if name == "vinvl_vgoi_entities":
        with open(path) as f:
            return _finish_entities(json.load(f).keys(), all_entities)
    if name == "visual_genome_entities":
        with open(path, "rb") as f:
            data = pickle.load(f)
        # {'objects': {'gqa': set, 'vg': set, 'joint': set}} — the
        # reference reads the joint set (load_annotations.py:80)
        ents = data["objects"] if isinstance(data, dict) and "objects" in data else data
        if isinstance(ents, dict):
            ents = ents["joint"]
        return _finish_entities(ents, all_entities)
    if name == "open_image_entities":
        import csv

        with open(path) as f:
            rows = list(csv.reader(f))
        # header row + DisplayName column. The reference lower+strips
        # FIRST and drops a "(...)" qualifier only when the name ENDS with
        # ')' (load_annotations.py:111-115) — a mid-string paren like
        # "foo (bar) baz" is kept whole; truncating it would shift the
        # sorted order the shipped embedding pickle rows align to.
        names = []
        for r in rows[1:]:
            n = r[1].lower().strip()
            if n and n[-1] == ")":
                n = n[: n.find("(")].strip()
            names.append(n)
        return _finish_entities(names, all_entities)
    if name == "vinvl_vg_entities":
        with open(path) as f:
            # object_count keys, NOT idx_to_label values — the shipped
            # vg embedding pickle rows follow the former
            return _finish_entities(json.load(f)["object_count"].keys(),
                                    all_entities)
    raise ValueError(f"unknown entity vocabulary: {name}")


# The seven CLIP prompt templates the reference ensembles over
# (src/viecap/training/generating_prompt_ensemble.py:57-65).
PROMPT_ENSEMBLE_TEMPLATES = (
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
)


def build_entity_embeddings(
    entities: Sequence[str],
    encode_fn,
    *,
    templates: Sequence[str] = PROMPT_ENSEMBLE_TEMPLATES,
    project_fn=None,
    out_path: str = None,
    batch_entities: int = 256,
):
    """Build the prompt-ensemble entity-embedding vocabulary
    (reference: src/viecap/training/generating_prompt_ensemble.py:12-52).

    `encode_fn(texts: List[str]) -> (len(texts), D)` is the text tower
    (e.g. a jitted CLIP `encode_text` over `text/clip_bpe` tokens);
    `project_fn` optionally maps CLIP space -> DINO space (Talk2DINO, the
    reference's `_t2d_` vocabulary variants). Per entity: encode every
    template, (optionally project,) L2-normalize per text, mean over
    templates, L2-normalize the mean — the reference's exact order.
    Unlike the reference (one encode call per entity), entities are
    batched so the text tower runs at MXU-friendly batch sizes.

    Returns (N, D) float32; when `out_path` is set, pickles the array in
    the layout the captioner's `viecap:` config-block builder
    (patchioner._build_viecap_family) reads.
    """
    t = len(templates)
    rows = []
    for lo in range(0, len(entities), batch_entities):
        chunk = entities[lo : lo + batch_entities]
        texts = [tpl.format(e) for e in chunk for tpl in templates]
        emb = jnp.asarray(encode_fn(texts), jnp.float32)
        if project_fn is not None:
            emb = jnp.asarray(project_fn(emb), jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.reshape(len(chunk), t, -1).mean(axis=1)
        rows.append(mean / jnp.linalg.norm(mean, axis=-1, keepdims=True))
    out = np.asarray(jnp.concatenate(rows, axis=0), np.float32)
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(out, f)
    return out


def retrieve_entities(
    image_features: jax.Array,
    texts_embeddings: jax.Array,
    entities: Sequence[str],
    *,
    top_k: int = 3,
    threshold: float = 0.2,
    temperature: float = 0.01,
) -> List[List[str]]:
    """Softmax-similarity entity retrieval
    (retrieval_categories.py:61-114): normalize both sides, softmax(sim/T),
    top-k, truncate at the first below-threshold probability."""
    f = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    t = texts_embeddings / jnp.linalg.norm(texts_embeddings, axis=-1, keepdims=True)
    logits = jax.nn.softmax((f @ t.T) / temperature, axis=-1)
    probs, idx = jax.lax.top_k(logits, top_k)
    probs, idx = np.asarray(probs), np.asarray(idx)
    out = []
    for i in range(len(probs)):
        row = []
        for j in range(top_k):
            if probs[i, j] < threshold:
                break
            row.append(entities[idx[i, j]])
        out.append(row)
    return out


def compose_discrete_prompt(entities: List[str]) -> str:
    """'There are person, dog in image.' (utils.py:55-74); empty ->
    'There are something in image.'."""
    if not entities:
        return "There are something in image."
    return "There are " + ", ".join(entities) + " in image."


# ---------------------------------------------------------------- search


@functools.partial(jax.jit, static_argnames=("cfg", "max_len"))
def _greedy_tokens(params, embeds, cfg: gpt2_mod.GPT2Config, max_len: int):
    logits, cache = gpt2_mod.gpt2_prefill(params, embeds, cfg,
                                          embeds.shape[1] + max_len)

    def step(carry, _):
        logits, cache = carry
        tok = jnp.argmax(logits, axis=-1)
        emb = params["wte"][tok]
        new_logits, cache = gpt2_mod.gpt2_step(params, emb, cache, cfg)
        return (new_logits, cache), tok

    (_, _), toks = jax.lax.scan(step, (logits, cache), None, length=max_len)
    return toks.T  # (B, max_len)


def greedy_search(
    params: dict,
    embeds: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    tokenizer,
    *,
    max_len: int = 64,
    end_of_sentences: Sequence[str] = (".", " ."),
) -> List[str]:
    """KV-cached greedy decode with the reference's batch stopping semantics
    (search.py:107-191): generate max_len tokens, then truncate each sequence
    at the first end-of-sentence token (inclusive; keep all if none)."""
    eos = [tokenizer.encode(e)[-1] for e in end_of_sentences]
    toks = np.asarray(_greedy_tokens(params, embeds, cfg, max_len))
    sentences = []
    for row in toks:
        cut = len(row) - 1
        for i, t in enumerate(row):
            if int(t) in eos:
                cut = i
                break
        sentences.append(tokenizer.decode(row[: cut + 1].tolist()))
    return sentences


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "beam_width"))
def _beam_tokens(params, embeds, eos_pair, cfg: gpt2_mod.GPT2Config,
                 max_len: int, beam_width: int):
    """Single-sample beam search (reference search.py:193-285 semantics) over
    a KV cache: returns (tokens (W, max_len), seq_lengths (W,), scores (W,)).
    embeds: (1, T, D)."""
    w = beam_width
    t0 = embeds.shape[1]
    logits0, cache0 = gpt2_mod.gpt2_prefill(params, embeds, cfg, t0 + max_len)
    logp0 = jax.nn.log_softmax(logits0[0], axis=-1)
    scores, first_tokens = jax.lax.top_k(logp0, w)  # (W,)

    # Broadcast the prompt cache across beams.
    cache = gpt2_mod.KVCache(
        jnp.repeat(cache0.k, w, axis=1), jnp.repeat(cache0.v, w, axis=1),
        cache0.length,
    )
    tokens = jnp.zeros((w, max_len), jnp.int32).at[:, 0].set(first_tokens)
    seq_lengths = jnp.ones((w,), jnp.float32)
    is_stopped = (first_tokens == eos_pair[0]) | (first_tokens == eos_pair[1])

    def step(carry, i):
        tokens, scores, seq_lengths, is_stopped, cache, prev_tokens = carry
        emb = params["wte"][prev_tokens]
        logits, cache = gpt2_mod.gpt2_step(params, emb, cache, cfg)
        logp = jax.nn.log_softmax(logits, axis=-1)  # (W, V)
        v = logp.shape[-1]
        # Stopped beams: only token 0 allowed at zero cost (search.py:259-260)
        stop_row = jnp.full((v,), -jnp.inf).at[0].set(0.0)
        logp = jnp.where(is_stopped[:, None], stop_row[None], logp)
        seq_lengths = seq_lengths + (~is_stopped).astype(jnp.float32)
        sums = scores[:, None] + logp  # (W, V)
        avg = sums / seq_lengths[:, None]
        top_avg, flat_idx = jax.lax.top_k(avg.reshape(-1), w)
        src = flat_idx // v
        nxt = flat_idx % v
        seq_lengths = seq_lengths[src]
        tokens = tokens[src].at[:, i].set(nxt)
        scores = top_avg * seq_lengths
        is_stopped = is_stopped[src] | (nxt == eos_pair[0]) | (nxt == eos_pair[1])
        cache = gpt2_mod.KVCache(cache.k[:, src], cache.v[:, src], cache.length)
        return (tokens, scores, seq_lengths, is_stopped, cache, nxt), None

    carry = (tokens, scores, seq_lengths, is_stopped, cache, first_tokens)
    (tokens, scores, seq_lengths, is_stopped, _, _), _ = jax.lax.scan(
        step, carry, jnp.arange(1, max_len)
    )
    return tokens, seq_lengths, scores / seq_lengths


def beam_search(
    params: dict,
    embeds: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    tokenizer,
    *,
    beam_width: int = 5,
    max_len: int = 64,
    end_of_sentences: Sequence[str] = (".", " ."),
) -> List[str]:
    """Per-sample beam search returning beam texts best-first
    (search.py:193-285)."""
    eos = jnp.asarray([tokenizer.encode(e)[-1] for e in end_of_sentences])
    toks, lengths, norm_scores = _beam_tokens(
        params, embeds, eos, cfg, max_len, beam_width
    )
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    order = np.argsort(-np.asarray(norm_scores))
    return [
        tokenizer.decode(toks[i, : int(lengths[i])].tolist()) for i in order
    ]


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "beam_width"))
def _beam_tokens_batched(params, embeds, eos_pair,
                         cfg: gpt2_mod.GPT2Config, max_len: int,
                         beam_width: int):
    """All images' beams in ONE program: vmap of the per-sample beam over
    the image axis. Each image's math is exactly `_beam_tokens` — the
    reference's per-sample loop (search.py:193) just batches."""
    return jax.vmap(
        lambda e: _beam_tokens(params, e[None], eos_pair, cfg, max_len,
                               beam_width)
    )(embeds)


def beam_search_batched(
    params: dict,
    embeds: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    tokenizer,
    *,
    beam_width: int = 5,
    max_len: int = 64,
    end_of_sentences: Sequence[str] = (".", " ."),
) -> List[str]:
    """Best beam per image, all images decoded in ONE device program.

    TPU redesign of the reference entrypoint's `for feature in features:
    beam_search(...)` loop (entrypoint.py:149-161): the per-image beam
    searches are independent, so vmap batches them — B sequential
    ~140 ms dispatches become one batched program (~B× eval speedup at
    batch sizes that fill the chip). Token-exact per image vs
    `beam_search` (parity-tested)."""
    eos = jnp.asarray([tokenizer.encode(e)[-1] for e in end_of_sentences])
    toks, lengths, norm_scores = _beam_tokens_batched(
        params, embeds, eos, cfg, max_len, beam_width
    )
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    norm_scores = np.asarray(norm_scores)
    outs = []
    for b in range(toks.shape[0]):
        best = int(np.argsort(-norm_scores[b])[0])
        outs.append(
            tokenizer.decode(toks[b, best, : int(lengths[b, best])].tolist())
        )
    return outs


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_len", "top_k", "alpha")
)
def _contrastive_tokens(params, embeds, cfg: gpt2_mod.GPT2Config,
                        max_len: int, top_k: int, alpha: float):
    """Contrastive search (reference src/viecap/search.py:294-405): each step
    scores the model's top-k candidates by
    (1-alpha)*p(candidate) - alpha*max_cos(candidate hidden, context hiddens)
    and commits the argmax. TPU redesign: one lax.scan over a shared KV cache;
    candidates attend via gpt2_candidates_step instead of the reference's
    (b*k)-expanded past_key_values, and context hidden states live in a
    preallocated (B, T0+max_len, D) buffer masked by step index."""
    b, t0, d = embeds.shape
    logits, cache, hidden0 = gpt2_mod.gpt2_prefill(
        params, embeds, cfg, t0 + max_len, return_hidden=True
    )
    hidden_buf = jnp.zeros((b, t0 + max_len, d), jnp.float32)
    hidden_buf = hidden_buf.at[:, :t0].set(hidden0)

    def step(carry, i):
        logits, cache, hidden_buf = carry
        probs = jax.nn.softmax(logits, axis=-1)  # (B, V)
        _, top_idx = jax.lax.top_k(logits, top_k)  # (B, K)
        top_probs = jnp.take_along_axis(probs, top_idx, axis=-1)  # (B, K)
        cand_emb = params["wte"][top_idx]  # (B, K, D)
        cand_logits, cand_hidden, ck, cv = gpt2_mod.gpt2_candidates_step(
            params, cand_emb, cache, cfg
        )
        # degeneration penalty: max cosine vs all valid context hiddens
        ctx = hidden_buf / jnp.maximum(
            jnp.linalg.norm(hidden_buf, axis=-1, keepdims=True), 1e-12
        )
        nxt = cand_hidden / jnp.linalg.norm(cand_hidden, axis=-1, keepdims=True)
        cos = jnp.einsum("bkd,btd->bkt", nxt, ctx)
        valid = (jnp.arange(hidden_buf.shape[1]) < t0 + i)[None, None, :]
        cos = jnp.where(valid, cos, -jnp.inf)
        penalty = jnp.max(cos, axis=-1)  # (B, K)
        score = (1.0 - alpha) * top_probs - alpha * penalty
        sel = jnp.argmax(score, axis=-1)  # (B,)
        ar = jnp.arange(b)
        tok = top_idx[ar, sel]
        new_logits = cand_logits[ar, sel]
        cache = gpt2_mod.commit_candidate(cache, ck, cv, sel)
        hidden_buf = hidden_buf.at[:, t0 + i].set(cand_hidden[ar, sel])
        return (new_logits, cache, hidden_buf), tok

    (_, _, _), toks = jax.lax.scan(
        step, (logits, cache, hidden_buf), jnp.arange(max_len)
    )
    return toks.T  # (B, max_len)


def contrastive_search(
    params: dict,
    embeds: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    tokenizer,
    *,
    alpha: float = 0.1,
    top_k: int = 48,
    max_len: int = 64,
    end_of_sentence: str = ".",
) -> List[str]:
    """Contrastive search with the reference's stopping semantics
    (search.py:294-405): eos is the FIRST token of `end_of_sentence`'s
    encoding; each sequence truncates at the first eos (inclusive; keep all
    `max_len` tokens if none). Returns one string per batch row (the
    reference returns a bare str for b==1; we always return a list —
    callers index [0])."""
    eos = tokenizer.encode(end_of_sentence)[0]
    toks = np.asarray(
        _contrastive_tokens(params, jnp.asarray(embeds), cfg, max_len,
                            top_k, alpha)
    )
    sentences = []
    for row in toks:
        cut = len(row) - 1
        for i, t in enumerate(row):
            if int(t) == eos:
                cut = i
                break
        sentences.append(tokenizer.decode(row[: cut + 1].tolist()))
    return sentences


# ------------------------------------------------------------------ model


def assemble_prompt_embeds(
    soft, token_rows, gpt2_params, pad_id: int, cfg: ViecapConfig
):
    """Pad hard-prompt token rows (reference pad_sequence semantics,
    entrypoint.py:137-147), embed via wte, and order [hard ‖ soft] per the
    only_hard_prompt / soft_prompt_first flags. Shared by VieCap and
    MeaCap so the assembly can never drift between the two."""
    maxlen = max(len(r) for r in token_rows)
    m = cfg.hard_prompt_pad_multiple
    if m:
        maxlen = -(-maxlen // m) * m
    padded = np.full((len(token_rows), maxlen), pad_id, np.int32)
    for i, r in enumerate(token_rows):
        padded[i, : len(r)] = r
    hard = gpt2_params["wte"][jnp.asarray(padded)]
    if cfg.only_hard_prompt:
        return hard
    if cfg.soft_prompt_first:
        return jnp.concatenate([soft, hard], axis=1)
    return jnp.concatenate([hard, soft], axis=1)


def run_search(gpt2_params, embeds, gpt2_cfg, tokenizer, cfg: ViecapConfig):
    """Greedy-vs-beam dispatch on `using_greedy_search`
    (entrypoint.py:149-163). The beam branch runs every image's beam in
    ONE vmapped program (`beam_search_batched`) — token-exact per image
    vs the reference's sequential per-sample loop."""
    if cfg.using_greedy_search:
        return greedy_search(
            gpt2_params, embeds, gpt2_cfg, tokenizer, max_len=cfg.max_len
        )
    return beam_search_batched(
        gpt2_params, embeds, gpt2_cfg, tokenizer,
        beam_width=cfg.beam_width, max_len=cfg.max_len,
    )


def sentence_perplexity(gpt2_params, gpt2_cfg, ids) -> float:
    """exp(mean shifted CE) of one tokenized sentence — HF
    `model(input_ids, labels=input_ids)` semantics (viecap
    entrypoint.py:164-177). Fewer than 2 tokens leaves zero shifted
    targets; torch's empty cross-entropy is NaN, reproduced here."""
    if len(ids) < 2:
        return float("nan")
    ids = jnp.asarray([ids], jnp.int32)
    embeds = gpt2_params["wte"][ids]
    logits = gpt2_mod.gpt2_forward(gpt2_params, embeds, gpt2_cfg)
    lp = jax.nn.log_softmax(logits[0, :-1], axis=-1)
    nll = -jnp.take_along_axis(lp, ids[0, 1:, None], axis=-1).mean()
    return float(jnp.exp(nll))


class VieCap:
    """Decoder-family entrypoint mirroring src/viecap/entrypoint.py.

    Construct with explicit params (tests) or via the captioner's nested
    `viecap:` config block (patchioner._build_viecap_family, mirroring the
    reference's entrypoint wiring).
    """

    def __init__(
        self,
        cfg: ViecapConfig,
        gpt2_cfg: gpt2_mod.GPT2Config,
        gpt2_params: dict,
        mapping_params: dict,
        entities: Sequence[str],
        texts_embeddings,
        tokenizer,
    ):
        self.cfg = cfg
        self.gpt2_cfg = gpt2_cfg
        self.gpt2_params = gpt2_params
        self.mapping_params = mapping_params
        self.entities = list(entities)
        self.texts_embeddings = jnp.asarray(texts_embeddings)
        self.tokenizer = tokenizer
        self._pad_id = getattr(tokenizer, "pad_token_id", None) or 0

    def _hard_prompt_token_rows(self, f) -> List[List[int]]:
        """Per-image hard-prompt token ids. VieCap retrieves entities from
        the text-embedding vocabulary (entrypoint.py:120-147); MeaCap
        overrides this with memory-caption concept extraction."""
        per_image = retrieve_entities(
            f,
            self.texts_embeddings,
            self.entities,
            top_k=self.cfg.top_k,
            threshold=self.cfg.threshold,
            temperature=self.cfg.temperature,
        )
        return [
            self.tokenizer.encode(compose_discrete_prompt(ents))
            for ents in per_image
        ]

    def forward(self, image_features, compute_scores: bool = False):
        cfg = self.cfg
        f = jnp.asarray(image_features)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        d_model = self.gpt2_cfg.n_embd
        soft = mapping_network_forward(self.mapping_params, f, cfg, d_model)

        if cfg.using_hard_prompt:
            embeds = assemble_prompt_embeds(
                soft, self._hard_prompt_token_rows(f), self.gpt2_params,
                self._pad_id, cfg,
            )
        else:
            embeds = soft

        sentences = run_search(
            self.gpt2_params, embeds, self.gpt2_cfg, self.tokenizer, cfg
        )
        if compute_scores:
            return sentences, self.compute_perplexity(sentences)
        return sentences

    __call__ = forward

    def compute_perplexity(self, sentences: List[str]) -> List[float]:
        """exp(mean shifted CE) per sentence (entrypoint.py:164-177)."""
        return [
            sentence_perplexity(
                self.gpt2_params, self.gpt2_cfg, self.tokenizer.encode(s)
            )
            for s in sentences
        ]
