"""ClipCap — MLP/Transformer prefix mapper + GPT-2 nucleus sampling.

Reference: src/clipcap/entrypoint.py. A DINO/CLIP feature maps to
`prefix_length` GPT-2 prefix embeddings via either a tanh-MLP
(sizes (D, 768*L//2, 768*L), entrypoint.py:433-435) or a TransformerMapper
(same transformer block family as ViECap's mapping network,
entrypoint.py:141-155); a full GPT-2 then nucleus-samples
(top_p=0.8, temperature=1.0, entry_length=67, stop at '.',
`generate_batched` entrypoint.py:198-313).

TPU redesign: generation is a KV-cached `lax.scan` with vectorized top-p
filtering and `jax.random.categorical` sampling (the reference does a Python
per-sequence sort/filter loop and full-context re-forwards). Stop handling
follows the reference: sequences keep sampling after their stop token; the
decode step truncates at the first stop token and re-appends it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from patchioner_tpu.models import gpt2 as gpt2_mod
from patchioner_tpu.models import viecap as viecap_mod

__all__ = [
    "ClipCapConfig",
    "mlp_mapper_forward",
    "init_mlp_mapper",
    "port_clipcap",
    "nucleus_sample",
    "generate_batched",
    "ClipCap",
]


@dataclasses.dataclass(frozen=True)
class ClipCapConfig:
    # Reference defaults: entrypoint.py:438-456
    prefix_length: int = 10
    clip_length: int = 10
    num_layers: int = 8
    mapping_type: str = "mlp"  # 'mlp' | 'transformer'
    temperature: float = 1.0
    top_p: float = 0.8
    entry_length: int = 67
    stop_token: str = "."
    normalize_prefix: bool = False
    num_heads: int = 8
    mlp_ratio: float = 2.0


# ------------------------------------------------------------------ mapper


def init_mlp_mapper(key: jax.Array, prefix_size: int, prefix_length: int,
                    d_model: int) -> dict:
    """MLP((D, 768*L//2, 768*L)) with tanh between (decap.py MLP class).

    Init matches torch nn.Linear defaults — U(±1/sqrt(fan_in)) weights AND
    biases — since the mapper trains from scratch (round 4; previously
    normal/sqrt(fan_in) weights + zero biases, an undocumented
    deviation)."""
    import math

    hidden = (d_model * prefix_length) // 2
    out = d_model * prefix_length
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = 1.0 / math.sqrt(prefix_size)
    b2 = 1.0 / math.sqrt(hidden)
    return {
        "fc1": {
            "w": jax.random.uniform(k1, (prefix_size, hidden), jnp.float32,
                                    -b1, b1),
            "b": jax.random.uniform(k3, (hidden,), jnp.float32, -b1, b1),
        },
        "fc2": {
            "w": jax.random.uniform(k2, (hidden, out), jnp.float32,
                                    -b2, b2),
            "b": jax.random.uniform(k4, (out,), jnp.float32, -b2, b2),
        },
    }


def mlp_mapper_forward(params: dict, x: jax.Array, prefix_length: int,
                       d_model: int) -> jax.Array:
    h = jnp.tanh(x @ params["fc1"]["w"] + params["fc1"]["b"])
    h = h @ params["fc2"]["w"] + params["fc2"]["b"]
    return h.reshape(-1, prefix_length, d_model)


def port_clipcap(sd, cfg: ClipCapConfig, n_layer: int = 12) -> dict:
    """Port a ClipCap checkpoint: clip_project.* mapper (+ gpt.* when the
    checkpoint includes finetuned GPT-2 weights)."""

    from patchioner_tpu.io.torch_port import _np

    out = {}
    if cfg.mapping_type == "mlp":
        out["mapper"] = {
            "fc1": {
                "w": _np(sd["clip_project.model.0.weight"]).T,
                "b": _np(sd["clip_project.model.0.bias"]),
            },
            "fc2": {
                "w": _np(sd["clip_project.model.2.weight"]).T,
                "b": _np(sd["clip_project.model.2.bias"]),
            },
        }
    else:
        out["mapper"] = viecap_mod.port_mapping_network(
            sd, prefix="clip_project.", num_layers=cfg.num_layers
        )
    if any(k.startswith("gpt.") for k in sd):
        from patchioner_tpu.io import torch_port

        out["gpt2"] = torch_port.port_hf_gpt2_lmhead(
            {k[len("gpt."):]: v for k, v in sd.items() if k.startswith("gpt.")},
            n_layer,
        )
    return out


# -------------------------------------------------------------- generation


def nucleus_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Vectorized reference top-p filter (entrypoint.py:247-262): sort desc,
    cumulative softmax, drop tokens past top_p but always keep the argmax."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # shift right: sorted_indices_to_remove[1:] = [:-1]; [0] = False
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1], bool), (cum > top_p)[..., :-1]], axis=-1
    )
    # threshold logit value: smallest kept logit per row
    min_kept = jnp.min(jnp.where(remove_sorted, jnp.inf, sorted_logits), axis=-1,
                       keepdims=True)
    return jnp.where(logits < min_kept, -jnp.inf, logits)


@functools.partial(jax.jit, static_argnames=("cfg", "entry_length", "stop_id"))
def _sample_tokens(
    gpt2_params: dict,
    prefix_embeds: jax.Array,
    key: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    entry_length: int,
    stop_id: int,
    top_p: float,
    temperature: float,
) -> jax.Array:
    b, t0, _ = prefix_embeds.shape
    logits0, cache = gpt2_mod.gpt2_prefill(
        gpt2_params, prefix_embeds, cfg, t0 + entry_length
    )

    def step(carry, k):
        logits, cache = carry
        filt = nucleus_filter(logits / temperature, top_p)
        filt = jnp.clip(filt, -1e9, 1e9)
        # NaN guard (entrypoint.py:272-276): all-filtered rows -> stop token
        bad = ~jnp.isfinite(jnp.max(filt, axis=-1))
        tok = jax.random.categorical(k, filt, axis=-1)
        tok = jnp.where(bad, stop_id, tok)
        emb = gpt2_params["wte"][tok]
        new_logits, cache = gpt2_mod.gpt2_step(gpt2_params, emb, cache, cfg)
        return (new_logits, cache), tok

    keys = jax.random.split(key, entry_length)
    (_, _), toks = jax.lax.scan(step, (logits0, cache), keys)
    return toks.T  # (B, entry_length)


def generate_batched(
    gpt2_params: dict,
    prefix_embeds: jax.Array,
    cfg: gpt2_mod.GPT2Config,
    tokenizer,
    *,
    key: Optional[jax.Array] = None,
    entry_length: int = 67,
    top_p: float = 0.8,
    temperature: float = 1.0,
    stop_token: str = ".",
) -> List[str]:
    key = key if key is not None else jax.random.PRNGKey(0)
    stop_id = tokenizer.encode(stop_token)[0]
    toks = np.asarray(
        _sample_tokens(
            gpt2_params, jnp.asarray(prefix_embeds), key, cfg, entry_length,
            stop_id, top_p, temperature,
        )
    )
    captions = []
    for row in toks:
        text = tokenizer.decode(row.tolist())
        captions.append(text.split(stop_token)[0] + stop_token)
    return captions


# ------------------------------------------------------------------ model


class ClipCap:
    """Decoder family entrypoint mirroring src/clipcap/entrypoint.py:381-580."""

    def __init__(
        self,
        cfg: ClipCapConfig,
        gpt2_cfg: gpt2_mod.GPT2Config,
        gpt2_params: dict,
        mapper_params: dict,
        tokenizer,
        prefix_size: int = 768,
    ):
        self.cfg = cfg
        self.gpt2_cfg = gpt2_cfg
        self.gpt2_params = gpt2_params
        self.mapper_params = mapper_params
        self.tokenizer = tokenizer
        self.prefix_size = prefix_size
        self._key = jax.random.PRNGKey(0)

    def _project(self, feats: jax.Array) -> jax.Array:
        if self.cfg.mapping_type == "mlp":
            return mlp_mapper_forward(
                self.mapper_params, feats, self.cfg.prefix_length,
                self.gpt2_cfg.n_embd,
            )
        vcfg = viecap_mod.ViecapConfig(
            continuous_prompt_length=self.cfg.prefix_length,
            clip_project_length=self.cfg.clip_length,
            clip_hidden_size=self.prefix_size,
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
            mlp_ratio=self.cfg.mlp_ratio,
        )
        return viecap_mod.mapping_network_forward(
            self.mapper_params, feats, vcfg, self.gpt2_cfg.n_embd
        )

    def forward(self, features, compute_scores: bool = False):
        f = jnp.asarray(features)
        if self.cfg.normalize_prefix:
            f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        prefix = self._project(f)
        self._key, k = jax.random.split(self._key)
        captions = generate_batched(
            self.gpt2_params,
            prefix,
            self.gpt2_cfg,
            self.tokenizer,
            key=k,
            entry_length=self.cfg.entry_length,
            top_p=self.cfg.top_p,
            temperature=self.cfg.temperature,
            stop_token=self.cfg.stop_token,
        )
        if compute_scores:
            return captions, self.compute_perplexity_scores(captions)
        return captions

    __call__ = forward

    def compute_perplexity_scores(self, sentences: List[str]) -> List[float]:
        """ClipCap scores are 1/perplexity with a 1.0 fallback — NOT raw
        perplexity like ViECap's (clipcap entrypoint.py:554-592: any
        tokenize/forward failure falls back to 1.0, and the `perplexity > 0`
        guard routes NaN — e.g. a <2-token caption, whose empty shifted CE
        is NaN in torch — to 1.0 as well)."""
        out = []
        for s in sentences:
            try:
                pp = viecap_mod.sentence_perplexity(
                    self.gpt2_params, self.gpt2_cfg, self.tokenizer.encode(s)
                )
            except Exception:
                out.append(1.0)
                continue
            out.append(1.0 / pp if pp > 0 else 1.0)
        return out
