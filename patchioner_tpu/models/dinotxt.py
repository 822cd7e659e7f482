"""DINO.txt — dinotxt checkpoint porting + the text tower.

Reference behavior being matched:

* model load: `torch.hub.load('facebookresearch/dinov2',
  'dinov2_vitl14_reg4_dinotxt_tet1280d20h24l')` unwrapped to
  `.visual_model.backbone.model` (src/model.py:345-346) — a plain ViT-L/14
  with 4 registers; the Patchioner encoder uses ONLY this inner backbone.
* bank building: captions are CLIP-BPE tokenized with sot/eot at context 77
  (src/dinotxt_utils.py:11-43) and encoded by the dinotxt model's
  `encode_text` -> (B, 2048) (im2txtprojection.py:680-682,520).
* bank loading: the stored 2048-d text embeddings are sliced `[:, 1024:]` —
  the patch-aligned half (im2txtprojection.py:405-406; io/memory_bank.py
  reproduces the slice).

The release name encodes the text-tower geometry: `tet1280d20h24l` = text
encoder transformer, width 1280, 20 heads, 24 layers. It is a CLIP-style
causal transformer whose 2048-d output concatenates a CLS-aligned half with
a patch-aligned half; `clip_text_forward` (models/clip.py) is the exact
compute, reused here with dinotxt geometry. Zero-egress environments cannot
fetch the hub release, so `port_dinotxt` is written against its checkpoint
layout (`visual_model.backbone.model.*` per the reference unwrap; the text
tower in the OpenAI-CLIP resblock naming) and raises listing the missing
keys when a layout deviates, rather than guessing.
"""

from __future__ import annotations

from typing import List, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.models import vit as vit_mod

__all__ = [
    "DINOTXT_TEXT_CONFIG",
    "DINOTXT_VISUAL_VARIANT",
    "init_dinotxt_text",
    "encode_text",
    "tokenize",
    "port_dinotxt_visual",
    "port_dinotxt_text",
    "port_dinotxt",
    "DinotxtTextEncoder",
]

# tet1280d20h24l; output dim 2048 = [CLS-aligned 1024 | patch-aligned 1024].
DINOTXT_TEXT_CONFIG = clip_mod.ClipTextConfig(
    vocab_size=49408,
    context_length=77,
    width=1280,
    depth=24,
    heads=20,
    proj_dim=2048,
)
DINOTXT_VISUAL_VARIANT = "dinov2_vitl14_reg"

_VISUAL_PREFIX = "visual_model.backbone.model."
_TEXT_PREFIX = "text_model."


def init_dinotxt_text(key: jax.Array, cfg=DINOTXT_TEXT_CONFIG) -> dict:
    return clip_mod.init_clip_text(key, cfg)


def encode_text(params: dict, tokens, cfg=DINOTXT_TEXT_CONFIG) -> jax.Array:
    """(B, 77) int tokens -> (B, 2048) dinotxt text embedding."""
    return clip_mod.clip_text_forward(params, jnp.asarray(tokens), cfg)


def tokenize(texts: Sequence[str], context_length: int = 77) -> np.ndarray:
    """CLIP-BPE tokenize with sot/eot, zero-padded/truncated to context
    length with eot forced at the cut (src/dinotxt_utils.py:15-43 — the
    dinotxt Tokenizer subclasses CLIP's; clip_bpe.tokenize is the same
    procedure)."""
    from patchioner_tpu.text import clip_bpe

    return clip_bpe.get_tokenizer().tokenize(texts, context_length)


def _strip_prefix(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}


def port_dinotxt_visual(sd: Mapping, depth: int = 24,
                        num_registers: int = 4) -> dict:
    """Port the inner DINOv2 backbone from a dinotxt hub checkpoint.

    Accepts either the full checkpoint (keys under
    `visual_model.backbone.model.`, the path the reference unwraps at
    src/model.py:345-346) or an already-stripped backbone state dict;
    delegates to the parity-tested `torch_port.port_dinov2`."""
    from patchioner_tpu.io import torch_port

    inner = _strip_prefix(sd, _VISUAL_PREFIX)
    if not inner:
        inner = dict(sd)
    if "cls_token" not in inner:
        raise KeyError(
            "dinotxt visual port: no 'visual_model.backbone.model.*' keys "
            f"and no bare DINOv2 layout; got e.g. {sorted(sd)[:5]}"
        )
    return torch_port.port_dinov2(inner, depth=depth,
                                  num_registers=num_registers)


def port_dinotxt_text(sd: Mapping, depth: int = 24) -> dict:
    """Port the dinotxt text tower (OpenAI-CLIP resblock naming under
    `text_model.`, optionally nested one more level e.g.
    `text_model.backbone.`)."""
    inner = _strip_prefix(sd, _TEXT_PREFIX)
    if not inner:
        inner = dict(sd)
    # tolerate one extra nesting level (e.g. text_model.backbone.*)
    if "token_embedding.weight" not in inner:
        candidates = {
            k.split(".", 1)[0] for k in inner if "token_embedding" in k
        }
        if len(candidates) == 1:
            inner = _strip_prefix(inner, candidates.pop() + ".")
    return clip_mod.port_openai_clip_text(inner, depth)


def port_dinotxt(sd: Mapping, *, visual_depth: int = 24,
                 num_registers: int = 4, text_depth: int = 24) -> dict:
    """Full checkpoint -> {"visual": vit params, "text": text params}.
    The text tower is optional (the reference's encoder path never runs
    it): a checkpoint with NO `text_model.*` keys yields
    {"visual": ..., "text": None}. A checkpoint that DOES carry text keys
    but fails to port re-raises — swallowing that KeyError would silently
    build memory banks without the text encoder the checkpoint provides."""
    out = {"visual": port_dinotxt_visual(sd, visual_depth, num_registers)}
    if not any(k.startswith(_TEXT_PREFIX) for k in sd):
        out["text"] = None
        return out
    out["text"] = port_dinotxt_text(sd, text_depth)
    return out


class DinotxtTextEncoder:
    """`encode_texts` surface for memory-bank building (the role
    im2txtprojection.py:680-682 gives the hub model + tokenizer)."""

    def __init__(self, params: dict, cfg=DINOTXT_TEXT_CONFIG):
        self.params = params
        self.cfg = cfg

    def encode_texts(self, texts: Sequence[str],
                     batch_size: int = 256) -> np.ndarray:
        chunks: List[np.ndarray] = []
        for i in range(0, len(texts), batch_size):
            toks = tokenize(texts[i : i + batch_size],
                            self.cfg.context_length)
            chunks.append(np.asarray(encode_text(self.params, toks, self.cfg)))
        return np.concatenate(chunks) if chunks else np.zeros(
            (0, self.cfg.proj_dim), np.float32
        )
