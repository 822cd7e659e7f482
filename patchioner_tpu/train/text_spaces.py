"""Frozen text-encoder spaces for decoder training and bank building.

The reference trains the DeCap decoder (and builds support-memory banks) in
five text-embedding spaces, selected by flags in
src/decap/decoderTraining.py:84-208:

* plain CLIP            (`clip.load`, :207-208; prefix 512, or 1024 for 'H')
* open_clip             (`--use_open_clip`, :196-199; laion2b towers)
* DINO.txt              (`--use_dinotxt`, :201-203; encode_text -> 2048-d,
                         training uses the patch-aligned half `[:, 1024:]`
                         :302-303; prefix 1024)
* RegionCLIP            (`--use-regionclip`, :116-147; 'lang_encoder.' keys
                         converted by src/regionclip/loader.py:97-105;
                         prefix from text_projection, 1024 for RN50)
* DenseCLIP             (`--denseclip_config`, :149-194; keys under
                         'text_encoder.', geometry from the config yaml —
                         context length 13; prefix = text embed_dim)

All five are architecturally the SAME causal CLIP text transformer (OpenAI
layout), so here each space is just geometry + a checkpoint-prefix porter +
a tokenizer context length feeding `clip_text_forward` — one jitted XLA
program per space instead of five vendored towers. Zero-egress environments
get a seeded random init at the documented geometry (loudly flagged).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from patchioner_tpu.models import clip as clip_mod

__all__ = ["TextSpace", "TEXT_SPACE_NAMES", "build_text_space"]

TEXT_SPACE_NAMES = ("clip", "open_clip", "dinotxt", "regionclip", "denseclip")


@dataclasses.dataclass
class TextSpace:
    """A frozen text encoder: tokenize -> encode -> (B, prefix_size)."""

    name: str
    prefix_size: int
    cfg: clip_mod.ClipTextConfig
    params: dict
    # maps the raw tower output to the training-space feature (identity for
    # all spaces except dinotxt's `[:, 1024:]` patch-aligned slice)
    _post: Optional[Callable] = None

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        from patchioner_tpu.text import clip_bpe

        return clip_bpe.get_tokenizer().tokenize(
            texts, self.cfg.context_length
        )

    def encode_tokens(self, tokens) -> jax.Array:
        """(B, T) int tokens -> (B, prefix_size) training-space features."""
        feats = clip_mod.clip_text_forward(
            self.params, jnp.asarray(tokens), self.cfg
        )
        return self._post(feats) if self._post is not None else feats

    def encode_texts(self, texts: Sequence[str],
                     batch_size: int = 256) -> np.ndarray:
        chunks = []
        for i in range(0, len(texts), batch_size):
            toks = self.tokenize(list(texts[i : i + batch_size]))
            chunks.append(np.asarray(self.encode_tokens(toks)))
        return (np.concatenate(chunks) if chunks
                else np.zeros((0, self.prefix_size), np.float32))

    def encode_texts_for_bank(self, texts: Sequence[str],
                              batch_size: int = 256) -> np.ndarray:
        """Raw tower output for bank building — banks store the FULL
        embedding (2048-d for dinotxt; `load_bank(dinotxt_slice=True)`
        applies the `[:, 1024:]` at load, im2txtprojection.py:405-406)."""
        chunks = []
        for i in range(0, len(texts), batch_size):
            toks = self.tokenize(list(texts[i : i + batch_size]))
            chunks.append(np.asarray(clip_mod.clip_text_forward(
                self.params, jnp.asarray(toks), self.cfg
            )))
        return (np.concatenate(chunks) if chunks
                else np.zeros((0, self.cfg.proj_dim), np.float32))


def _load_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(
            ckpt[key], dict
        ):
            ckpt = ckpt[key]
            break
    return ckpt


def _geometry_from_sd(sd: dict) -> clip_mod.ClipTextConfig:
    """Infer the tower geometry from a (prefix-stripped) OpenAI-layout state
    dict — the same introspection the reference's loaders do
    (src/regionclip/loader.py:200-210). Head count is not recoverable from
    parameter shapes; width//64 encodes the CLIP-family invariant
    head_dim == 64 (holds for every tower the reference loads: CLIP
    ViT-B/L, open_clip, RegionCLIP RN50, DenseCLIP, dinotxt tet1280d20h24l
    is 1280/64=20 heads)."""
    vocab, width = sd["token_embedding.weight"].shape
    context = sd["positional_embedding"].shape[0]
    proj = sd["text_projection"].shape[1]
    depth = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks.")
    )
    return clip_mod.ClipTextConfig(
        vocab_size=int(vocab), context_length=int(context), width=int(width),
        depth=depth, heads=int(width) // 64, proj_dim=int(proj),
    )


def _strip(sd: dict, prefix: str) -> dict:
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return out or dict(sd)


def _denseclip_text_cfg(config_name: str) -> clip_mod.ClipTextConfig:
    import yaml

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "denseclip_configs", f"{config_name}.yaml",
    )
    with open(path) as f:
        text = yaml.safe_load(f).get("model", {}).get("text", {})
    return clip_mod.ClipTextConfig(
        vocab_size=int(text.get("vocab_size", 49408)),
        context_length=int(text.get("context_length", 13)),
        width=int(text.get("transformer_width", 512)),
        depth=int(text.get("transformer_layers", 12)),
        heads=int(text.get("transformer_heads", 8)),
        proj_dim=int(text.get("embed_dim", 512)),
    )


def build_text_space(
    name: str,
    weights: Optional[str] = None,
    *,
    denseclip_config: str = "denseclip_segmentation_vitb16",
    seed: int = 0,
) -> TextSpace:
    """Build a frozen text space by name; port `weights` when given, else
    seeded random init at the space's documented geometry."""
    if name not in TEXT_SPACE_NAMES:
        raise ValueError(
            f"unknown text space {name!r}; choose from {TEXT_SPACE_NAMES}"
        )

    ckpt_prefix = {
        "clip": "", "open_clip": "", "dinotxt": "text_model.",
        "regionclip": "lang_encoder.", "denseclip": "text_encoder.",
    }[name]

    sd = None
    if weights and os.path.exists(weights):
        sd = _strip(_load_state_dict(weights), ckpt_prefix)
        if name == "dinotxt" and "token_embedding.weight" not in sd:
            # tolerate the extra nesting some dinotxt exports carry
            cands = {k.split(".", 1)[0] for k in sd
                     if "token_embedding" in k}
            if len(cands) == 1:
                sd = _strip(sd, cands.pop() + ".")

    if sd is not None:
        if name == "clip" and "text_model.embeddings.token_embedding.weight" in sd:
            # HF transformers CLIPTextModelWithProjection export — infer
            # the full geometry from the state dict like the OpenAI-layout
            # branch below; fixed ViT-B defaults would run a ViT-L-width
            # tower with the wrong width/heads/proj
            vocab, width = sd[
                "text_model.embeddings.token_embedding.weight"].shape
            context = sd[
                "text_model.embeddings.position_embedding.weight"].shape[0]
            # torch Linear stores (out, in): out is the projection dim
            proj = sd["text_projection.weight"].shape[0]
            depth = 1 + max(
                int(k.split(".")[3]) for k in sd
                if k.startswith("text_model.encoder.layers.")
            )
            cfg = clip_mod.ClipTextConfig(
                vocab_size=int(vocab), context_length=int(context),
                width=int(width), depth=depth, heads=int(width) // 64,
                proj_dim=int(proj),
            )
            params = clip_mod.port_hf_clip_text(sd, depth)
        else:
            cfg = _geometry_from_sd(sd)
            params = clip_mod.port_openai_clip_text(sd, cfg.depth)
    else:
        if weights:
            print(f"[!] text weights not found at {weights} — "
                  f"seeded random {name} encoder")
        else:
            print(f"[!] no text weights — seeded random {name} encoder")
        if name == "dinotxt":
            from patchioner_tpu.models import dinotxt as dinotxt_mod

            cfg = dinotxt_mod.DINOTXT_TEXT_CONFIG
        elif name == "denseclip":
            cfg = _denseclip_text_cfg(denseclip_config)
        elif name == "regionclip":
            # RN50 detection checkpoints: width-512 tower, 1024-d projection
            # (decoderTraining.py:86-88 default prefix_size)
            cfg = clip_mod.ClipTextConfig(proj_dim=1024)
        else:  # clip / open_clip ViT-B geometry
            cfg = clip_mod.ClipTextConfig()
        params = jax.jit(lambda k: clip_mod.init_clip_text(k, cfg))(
            jax.random.PRNGKey(seed)
        )

    post = None
    prefix_size = cfg.proj_dim
    if name == "dinotxt":
        if cfg.proj_dim % 2:
            raise ValueError(
                f"dinotxt text tower must have an even proj dim "
                f"(CLS-aligned | patch-aligned halves); got {cfg.proj_dim}"
            )
        half = cfg.proj_dim // 2
        # training uses the patch-aligned half (decoderTraining.py:302-303)
        post = lambda f: f[:, half:]
        prefix_size = half
    return TextSpace(name=name, prefix_size=prefix_size, cfg=cfg,
                     params=params, _post=post)
