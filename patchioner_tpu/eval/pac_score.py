"""CLIP-S / PAC-S / RefPAC-S on the JAX CLIP towers.

Reference: pacsMetric/pac_score.py. PAC-S = w * max(0, cos(image, candidate))
with a PAC-finetuned CLIP ViT-B/32 (w=2.0); CLIP-S is the same formula with
stock CLIP and w=2.5 plus the "A photo depicts" prompt
(compute_scores.py:166-256); RefPAC-S = per-candidate max cosine against its
reference captions.

The scoring model is pluggable: pass ported CLIP params (PAC checkpoint via
io.torch_port-style conversion) — feature extraction runs batched on TPU.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from patchioner_tpu.models import clip as clip_mod
from patchioner_tpu.text import clip_bpe

__all__ = ["ClipScorer", "pac_score", "ref_pac_score"]


def _norm(x: np.ndarray) -> np.ndarray:
    return x / np.sqrt(np.sum(x**2, axis=-1, keepdims=True))


class ClipScorer:
    """Batched text/image feature extractor over the JAX CLIP towers."""

    def __init__(self, vision_params, text_params, vision_cfg, text_cfg,
                 tokenizer=None):
        self.vision_params = vision_params
        self.text_params = text_params
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.tokenizer = tokenizer or clip_bpe.get_tokenizer()

    def encode_texts(self, texts: Sequence[str], batch_size: int = 256,
                     prompt: str = "") -> np.ndarray:
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = [prompt + t for t in texts[i : i + batch_size]]
            toks = jnp.asarray(self.tokenizer.tokenize(chunk, 77))
            out.append(
                np.asarray(
                    clip_mod.clip_text_forward(self.text_params, toks, self.text_cfg)
                )
            )
        return np.concatenate(out, axis=0)

    def encode_images(self, pixels, batch_size: int = 64) -> np.ndarray:
        out = []
        for i in range(0, len(pixels), batch_size):
            feats = clip_mod.clip_visual_forward(
                self.vision_params, jnp.asarray(pixels[i : i + batch_size]),
                self.vision_cfg,
            )["x_norm_clstoken"]
            out.append(np.asarray(feats))
        return np.concatenate(out, axis=0)


PAC_PROMPT = "A photo depicts "


def pac_score(
    scorer: Optional[ClipScorer],
    image_features: np.ndarray,
    candidates: Sequence[str],
    w: float = 2.0,
    prompt: str = PAC_PROMPT,
    candidate_features: Optional[np.ndarray] = None,
):
    """w * max(0, cos) per candidate (pac_score.py:77-92). Pass either a
    scorer (texts encoded here) or precomputed candidate features.

    `prompt` defaults to the reference's CapDataset prefix
    ('A photo depicts ', pac_score.py:11-15): EVERY caption PAC-S or
    RefPAC-S encodes — candidate and reference alike — carries it."""
    if candidate_features is None:
        candidate_features = scorer.encode_texts(list(candidates), prompt=prompt)
    img = _norm(np.asarray(image_features))
    cand = _norm(candidate_features)
    per = w * np.clip(np.sum(img * cand, axis=1), 0, None)
    return float(np.mean(per)), per, cand, [len(c.split()) for c in candidates]


def ref_pac_score(
    scorer: Optional[ClipScorer],
    references: Sequence[Sequence[str]],
    candidate_features: np.ndarray,
    prompt: str = PAC_PROMPT,
):
    """Per-candidate max cosine vs its reference captions
    (pac_score.py:175-210). References encode with the same CapDataset
    prefix the candidates carry (extract_all_captions, :53,192)."""
    flat: List[str] = []
    idxs: List[int] = []
    for i, refs in enumerate(references):
        flat.extend(refs)
        idxs.extend([i] * len(refs))
    ref_feats = _norm(scorer.encode_texts(flat, prompt=prompt))
    cand = _norm(np.asarray(candidate_features))
    idx_arr = np.asarray(idxs, np.int64)
    sims = np.sum(ref_feats * cand[idx_arr], axis=1)
    # segment max per candidate — references are grouped contiguously, so
    # one np.maximum.at pass replaces the O(N^2) per-candidate mask scan
    # (a 25k-caption eval has ~125k flat refs)
    per = np.full(len(candidate_features), -np.inf)
    np.maximum.at(per, idx_arr, sims)
    per[~np.isfinite(per)] = 0.0  # candidates with zero references
    return float(np.mean(per)), per


def cached_image_features(
    scorer: ClipScorer,
    image_ids: Sequence[str],
    load_pixels,
    cache_path: Optional[str] = None,
    batch_size: int = 64,
) -> np.ndarray:
    """Image features with an HDF5 cache keyed by image id — the
    reference extracts CLIP-S image features once and reuses them across
    scoring runs (eval-trace-captioning/compute_scores.py:166-256).

    `load_pixels(ids) -> (B, H, W, 3)` is called only for cache misses
    (pass the annotated renders from `utils.drawing` for parity). Without
    `cache_path` (or without h5py) everything is computed in memory.
    """
    ids = [str(i) for i in image_ids]
    feats: dict = {}
    h5 = None
    if cache_path is not None:
        # any cache problem (no h5py, corrupt/locked file) degrades to
        # in-memory computation — the cache is an optimization, never a
        # reason to abort a scoring run
        try:
            import h5py

            h5 = h5py.File(cache_path, "a")
            for k in ids:
                if k in h5:
                    feats[k] = np.asarray(h5[k])
        except Exception as e:
            import warnings

            warnings.warn(
                f"image-feature cache {cache_path} unusable "
                f"({type(e).__name__}: {e}); computing in memory",
                RuntimeWarning,
                stacklevel=2,
            )
            if h5 is not None:
                # the read loop can fail AFTER the file opened (corrupt
                # dataset) — close before dropping the reference or the
                # 'a'-mode handle stays open/locked for the process life
                try:
                    h5.close()
                except Exception:
                    pass
            h5 = None
    try:
        missing = [k for k in ids if k not in feats]
        for i in range(0, len(missing), batch_size):
            chunk = missing[i : i + batch_size]
            out = scorer.encode_images(
                load_pixels(chunk), batch_size=batch_size
            )
            for k, f in zip(chunk, out):
                feats[k] = f
                if h5 is not None and k not in h5:
                    h5.create_dataset(k, data=f)
    finally:
        # a mid-loop failure must still close the handle (an open 'a'-mode
        # file with partial datasets corrupts the next run's cache)
        if h5 is not None:
            h5.close()
    return np.stack([feats[k] for k in ids])
