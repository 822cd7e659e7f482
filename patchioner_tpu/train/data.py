"""Text-only training datasets for decoder training.

Reference: src/dataset.py (ClipCocoDataset) and src/datasetMix.py
(ClipCocoDatasetMix). Captions are CLIP-BPE tokenized; the "Mix" variant
pairs a caption's tokens with the *embedding of a different caption of the
same image* (the text-only stand-in for image conditioning).

TPU-shaped: everything is pre-tokenized into fixed (N, T) int arrays and
iterated as sharded host batches — no per-item Dataset/DataLoader machinery.
"""

from __future__ import annotations

import json
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from patchioner_tpu.text import clip_bpe

__all__ = ["CaptionDataset", "load_coco_captions", "batch_iterator",
           "caption_lengths"]


def load_coco_captions(path: str) -> Tuple[List[str], List[int]]:
    """COCO caption JSON -> (captions, image_ids). Also accepts a plain
    JSON list, whose entries may be annotation dicts OR bare caption
    strings (the simple corpus format the training CLI documents)."""
    with open(path) as f:
        data = json.load(f)
    anns = data["annotations"] if isinstance(data, dict) else data
    captions, image_ids = [], []
    for i, a in enumerate(anns):
        if isinstance(a, str):
            captions.append(a)
            image_ids.append(i)
        else:
            captions.append(a["caption"])
            image_ids.append(a.get("image_id", i))
    return captions, image_ids


def caption_lengths(tokens) -> np.ndarray:
    """True per-row token counts: first EOT position + 1 when present, else
    the full row (a truncated caption whose EOT was cut). Counting nonzero
    entries instead would MISCOUNT captions containing a genuine interior
    token id 0 (CLIP BPE '!' without </w>) and silently truncate their
    packed spans."""
    tokens = np.asarray(tokens)
    is_eot = tokens == clip_bpe.EOT_TOKEN
    has_eot = is_eot.any(axis=1)
    nonempty = (tokens != 0).any(axis=1)
    return np.where(
        has_eot, np.argmax(is_eot, axis=1) + 1,
        np.where(nonempty, tokens.shape[1], 0),
    ).astype(np.int64)


class CaptionDataset:
    """Pre-tokenized caption corpus.

    tokens: (N, T) int32 — [SOT] ids [EOT] 0-padded (CLIP layout; padding id
    0 is the CE ignore_index, matching the reference loss).
    """

    def __init__(
        self,
        captions: Sequence[str],
        image_ids: Optional[Sequence[int]] = None,
        max_len: int = 20,
        tokenizer=None,
    ):
        """max_len default 20 = the reference's max_seq_len (dataset.py:45,
        datasetMix.py:59). Truncation reproduces pad_tokens' RAW slice
        (dataset.py:22-24): CLIP-tokenize at the native 77 then take the
        first max_len columns — a too-long caption keeps its 20th token
        as-is, with NO EOT re-inserted (forcing EOT, as a direct
        tokenize(max_len) would, changes the training target)."""
        self.captions = list(captions)
        self.image_ids = list(image_ids) if image_ids is not None else list(
            range(len(captions))
        )
        full_len = max(int(max_len), 77)
        if tokenizer is not None:
            toks = tokenizer.tokenize(self.captions, full_len)
        else:
            # corpus-scale pre-tokenization forks across host cores
            # (no-op fallback to in-process on single-core hosts)
            toks = clip_bpe.tokenize_parallel(self.captions, full_len)
        self.tokens = np.asarray(toks)[:, :max_len]
        self._by_image: dict = {}
        for i, img in enumerate(self.image_ids):
            self._by_image.setdefault(img, []).append(i)

    def __len__(self):
        return len(self.captions)

    def mix_indices(self, rng: random.Random) -> np.ndarray:
        """For each caption, the index of a uniformly-drawn caption of the
        SAME image — INCLUDING itself (src/datasetMix.py:49 samples
        `random.choice(range(num_captions))` with no self-exclusion, so a
        5-caption COCO image pairs a caption with its own embedding ~20% of
        the time; that plain-reconstruction mixture is part of the Mix
        recipe)."""
        out = np.arange(len(self.captions))
        for img, idxs in self._by_image.items():
            for i in idxs:
                out[i] = rng.choice(idxs)
        return out


def batch_iterator(
    n: int,
    batch_size: int,
    *,
    seed: int = 0,
    shuffle: bool = True,
    drop_remainder: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
) -> Iterator[np.ndarray]:
    """Index batches with optional host sharding (the DistributedSampler
    equivalent, reference decoderTraining.py:259-260)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n) if shuffle else np.arange(n)
    if num_shards > 1:
        # pad to equal per-shard length by wrapping (DistributedSampler
        # semantics): otherwise shards can disagree on the number of
        # batches and a multi-host SPMD loop hangs on a collective one
        # host never joins
        total = -(-len(order) // num_shards) * num_shards
        # np.resize repeats cyclically, so this also covers n < num_shards
        # (a single slice could only supply len(order) extra elements)
        order = np.resize(order, total)
        order = order[shard_index::num_shards]
    end = (len(order) // batch_size) * batch_size if drop_remainder else len(order)
    for i in range(0, end, batch_size):
        yield order[i : i + batch_size]
