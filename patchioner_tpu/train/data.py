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

__all__ = ["CaptionDataset", "load_coco_captions", "batch_iterator"]


def load_coco_captions(path: str) -> Tuple[List[str], List[int]]:
    """COCO caption JSON -> (captions, image_ids)."""
    with open(path) as f:
        data = json.load(f)
    anns = data["annotations"] if isinstance(data, dict) else data
    return [a["caption"] for a in anns], [a.get("image_id", i) for i, a in enumerate(anns)]


class CaptionDataset:
    """Pre-tokenized caption corpus.

    tokens: (N, T) int32 — [SOT] ids [EOT] 0-padded (CLIP layout; padding id
    0 is the CE ignore_index, matching the reference loss).
    """

    def __init__(
        self,
        captions: Sequence[str],
        image_ids: Optional[Sequence[int]] = None,
        max_len: int = 77,
        tokenizer=None,
    ):
        self.captions = list(captions)
        self.image_ids = list(image_ids) if image_ids is not None else list(
            range(len(captions))
        )
        if tokenizer is not None:
            self.tokens = tokenizer.tokenize(self.captions, max_len)
        else:
            # corpus-scale pre-tokenization forks across host cores
            # (no-op fallback to in-process on single-core hosts)
            self.tokens = clip_bpe.tokenize_parallel(self.captions, max_len)
        self._by_image: dict = {}
        for i, img in enumerate(self.image_ids):
            self._by_image.setdefault(img, []).append(i)

    def __len__(self):
        return len(self.captions)

    def mix_indices(self, rng: random.Random) -> np.ndarray:
        """For each caption, the index of a *different* caption of the same
        image (itself when the image has a single caption) — the Mix pairing
        (src/datasetMix.py:15)."""
        out = np.arange(len(self.captions))
        for img, idxs in self._by_image.items():
            if len(idxs) < 2:
                continue
            for i in idxs:
                choice = i
                while choice == i:
                    choice = rng.choice(idxs)
                out[i] = choice
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
    order = order[shard_index::num_shards]
    end = (len(order) // batch_size) * batch_size if drop_remainder else len(order)
    for i in range(0, end, batch_size):
        yield order[i : i + batch_size]
