"""Sequence packing for decoder training — a TPU-idiomatic upside feature.

The reference pads every caption to a fixed max_seq_len (20,
src/dataset.py:45); COCO captions average ~11 tokens, so a large share of
every training batch is pad compute. Packing lays several
captions back to back in fixed-length rows with segment-local causal
attention (`models/gpt2.gpt2_hidden_packed`), so a caption of l real tokens
costs exactly l sequence positions:

  row:      [P a b c | P d e | P f g h i | 0 0 ...]
  inputs:    prefix_0, wte[a], wte[b], prefix_1, wte[d], prefix_2, ...
  targets:   a, b, c, d, e, f, ...                       (0 = ignore)

Position j of a segment inputs the prefix (j==0) or the previous target
token, and predicts target j — the same alignment as the unpacked DeCap loss
(embeds = [prefix || tok_emb], logits[:, :-1] predict tokens, reference
decoderTraining.py:323-330). The final real token of a caption is never fed
as input (its prediction would be masked anyway), which is what makes the
cost exactly l instead of l+1.

Prefix features are tracked per SEGMENT (`seg_feature_idx`, (R, S)) rather
than per position so the frozen input pipeline (memory projection / CapDec
noise, `decoder_train.prepare_features`) runs once per caption — noise must
be drawn per caption, not per slot.

Everything here is host-side NumPy producing static-shape arrays; the device
sees one (R, L) program regardless of the length mix.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

__all__ = ["PackedBatch", "pack_captions", "packing_efficiency"]


class PackedBatch(NamedTuple):
    """Static-shape packed rows."""

    input_tokens: np.ndarray    # (R, L) token embedded at each slot (0 at prefix/pad)
    prefix_mask: np.ndarray     # (R, L) bool — slot inputs a projected prefix
    targets: np.ndarray         # (R, L) target token id; 0 = pad/ignore
    segment_ids: np.ndarray     # (R, L) 1..S within a row; 0 = pad
    pos_ids: np.ndarray         # (R, L) position within the segment (for wpe)
    seg_feature_idx: np.ndarray  # (R, S) feature index per segment; 0-padded


def pack_captions(
    tokens: np.ndarray,
    row_len: int,
    feature_indices: Optional[np.ndarray] = None,
    order: Optional[np.ndarray] = None,
    max_segments: Optional[int] = None,
) -> PackedBatch:
    """Greedily pack captions (N, T) into rows of length `row_len`.

    tokens: 0-padded caption token ids — caption i is tokens[i][:l_i] where
      l_i = tokens up to and including the first EOT (falling back to the
      full row for EOT-less truncated captions) — computed via
      data.caption_lengths, NOT a nonzero count: a genuine interior token
      id 0 (CLIP BPE '!') must not truncate the packed span.
    feature_indices: per-caption index into the features array the prefix
      embedding comes from (defaults to arange(N); the Mix dataset passes its
      shuffled same-image mapping here).
    order: sequence in which captions are packed (pass a shuffled permutation
      per epoch; next-fit preserves it).
    max_segments: cap on captions per row — fixes the S axis across batches
      so the train step compiles once (a new row starts when either the
      length or the segment budget is exhausted). Defaults to the observed
      maximum.

    Captions longer than row_len raise (choose row_len >= the dataset's max
    caption length; the reference pads to 20).
    """
    from patchioner_tpu.train.data import caption_lengths

    tokens = np.asarray(tokens)
    n, t = tokens.shape
    lengths = caption_lengths(tokens)
    if feature_indices is None:
        feature_indices = np.arange(n, dtype=np.int64)
    if order is None:
        order = np.arange(n, dtype=np.int64)
    if lengths.max(initial=0) > row_len:
        raise ValueError(
            f"caption of {int(lengths.max())} tokens does not fit row_len={row_len}"
        )

    rows: list[list[int]] = []  # caption indices per row
    fill: list[int] = []        # used slots per row
    # next-fit: append to the current row until the caption doesn't fit
    # (first-fit-decreasing packs ~1% tighter but would break the caller's
    # shuffle; next-fit keeps epoch order random and is O(N)).
    seg_cap = max_segments if max_segments is not None else row_len
    for ci in order:
        l = int(lengths[ci])
        if l == 0:
            continue
        if rows and fill[-1] + l <= row_len and len(rows[-1]) < seg_cap:
            rows[-1].append(int(ci))
            fill[-1] += l
        else:
            rows.append([int(ci)])
            fill.append(l)

    r = len(rows)
    s = max_segments if max_segments is not None else max(
        (len(c) for c in rows), default=1
    )
    input_tokens = np.zeros((r, row_len), np.int32)
    prefix_mask = np.zeros((r, row_len), bool)
    targets = np.zeros((r, row_len), np.int32)
    segment_ids = np.zeros((r, row_len), np.int32)
    pos_ids = np.zeros((r, row_len), np.int32)
    seg_feature_idx = np.zeros((r, s), np.int32)

    for ri, caps in enumerate(rows):
        at = 0
        for si, ci in enumerate(caps):
            l = int(lengths[ci])
            sl = slice(at, at + l)
            prefix_mask[ri, at] = True
            input_tokens[ri, at + 1 : at + l] = tokens[ci, : l - 1]
            targets[ri, sl] = tokens[ci, :l]
            segment_ids[ri, sl] = si + 1
            pos_ids[ri, sl] = np.arange(l)
            seg_feature_idx[ri, si] = feature_indices[ci]
            at += l

    return PackedBatch(
        input_tokens, prefix_mask, targets, segment_ids, pos_ids,
        seg_feature_idx,
    )


def packing_efficiency(batch: PackedBatch) -> float:
    """Fraction of slots carrying real targets (1.0 = no waste)."""
    return float((batch.targets != 0).mean())
