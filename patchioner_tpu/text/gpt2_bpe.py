"""GPT-2 byte-level BPE tokenizer — complete offline implementation.

The reference tokenizes ViECap/MeaCap/ClipCap text with transformers' GPT-2
tokenizer (src/viecap/entrypoint.py:96-100 area), which downloads
vocab.json + merges.txt from the Hub. Those two files are *learned data*
(50,257 tokens) that cannot be reconstructed and are not present anywhere in
this zero-egress image, so they cannot be vendored the way the CLIP BPE
vocab was (that one ships inside the reference tree). What CAN be complete
offline is the algorithm: this module implements GPT-2's full byte-level
BPE — byte->unicode table, the GPT-2 pre-tokenization regex, lowest-rank
merge loop, byte-join decode — and loads the vocab pair from any of:

  1. explicit paths (`Gpt2Tokenizer.from_files`),
  2. `$GPT2_BPE_DIR` (vocab.json + merges.txt, or encoder.json + vocab.bpe),
  3. the standard HF cache (`~/.cache/huggingface/hub/models--gpt2/...`).

Algorithm parity is pinned against the `tokenizers` library on synthetic
vocabularies (tests/test_gpt2_bpe.py), so dropping the real files into any
of the locations above yields exact GPT-2 tokenization with no code change.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, List, Optional, Sequence

try:  # full unicode classes (transformers always ships `regex`)
    import regex as _re

    _WORD_PAT = _re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
        r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )
except ImportError:  # pragma: no cover - regex is a baked-in dependency
    import re as _re

    _WORD_PAT = _re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+|"""
        r""" ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"""
    )

__all__ = ["Gpt2Tokenizer", "load_gpt2_tokenizer", "ENDOFTEXT"]

ENDOFTEXT = "<|endoftext|>"


# OpenAI's bytes_to_unicode is byte-identical between GPT-2 and CLIP —
# one definition lives in clip_bpe so the two can never drift
from patchioner_tpu.text.clip_bpe import _byte_unicode_table


class Gpt2Tokenizer:
    """encode/decode with the GPT-2 byte-level BPE given vocab + merges."""

    pad_token_id = None

    def __init__(self, vocab: dict, merges: Sequence[tuple]):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        self._ranks = {tuple(m): i for i, m in enumerate(merges)}
        self._b2u = _byte_unicode_table()
        self._u2b = {u: b for b, u in self._b2u.items()}
        self._cache: dict = {}
        self.eos_token_id = self.encoder.get(ENDOFTEXT)
        self.vocab_size = len(self.encoder)

    # ------------------------------------------------------------- files

    @classmethod
    def from_files(cls, vocab_path: str, merges_path: str) -> "Gpt2Tokenizer":
        with open(vocab_path, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [
            tuple(line.split())
            for line in lines
            if line and not line.startswith("#version") and len(line.split()) == 2
        ]
        return cls(vocab, merges)

    # ------------------------------------------------------------- encode

    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            pairs = set(zip(parts[:-1], parts[1:]))
            best = min(pairs, key=lambda p: self._ranks.get(p, 1 << 30))
            if best not in self._ranks:
                break
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == best[0]
                    and parts[i + 1] == best[1]
                ):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[token] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in _WORD_PAT.findall(text):
            mapped = "".join(self._b2u[b] for b in chunk.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        data = bytes(self._u2b[c] for c in text if c in self._u2b)
        return data.decode("utf-8", errors="replace")

    def __call__(self, text: str):
        return {"input_ids": self.encode(text)}


def _hf_cache_candidates() -> List[str]:
    home = os.path.expanduser("~")
    roots = [
        os.environ.get("HF_HOME", os.path.join(home, ".cache", "huggingface")),
        os.path.join(home, ".cache", "huggingface"),
    ]
    dirs = []
    for root in roots:
        # both cache layouts: the legacy repo id 'gpt2' and the canonical
        # post-rename 'openai-community/gpt2'
        for repo in ("models--gpt2", "models--openai-community--gpt2"):
            dirs.extend(
                glob.glob(os.path.join(root, "hub", repo, "snapshots", "*"))
            )
    return dirs


def load_gpt2_tokenizer(directory: Optional[str] = None) -> Optional[Gpt2Tokenizer]:
    """Find vocab.json+merges.txt (HF names) or encoder.json+vocab.bpe
    (OpenAI names) in `directory`, `$GPT2_BPE_DIR`, or the HF cache.
    Returns None when no vocab files exist anywhere."""
    search = []
    if directory:
        search.append(directory)
    if os.environ.get("GPT2_BPE_DIR"):
        search.append(os.environ["GPT2_BPE_DIR"])
    search.extend(_hf_cache_candidates())
    for d in search:
        for vocab_name, merges_name in (
            ("vocab.json", "merges.txt"),
            ("encoder.json", "vocab.bpe"),
        ):
            v = os.path.join(d, vocab_name)
            m = os.path.join(d, merges_name)
            if os.path.exists(v) and os.path.exists(m):
                return Gpt2Tokenizer.from_files(v, m)
    return None
