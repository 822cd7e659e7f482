"""CLIP byte-pair-encoding tokenizer (host-side, own implementation).

DeCap decodes with CLIP's 49,408-token BPE vocabulary
(reference: src/decap/decap.py:82, src/clip/simple_tokenizer.py — the standard
OpenAI CLIP tokenizer). This is an independent implementation of that public
algorithm against the same public vocab data (vendored at
patchioner_tpu/data/bpe_simple_vocab_16e6.txt.gz).

Decoding semantics required for caption parity (src/decap/decap.py:162-179):
join token strings, map the byte-unicode alphabet back to utf-8, turn '</w>'
into spaces, then the *caller* splits at '<|endoftext|>' and strips
'<|startoftext|>'.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Iterable, List, Sequence

try:  # full unicode word classes when the `regex` module is present
    import regex as _re

    _HAS_REGEX = True
except ImportError:  # pragma: no cover
    _re = re
    _HAS_REGEX = False

__all__ = ["ClipTokenizer", "get_tokenizer", "SOT_TOKEN", "EOT_TOKEN", "VOCAB_SIZE"]

DEFAULT_BPE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "bpe_simple_vocab_16e6.txt.gz"
)
SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"
SOT_TOKEN = 49406
EOT_TOKEN = 49407
VOCAB_SIZE = 49408

if _HAS_REGEX:
    _WORD_PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _re.IGNORECASE,
    )
else:  # ASCII approximation (captions are English — identical on that set)
    _WORD_PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )


@functools.lru_cache()
def _byte_unicode_table() -> dict:
    """The GPT-2/CLIP reversible byte <-> printable-unicode mapping."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    chars = keep[:]
    extra = 0
    for b in range(256):
        if b not in keep:
            keep.append(b)
            chars.append(256 + extra)
            extra += 1
    return dict(zip(keep, (chr(c) for c in chars)))


try:
    from ftfy import fix_text as _fix_text
except ImportError:  # ftfy not in this image — NFC covers the
    # decomposed-accent slice of what fix_text repairs (full mojibake
    # repair needs ftfy proper; documented variant)
    import unicodedata

    def _fix_text(text: str) -> str:
        return unicodedata.normalize("NFC", text)


def _clean_text(text: str) -> str:
    """CLIP's basic_clean + whitespace_clean: the reference runs
    ftfy.fix_text BEFORE the double html.unescape (simple_tokenizer.py);
    resolved once at import (hot path — corpus tokenization)."""
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.strip().lower()


class ClipTokenizer:
    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self._b2u = _byte_unicode_table()
        self._u2b = {u: b for b, u in self._b2u.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")
        # Same slice of the public merge list the CLIP vocab is defined by:
        # entries 1 .. 49152-256-2 (the remainder of the file is unused).
        merge_lines = merge_lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]
        alphabet = list(self._b2u.values())
        tokens: List[str] = alphabet + [c + "</w>" for c in alphabet]
        tokens.extend("".join(pair) for pair in merges)
        tokens.extend([SOT_TEXT, EOT_TEXT])
        self._token_to_id = {tok: i for i, tok in enumerate(tokens)}
        self._id_to_token = {i: tok for tok, i in self._token_to_id.items()}
        self._merge_rank = {pair: i for i, pair in enumerate(merges)}
        self._bpe_cache = {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT}

    # ------------------------------------------------------------- encode

    def _bpe(self, word: str) -> str:
        cached = self._bpe_cache.get(word)
        if cached is not None:
            return cached
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = set(zip(parts[:-1], parts[1:]))
            best = min(pairs, key=lambda p: self._merge_rank.get(p, 1 << 30))
            if best not in self._merge_rank:
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
        out = " ".join(parts)
        self._bpe_cache[word] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in _WORD_PAT.findall(_clean_text(text)):
            chunk = "".join(self._b2u[b] for b in chunk.encode("utf-8"))
            ids.extend(self._token_to_id[t] for t in self._bpe(chunk).split(" "))
        return ids

    def tokenize(
        self, texts: Sequence[str], context_length: int = 77, truncate: bool = True
    ):
        """CLIP-style fixed-length batch tokenization: [SOT] ids [EOT] pad-0."""
        import numpy as np

        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [SOT_TOKEN] + self.encode(text) + [EOT_TOKEN]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"text too long: {text!r}")
                ids = ids[:context_length]
                ids[-1] = EOT_TOKEN
            out[i, : len(ids)] = ids
        return out

    # ------------------------------------------------------------- decode

    def decode(self, ids: Iterable[int]) -> str:
        # Join the token strings FIRST, then map back through the byte table
        # and utf-8-decode the whole stream — multi-byte characters can span
        # token boundaries. Special tokens are ASCII and survive the round
        # trip as literal '<|startoftext|>' / '<|endoftext|>' text.
        text = "".join(self._id_to_token.get(int(i), "") for i in ids)
        raw = bytearray(self._u2b[ch] for ch in text if ch in self._u2b)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def decode_caption(self, ids: Iterable[int]) -> str:
        """Reference postprocessing (src/decap/decap.py:170-179 +
        eval_trace_captioning.py:466): cut at EOT, drop SOT, strip ' .'."""
        text = self.decode(ids)
        text = text.split(EOT_TEXT)[0].replace(SOT_TEXT, "")
        return text


# below this corpus size, spawn-mode pool startup costs more than it saves
_SPAWN_MIN_TEXTS = 50_000


def _tokenize_chunk(args):
    texts, context_length, bpe_path = args
    return get_tokenizer(bpe_path).tokenize(texts, context_length)


def _fork_safe() -> bool:
    """fork() in a multithreaded process can deadlock the children on
    inherited locks — in this tree the usual culprit is an initialized JAX
    backend (device client threads). Only fork when the process is still
    single-threaded and no backend exists; otherwise spawn (each worker
    re-imports and rebuilds the tokenizer, slower to start but safe)."""
    import threading

    if threading.active_count() > 1:
        return False
    try:
        from jax._src import xla_bridge

        if getattr(xla_bridge, "_backends", None):
            return False
    except Exception:
        pass
    return True


def tokenize_parallel(
    texts: Sequence[str],
    context_length: int = 77,
    *,
    workers: int = 0,
    chunk: int = 4096,
    bpe_path: str = DEFAULT_BPE_PATH,
):
    """Corpus-scale batch tokenization over a process pool.

    BPE encoding is pure Python and GIL-bound (~9k captions/s on one
    core), and the production corpora are large — a flagship bank build
    encodes 592k captions (im2txtprojection.py:456) and decoder training
    tokenizes the 566k-caption COCO train split — so host tokenization is
    a real phase of those workflows. Workers fork when that is provably
    safe (single-threaded process, no initialized JAX backend — children
    then inherit the already-built tokenizer copy-on-write) and spawn
    otherwise; output is bitwise-identical to `tokenize` (chunks partition
    the input in order). workers=0 picks cpu_count-1; workers<=1 or a
    small input runs in-process."""
    import numpy as np

    if workers == 0:
        workers = max(1, (os.cpu_count() or 2) - 1)
    if workers <= 1 or len(texts) <= chunk:
        return get_tokenizer(bpe_path).tokenize(texts, context_length)
    get_tokenizer(bpe_path)  # build BEFORE forking so children inherit it
    import multiprocessing as mp

    method = ("fork" if "fork" in mp.get_all_start_methods() and _fork_safe()
              else "spawn")
    if method == "spawn" and len(texts) < _SPAWN_MIN_TEXTS:
        # spawn workers re-import + rebuild the vocab (~seconds each);
        # below ~50k captions that startup beats the parallel win
        return get_tokenizer(bpe_path).tokenize(texts, context_length)
    # build the per-chunk copies only once a pooled run is certain (the
    # spawn bailout above would otherwise discard a full corpus copy)
    jobs = [
        (list(texts[i : i + chunk]), context_length, bpe_path)
        for i in range(0, len(texts), chunk)
    ]
    ctx = mp.get_context(method)
    with ctx.Pool(min(workers, len(jobs))) as pool:
        parts = pool.map(_tokenize_chunk, jobs)
    return np.concatenate(parts, axis=0)


@functools.lru_cache()
def get_tokenizer(bpe_path: str = DEFAULT_BPE_PATH) -> ClipTokenizer:
    return ClipTokenizer(bpe_path)
