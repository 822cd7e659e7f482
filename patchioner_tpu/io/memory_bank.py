"""Support-memory bank IO: HDF5 load/save, filename scheme, bank building.

Format-compatible with the reference's Im2TxtProjector banks
(src/decap/im2txtprojection/im2txtprojection.py): an HDF5 file with datasets
`{dataset}-embeddings` (float32 (M, D)) and `{dataset}-text` (utf-8 strings),
named by the same configuration-keyed filename scheme
(`_build_filename_components` :83-175, path :320-323) so existing bank files
drop in unchanged. DINO.txt banks slice columns [1024:] at load
(:405-406 — patch-aligned text embeddings).

Bank *building* (`build_bank`) encodes a caption corpus with a caller-supplied
text-encoder function (CLIP text tower + optional Talk2DINO projection on
TPU), replacing the reference's torch encode loop (:448-560).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = [
    "MemoryBank",
    "bank_filename",
    "load_bank",
    "save_bank",
    "build_bank",
    "load_caption_corpus",
    "PROJECTION_DATASETS",
]

# ProjectionType enum values (reference :18-24) -> dataset names.
PROJECTION_DATASETS = {
    "coco": "coco_captions",
    "coco_captions": "coco_captions",
    "msmarco": "ms_marco_queries_a",
    "ms_marco_queries_a": "ms_marco_queries_a",
    "blip": "cc3m_blip_captions",
    "cc3m_blip_captions": "cc3m_blip_captions",
    "vg": "vg_captions",
    "vg_captions": "vg_captions",
    "vg-test": "vg_dense_captions_test",
    "vg_dense_captions_test": "vg_dense_captions_test",
    "online_texts": "online_texts",
}


@dataclasses.dataclass
class MemoryBank:
    embeddings: np.ndarray  # (M, D) float32
    texts: list  # list[str], len M

    def __len__(self):
        return len(self.embeddings)


def _dataset_name(projection_type: str) -> str:
    if projection_type in PROJECTION_DATASETS:
        return PROJECTION_DATASETS[projection_type]
    if os.path.exists(str(projection_type)):
        base = os.path.basename(str(projection_type)).lower()
        for frag, name in (
            ("karpathy", "coco_captions"),
            ("coco", "coco_captions"),
            ("vg", "vg_captions"),
            ("marco", "ms_marco_queries_a"),
        ):
            if frag in base:
                return name
        return "coco_captions"
    return str(projection_type)


def bank_filename(
    projection_type: str,
    clip_modelname: Optional[str] = None,
    support_memory_size: int = 500000,
    *,
    use_talk2dino: bool = True,
    linear_talk2dino: bool = False,
    talk2dino_attn_type: str = "qkv",
    use_open_clip: bool = False,
) -> tuple[str, str]:
    """Reproduce the reference filename scheme. Returns (filename, dataset).

    `clip_modelname=None` resolves like the reference
    (im2txtprojection.py:284-295): 'ViT-B/16' under talk2dino, else
    'ViT-B/32' — a fixed 'ViT-B/32' default would name talk2dino banks
    '...-ViT-B.32-...' where the reference's drop-in files say
    '...-ViT-B.16-...'."""
    if clip_modelname is None:
        clip_modelname = "ViT-B/16" if use_talk2dino else "ViT-B/32"
    if use_talk2dino:
        prefix = ""
        postfix = "-B16" if use_talk2dino is True else str(use_talk2dino)
        if linear_talk2dino:
            postfix += "-linear"
    else:
        prefix = "clip-"
        postfix = ""
    if use_open_clip:
        postfix += "-open_clip"
    attn = f"_{talk2dino_attn_type}" if talk2dino_attn_type != "qkv" else ""
    dataset = _dataset_name(projection_type)
    filename = (
        prefix
        + f"{dataset}_text_embeddings{attn}{postfix}-"
        + f'{clip_modelname.replace("/", ".")}-{support_memory_size}.h5'
    )
    return filename, dataset


def load_bank(
    path: str, dataset: Optional[str] = None, *, dinotxt_slice: bool = False
) -> Optional[MemoryBank]:
    """Load `{dataset}-embeddings` / `{dataset}-text` from an HDF5 bank.

    `dataset=None` auto-detects the file's `*-embeddings` key, so a bank
    built for any corpus (vg_captions, ms_marco_queries_a, ...) loads
    without the caller hard-coding 'coco_captions'.

    Returns None ONLY for a missing file. A file that exists but lacks the
    requested (or any) bank keys raises KeyError naming what it does
    contain — returning None there let the caller silently substitute a
    random-init bank for a mis-keyed drop-in file."""
    import h5py

    if not os.path.exists(path):
        return None
    with h5py.File(path, "r") as hf:
        if dataset is None:
            cands = sorted(
                k[: -len("-embeddings")] for k in hf.keys()
                if k.endswith("-embeddings") and f"{k[: -len('-embeddings')]}-text" in hf
            )
            if not cands:
                raise KeyError(
                    f"{path!r} exists but contains no "
                    f"'<dataset>-embeddings'/'<dataset>-text' pair "
                    f"(keys: {sorted(hf.keys())}) — not a memory bank file"
                )
            dataset = cands[0]
        ek, tk = f"{dataset}-embeddings", f"{dataset}-text"
        if ek not in hf or tk not in hf:
            raise KeyError(
                f"{path!r} has no {ek!r}/{tk!r} datasets "
                f"(keys: {sorted(hf.keys())}); pass the matching dataset "
                f"name or dataset=None to auto-detect"
            )
        emb = hf[ek][:]
        texts = [
            t.decode() if isinstance(t, bytes) else str(t) for t in hf[tk][:]
        ]
    if dinotxt_slice:
        emb = emb[:, 1024:]
    emb = np.asarray(emb, np.float32)
    # The reference filters zero-norm rows AT LOAD TIME
    # (im2txtprojection.py:345: embs_dataset[norm != 0]) — its own bank
    # builder pre-allocates SUPPORT_MEMORY_SIZE rows and fills only
    # len(corpus), so a reference-built file can carry an all-zero tail
    # that would 0/0-NaN the projection softmax. Texts are filtered in
    # lockstep (the reference's text list silently desyncs here — its
    # argmax-text mode indexes the UNfiltered list; we keep alignment,
    # the documented deviation in COMPONENTS.md).
    keep = np.linalg.norm(emb, axis=-1) != 0
    if not keep.all():
        emb = emb[keep]
        texts = [t for t, k in zip(texts, keep) if k]
    return MemoryBank(emb, texts)


def save_bank(path: str, dataset: str, bank: MemoryBank) -> None:
    import h5py

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as hf:
        hf.create_dataset(
            f"{dataset}-embeddings", data=bank.embeddings.astype(np.float32)
        )
        hf.create_dataset(
            f"{dataset}-text",
            data=[t.encode("utf-8") for t in bank.texts],
            dtype=h5py.string_dtype(encoding="utf-8"),
        )


def load_caption_corpus(
    annotations_path: str,
    size: int,
    *,
    sample: bool = True,
    seed: Optional[int] = None,
) -> list:
    """COCO-format annotation JSON -> caption list (pycocotools-free).

    The reference random.sample()s COCO annotations (:456); pass `seed` for a
    reproducible draw or sample=False for the deterministic head slice used by
    the VG corpora (:462,469).
    """
    with open(annotations_path) as f:
        data = json.load(f)
    anns = data["annotations"] if isinstance(data, dict) else data
    captions = [a["caption"] for a in anns]
    if size >= len(captions):
        return captions
    if sample:
        import random

        rng = random.Random(seed)
        return rng.sample(captions, k=size)
    return captions[:size]


def build_bank(
    texts: Sequence[str],
    encode_fn: Callable[[Sequence[str]], np.ndarray],
    *,
    batch_size: int = 1000,
) -> MemoryBank:
    """Encode a caption corpus into a bank with a caller-supplied text encoder
    (e.g. CLIP text tower -> Talk2DINO projection, jitted on TPU)."""
    chunks = []
    for i in range(0, len(texts), batch_size):
        chunks.append(np.asarray(encode_fn(list(texts[i : i + batch_size]))))
    emb = np.concatenate(chunks, axis=0).astype(np.float32)
    assert len(emb) == len(texts)
    return MemoryBank(emb, list(texts))
