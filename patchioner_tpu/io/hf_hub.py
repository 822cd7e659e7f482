"""HuggingFace Hub fallback resolution (reference: src/hf_utils.py:18-122).

Resolve any checkpoint/config/memory-bank path locally first; when absent,
download from a HF repo (network permitting — zero-egress environments get a
clear error instead of a hang).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["get_model_path_with_hf_fallback", "load_model_with_hf_fallback"]


def get_model_path_with_hf_fallback(
    local_path: Optional[str],
    hf_repo_id: Optional[str] = None,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """Local path if it exists, else `hf_hub_download(repo, filename)`
    (reference semantics: local -> hub -> raise)."""
    if local_path and os.path.exists(local_path):
        return local_path
    if hf_repo_id is None:
        raise FileNotFoundError(
            f"'{local_path}' not found locally and no hf_repo_id given"
        )
    filename = filename or (os.path.basename(local_path) if local_path else None)
    if filename is None:
        raise ValueError("need a filename for the HF Hub fallback")
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise FileNotFoundError(
            f"'{local_path}' missing and huggingface_hub unavailable"
        ) from e
    try:
        return hf_hub_download(
            repo_id=hf_repo_id, filename=filename, cache_dir=cache_dir
        )
    except Exception as e:
        raise FileNotFoundError(
            f"'{local_path}' not found locally and the HF Hub download of "
            f"{hf_repo_id}/{filename} failed ({type(e).__name__}: {e}) — "
            "zero-egress environment?"
        ) from e


def load_model_with_hf_fallback(
    local_path: Optional[str],
    hf_repo_id: Optional[str] = None,
    filename: Optional[str] = None,
    map_location: str = "cpu",
):
    """torch.load through the same local->hub resolution
    (reference: src/hf_utils.py:85-122)."""
    import torch

    path = get_model_path_with_hf_fallback(local_path, hf_repo_id, filename)
    return torch.load(path, map_location=map_location)
