"""Image preprocessing: resize -> center-crop -> normalize.

Mirrors the reference's torchvision pipeline (src/model.py:556-567:
Resize(resize_dim, BICUBIC), CenterCrop(crop_dim), ToTensor, Normalize with
ImageNet stats; the `no_crop` variant resizes to (resize, resize) directly).

Host path uses PIL (bicubic, antialiased — same operator torchvision applies
to PIL inputs); a pure-jax device path (`preprocess_jax`) exists for
feeding uint8 image batches straight to the TPU and resizing there.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

__all__ = [
    "preprocess_pil",
    "preprocess_pil_uint8",
    "preprocess_batch",
    "preprocess_jax",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "CLIP_MEAN",
    "CLIP_STD",
]


def _resize_shorter(img, resize_dim: int):
    from PIL import Image

    w, h = img.size
    if w < h:
        nw, nh = resize_dim, int(resize_dim * h / w)
    else:
        nw, nh = int(resize_dim * w / h), resize_dim
    return img.resize((nw, nh), Image.BICUBIC)


def _center_crop(img, crop_dim: int):
    w, h = img.size
    left = int(round((w - crop_dim) / 2.0))
    top = int(round((h - crop_dim) / 2.0))
    return img.crop((left, top, left + crop_dim, top + crop_dim))


def preprocess_pil(
    img,
    resize_dim: int = 518,
    crop_dim: int = 518,
    *,
    crop: bool = True,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> np.ndarray:
    """PIL image -> (H, W, 3) float32 normalized array (NHWC, TPU layout)."""
    from PIL import Image

    if img.mode != "RGB":
        img = img.convert("RGB")
    if crop:
        img = _center_crop(_resize_shorter(img, resize_dim), crop_dim)
    else:
        img = img.resize((resize_dim, resize_dim), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return (x - mean) / std


def preprocess_pil_uint8(
    img,
    resize_dim: int = 518,
    crop_dim: int = 518,
    *,
    crop: bool = True,
) -> np.ndarray:
    """PIL image -> (H, W, 3) uint8 resized/cropped array, NOT normalized.

    The input-bandwidth half of the split pipeline: host does the PIL
    resize/crop, the model normalizes ON DEVICE when it receives a uint8
    batch (Patchioner.encode_images). uint8 ships 4x fewer bytes over the
    host->device link than the float32 path — the link (PCIe on a real TPU
    VM; the dev tunnel here) is the eval pipeline's bandwidth bottleneck,
    not the decode."""
    from PIL import Image

    if img.mode != "RGB":
        img = img.convert("RGB")
    if crop:
        img = _center_crop(_resize_shorter(img, resize_dim), crop_dim)
    else:
        img = img.resize((resize_dim, resize_dim), Image.BICUBIC)
    return np.asarray(img, np.uint8)


def preprocess_batch(imgs: Iterable, **kw) -> np.ndarray:
    return np.stack([preprocess_pil(im, **kw) for im in imgs])


def preprocess_jax(
    pixels,
    resize_dim: int = 518,
    crop_dim: int = 518,
    *,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
):
    """(B, H, W, 3) uint8/float on device -> normalized (B, crop, crop, 3).

    Device-side bicubic resize (antialias on downscale) + center crop —
    keeps the host out of the preprocessing loop entirely.
    """
    import jax
    import jax.numpy as jnp

    x = pixels.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    # int() truncation, NOT round: torchvision Resize (and the host
    # preprocess_pil path) truncate the long side, so rounding here would
    # shift the crop window by a pixel between the two paths
    if w < h:
        nw, nh = resize_dim, int(resize_dim * h / w)
    else:
        nw, nh = int(resize_dim * w / h), resize_dim
    x = jax.image.resize(x, (b, nh, nw, c), method="bicubic", antialias=True)
    top = int(round((nh - crop_dim) / 2.0))
    left = int(round((nw - crop_dim) / 2.0))
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, crop_dim, crop_dim, c)
    )
    return (x - jnp.asarray(mean)) / jnp.asarray(std)
