"""Host-side image transforms (numpy/PIL).

Mirrors the reference's torchvision-based preprocessing:
  to_tensor + ImageNet-mean/std normalisation (datasets/coco2017.py:27,138),
  shorter/longer/both-edge resize semantics
  (datasets/augmentations/geometric_transforms.py:85-171)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_PIL_MODES = {
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
    "bicubic": Image.BICUBIC,
    "lanczos": Image.LANCZOS,
}


def normalize_image(img: Union[Image.Image, np.ndarray]) -> np.ndarray:
    """PIL/uint8 HWC -> normalised float32 CHW."""
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def resize_edge(
    img: Image.Image,
    size: Union[int, Sequence[int]],
    edge: str = "shorter",
    interpolation: str = "bilinear",
) -> Image.Image:
    """Resize by shorter/longer edge preserving aspect ratio, or to an exact
    (h, w) when `edge`="both" (reference geometric_transforms.py:85-171)."""
    w, h = img.size
    mode = _PIL_MODES[interpolation]
    if edge == "both":
        th, tw = size if not isinstance(size, int) else (size, size)
        return img.resize((int(tw), int(th)), mode)
    assert isinstance(size, int)
    if edge == "shorter":
        scale = size / min(h, w)
    elif edge == "longer":
        scale = size / max(h, w)
    else:
        raise ValueError(edge)
    return img.resize((round(w * scale), round(h * scale)), mode)


def pad_to_multiple(
    arr: np.ndarray, multiple: int, fill: float = 0.0
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad the trailing H, W axes up to a multiple; returns (padded, (H, W))."""
    h, w = arr.shape[-2:]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return arr, (h, w)
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, ph), (0, pw)]
    return np.pad(arr, pad, constant_values=fill), (h, w)
