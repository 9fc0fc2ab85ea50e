"""Host-side training augmentations (numpy/PIL/cv2; no torch).

Behavioural contracts:
  random_scale  — uniform scale in `scale_range`, bilinear image / nearest
      mask resize (reference geometric_transforms.py:174-193).
  random_crop   — pad up to the crop size with per-image mean fill (masks use
      ignore_index), padding placed in a random corner quadrant, then a random
      offset crop; the same padding/offset is reused for the masks
      (geometric_transforms.py:10-54, base_dataset.py:36-53).
  random_hflip  — note the reference flips when random() > p, i.e. with
      probability 1 - p (p=0.5 makes it equivalent); reproduced faithfully.
  photometric   — ColorJitter(0.8, 0.8, 0.8, 0.2) applied with p=0.8 in a
      random op order (torchvision semantics), grayscale p=0.2, SimCLR
      Gaussian blur with kernel ~10% of min side and sigma U(0.1, 2), p=0.5
      (base_dataset.py:61-78, gaussian_blur.py:7-24).

All randomness flows through an explicit np.random.Generator so a sample is
reproducible from (seed, index) — required for deterministic data-pipeline
resume (SURVEY.md section 5).
"""
from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np
from PIL import Image, ImageEnhance

cv2.setNumThreads(1)


def random_scale(
    rng: np.random.Generator,
    image: Image.Image,
    scale_range: Tuple[float, float],
    mask: Optional[np.ndarray] = None,
):
    scale = rng.uniform(*scale_range)
    w, h = image.size
    w_rs, h_rs = int(w * scale), int(h * scale)
    image = image.resize((max(w_rs, 1), max(h_rs, 1)), Image.BILINEAR)
    if mask is not None:
        mask = np.array(
            Image.fromarray(mask.astype(np.int32), mode="I").resize(
                (max(w_rs, 1), max(h_rs, 1)), Image.NEAREST
            )
        )
    return image, mask


def random_crop(
    rng: np.random.Generator,
    image: Image.Image,
    crop_size: int,
    mask: Optional[np.ndarray] = None,
    ignore_index: int = 255,
):
    w, h = image.size
    pad_h = max(crop_size - h, 0)
    pad_w = max(crop_size - w, 0)
    # padding goes entirely into one corner quadrant. The reference's
    # elif chain RE-DRAWS random() per comparison (geometric_transforms.py
    # :35-42), so the corners are NOT uniform: P = 0.25 / 0.1875 / 0.1406 /
    # 0.4219 for (left+top / left+bottom / top+right / right+bottom).
    # Reproduced faithfully (this file keeps reference quirks, cf. hflip).
    if rng.random() < 0.25:
        pl, pt = pad_w, pad_h
    elif 0.25 <= rng.random() < 0.5:
        pl, pt = pad_w, 0
    elif 0.5 <= rng.random() < 0.75:
        pl, pt = 0, pad_h
    else:
        pl, pt = 0, 0
    pr, pb = pad_w - pl, pad_h - pt

    arr = np.array(image)
    fill = arr.mean(axis=(0, 1)).astype(np.uint8)
    arr = np.pad(
        arr, ((pt, pb), (pl, pr), (0, 0)), constant_values=0
    )
    if pad_h or pad_w:
        padded_region = np.ones(arr.shape[:2], bool)
        padded_region[pt:pt + h, pl:pl + w] = False
        arr[padded_region] = fill
    H, W = arr.shape[:2]
    oy = int(rng.integers(0, H - crop_size + 1))
    ox = int(rng.integers(0, W - crop_size + 1))
    arr = arr[oy:oy + crop_size, ox:ox + crop_size]

    if mask is not None:
        m = np.pad(
            mask, ((pt, pb), (pl, pr)), constant_values=ignore_index
        )
        mask = m[oy:oy + crop_size, ox:ox + crop_size]
    return Image.fromarray(arr), mask


def random_hflip(
    rng: np.random.Generator,
    image: Image.Image,
    p: float,
    mask: Optional[np.ndarray] = None,
):
    # reference quirk: flips when random() > p (probability 1 - p)
    if rng.random() > p:
        image = image.transpose(Image.FLIP_LEFT_RIGHT)
        if mask is not None:
            mask = mask[:, ::-1].copy()
    return image, mask


def _adjust_hue(image: Image.Image, factor: float) -> Image.Image:
    if factor == 0:
        return image
    hsv = np.array(image.convert("HSV"))
    hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                   + int(factor * 255)) % 256
    return Image.fromarray(hsv, "HSV").convert("RGB")


def color_jitter(
    rng: np.random.Generator,
    image: Image.Image,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.8,
    hue: float = 0.2,
) -> Image.Image:
    ops = []
    b = rng.uniform(max(0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0, 1 - saturation), 1 + saturation)
    h = rng.uniform(-hue, hue)
    ops = [
        lambda im: ImageEnhance.Brightness(im).enhance(b),
        lambda im: ImageEnhance.Contrast(im).enhance(c),
        lambda im: ImageEnhance.Color(im).enhance(s),
        lambda im: _adjust_hue(im, h),
    ]
    for i in rng.permutation(4):
        image = ops[i](image)
    return image


def gaussian_blur(
    rng: np.random.Generator,
    image: Image.Image,
    p: float = 0.5,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
) -> Image.Image:
    if rng.random() >= p:
        return image
    w, h = image.size
    k = int((0.1 * min(w, h)) // 2 * 2 + 1)
    sigma = rng.uniform(*sigma_range)
    arr = cv2.GaussianBlur(np.array(image), (k, k), sigma)
    return Image.fromarray(arr)


def photometric_augmentations(
    rng: np.random.Generator,
    image: Image.Image,
    jitter_p: float = 0.8,
    grayscale_p: float = 0.2,
    blur: bool = True,
) -> Image.Image:
    if rng.random() < jitter_p:
        image = color_jitter(rng, image)
    if rng.random() < grayscale_p:
        image = image.convert("L").convert("RGB")
    if blur:
        image = gaussian_blur(rng, image)
    return image


def mask_to_bbox(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """(ymin, ymax, xmin, xmax) of nonzero pixels, or (-1,)*4 when empty
    (reference copy_paste.py:6-13)."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return -1, -1, -1, -1
    return int(ys.min()), int(ys.max()), int(xs.min()), int(xs.max())


def copy_paste(
    rng: np.random.Generator,
    images,  # list of [3, H, W] float arrays
    semantic_masks,  # list of [H, W] int arrays
    instance_masks,  # list of [H, W] int arrays
    background_index: int = 0,
    ignore_index: int = 255,
):
    """Sequentially paste objects 1..n onto canvas 0 at random offsets
    (reference copy_paste.py:16-57); the pasted region is the tight bbox of
    the object's mask, masked to object pixels."""
    out_img = images[0].copy()
    out_sem = semantic_masks[0].copy()
    out_inst = instance_masks[0].copy()
    H, W = out_sem.shape
    for img, sem, inst in zip(images[1:], semantic_masks[1:],
                              instance_masks[1:]):
        binary = (sem > background_index) & (sem < ignore_index)
        ymin, ymax, xmin, xmax = mask_to_bbox(binary)
        if ymin == -1:
            continue
        bh, bw = ymax - ymin, xmax - xmin
        region = binary[ymin:ymax, xmin:xmax]
        oy = int(rng.integers(0, H - bh + 1))
        ox = int(rng.integers(0, W - bw + 1))
        dst_img = out_img[:, oy:oy + bh, ox:ox + bw]
        dst_img[:, region] = img[:, ymin:ymax, xmin:xmax][:, region]
        out_sem[oy:oy + bh, ox:ox + bw][region] = \
            sem[ymin:ymax, xmin:xmax][region]
        out_inst[oy:oy + bh, ox:ox + bw][region] = \
            inst[ymin:ymax, xmin:xmax][region]
    return out_img, out_sem, out_inst
