"""Visualisation artifacts: semantic triptychs, query grids, matched pairs,
instance overlays.

Behavioural contract (reference utils/visualiser.py:47-236 + palette
helpers utils/utils.py:200-322): PNGs written during training every
`iter_log` and during evaluation —
  - semantic triptych: input | ground truth | prediction, colourised with a
    deterministic per-category palette (HSV hues, shuffled with seed 0 —
    `distinct_colors` mirrors utils/utils.py:312-322);
  - query grid: every query's mask proposal as a tiled heat-map figure;
  - matched pairs: Hungarian-matched (ground-truth, proposal) rows;
  - instance overlay: kept instances alpha-blended over the input with
    per-instance colours + scores (the reference used detectron2 here; this
    is a self-contained matplotlib equivalent).

All figures use matplotlib's Agg backend; everything takes plain numpy.
"""
from __future__ import annotations

import colorsys
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from zutis_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def distinct_colors(n: int) -> List[Tuple[int, int, int]]:
    """n visually-distinct RGB colours (seeded shuffle of HSV hues,
    reference utils/utils.py:312-322)."""
    rng = random.Random(0)
    indices = list(range(n))
    rng.shuffle(indices)
    part = 1.0 / (n + 1)
    out = []
    for v in indices:
        r, g, b = colorsys.hsv_to_rgb(part * v, 1.0, 1.0)
        out.append((int(255 * r), int(255 * g), int(255 * b)))
    return out


def get_palette(n_categories: int) -> Dict[int, Tuple[int, int, int]]:
    """Background black + distinct colours per category."""
    colors = distinct_colors(n_categories - 1)
    palette = {0: (0, 0, 0)}
    for i, c in enumerate(colors, start=1):
        palette[i] = c
    return palette


def colourise_mask(
    mask: np.ndarray,
    palette: Dict[int, Tuple[int, int, int]],
    ignore_index: Optional[int] = None,
) -> np.ndarray:
    """[h, w] label ids -> [h, w, 3] uint8 (ignore_index drawn white,
    reference utils/visualiser.py:38-44)."""
    h, w = mask.shape
    out = np.zeros((h, w, 3), np.uint8)
    for label in np.unique(mask):
        if ignore_index is not None and label == ignore_index:
            out[mask == label] = (255, 255, 255)
        else:
            out[mask == label] = palette[int(label)]
    return out


def denormalise_image(image: np.ndarray) -> np.ndarray:
    """[3, h, w] normalised float -> [h, w, 3] uint8."""
    img = image.transpose(1, 2, 0) * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def semantic_triptych(
    image: np.ndarray,  # [3, h, w] normalised
    ground_truth: np.ndarray,  # [h, w]
    prediction: np.ndarray,  # [h, w]
    palette: Dict[int, Tuple[int, int, int]],
    fp: str,
    ignore_index: Optional[int] = None,
) -> None:
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (title, img) in zip(axes, [
        ("input", denormalise_image(image)),
        ("ground truth", colourise_mask(ground_truth, palette, ignore_index)),
        ("prediction", colourise_mask(prediction, palette, ignore_index)),
    ]):
        ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(fp, dpi=100)
    plt.close(fig)


def query_grid(
    mask_proposals: np.ndarray,  # [Q, h, w] in [0, 1]
    fp: str,
    n_cols: int = 10,
) -> None:
    """Every query's proposal heat-map tiled into one figure (reference
    utils/visualiser.py:189-208)."""
    q = mask_proposals.shape[0]
    n_rows = (q + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols,
                             figsize=(1.6 * n_cols, 1.6 * n_rows))
    axes = np.atleast_2d(axes)
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols, i % n_cols]
        ax.axis("off")
        if i < q:
            ax.imshow(mask_proposals[i], vmin=0, vmax=1, cmap="viridis")
            ax.set_title(str(i), fontsize=6)
    fig.tight_layout()
    fig.savefig(fp, dpi=80)
    plt.close(fig)


def matched_pairs(
    instance_masks: np.ndarray,  # [N, h, w] ground-truth binaries
    mask_proposals: np.ndarray,  # [Q, h, w] proposals
    assignment: Sequence[int],  # proposal index per ground-truth row
    fp: str,
) -> None:
    """Hungarian-matched (gt, proposal) rows (reference
    utils/visualiser.py:210-236)."""
    n = len(assignment)
    if n == 0:
        return
    fig, axes = plt.subplots(n, 2, figsize=(4.2, 2.1 * n), squeeze=False)
    for row, qi in enumerate(assignment):
        axes[row][0].imshow(instance_masks[row], vmin=0, vmax=1, cmap="gray")
        axes[row][0].set_title(f"gt {row}", fontsize=7)
        axes[row][1].imshow(mask_proposals[qi], vmin=0, vmax=1,
                            cmap="viridis")
        axes[row][1].set_title(f"query {qi}", fontsize=7)
        for ax in axes[row]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(fp, dpi=80)
    plt.close(fig)


def instance_overlay(
    image: np.ndarray,  # [3, h, w] normalised
    masks: np.ndarray,  # [K, H, W] bool (kept instances)
    scores: Sequence[float],
    labels: Sequence[str],
    fp: str,
    alpha: float = 0.45,
) -> None:
    """Kept instances alpha-blended with per-instance colours + score text —
    a self-contained replacement for the reference's detectron2 overlay
    (utils/visualiser.py:154-187)."""
    base = denormalise_image(image).astype(np.float32)
    H, W = base.shape[:2]
    k = masks.shape[0]
    colors = distinct_colors(max(k, 1))
    fig, ax = plt.subplots(figsize=(W / 100, H / 100), dpi=100)
    canvas = base.copy()
    for i in range(k):
        m = masks[i]
        if m.shape != (H, W):
            continue
        col = np.array(colors[i], np.float32)
        canvas[m] = (1 - alpha) * canvas[m] + alpha * col
    ax.imshow(canvas.astype(np.uint8))
    for i in range(k):
        ys, xs = np.nonzero(masks[i])
        if ys.size == 0:
            continue
        ax.text(float(xs.mean()), float(ys.mean()),
                f"{labels[i]} {scores[i]:.2f}", fontsize=7, color="white",
                bbox=dict(facecolor="black", alpha=0.5, pad=1))
    ax.axis("off")
    fig.tight_layout(pad=0)
    fig.savefig(fp, dpi=100)
    plt.close(fig)
