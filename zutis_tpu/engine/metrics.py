"""Segmentation metrics.

RunningScore mirrors the reference confusion-matrix scorer
(reference utils/running_score.py:5-49): pixel accuracy, per-class accuracy,
mIoU, frequency-weighted IoU from an [n_classes, n_classes] histogram of
(gt, pred) pairs, ignoring labels outside [0, n_classes). The histogram
update runs on device as a bincount (scatter-add on TPU); host accumulation
keeps a single small [C, C] array.

AverageMeter mirrors utils/average_meter.py.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_classes",))
def confusion_update(
    gt: jnp.ndarray,  # [...] int
    pred: jnp.ndarray,  # [...] int
    n_classes: int,
) -> jnp.ndarray:
    """-> [n_classes, n_classes] histogram; rows = gt, cols = pred."""
    gt = gt.reshape(-1)
    pred = pred.reshape(-1)
    valid = (gt >= 0) & (gt < n_classes)
    idx = jnp.where(valid, gt * n_classes + pred, 0)
    counts = jnp.bincount(
        idx, weights=valid.astype(jnp.float32), length=n_classes * n_classes
    )
    return counts.reshape(n_classes, n_classes)


class RunningScore:
    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.confusion_matrix = np.zeros((n_classes, n_classes), np.float64)

    def update(self, label_trues, label_preds) -> None:
        self.confusion_matrix += np.asarray(
            confusion_update(
                jnp.asarray(np.asarray(label_trues)),
                jnp.asarray(np.asarray(label_preds)),
                self.n_classes,
            )
        )

    def reset(self) -> None:
        self.confusion_matrix[:] = 0

    def get_scores(self) -> Tuple[Dict[str, float], Dict[int, float]]:
        hist = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.diag(hist) / hist.sum(axis=1)
            acc_cls = np.nanmean(acc_cls)
            iu = np.diag(hist) / (
                hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist)
            )
            mean_iu = np.nanmean(iu)
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        cls_iu = dict(zip(range(self.n_classes), iu))
        return (
            {
                "Pixel Acc": acc,
                "Mean Acc": acc_cls,
                "FreqW Acc": fwavacc,
                "Mean IoU": mean_iu,
            },
            cls_iu,
        )


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def compute_iou(
    pred_mask: np.ndarray,
    gt_mask: np.ndarray,
    threshold: Optional[float] = 0.5,
) -> float:
    """Binary IoU with optional thresholding (reference utils/iou.py:6-37)."""
    if threshold is not None:
        pred_mask = pred_mask > threshold
    pred_mask = pred_mask.astype(bool)
    gt_mask = gt_mask.astype(bool)
    inter = np.logical_and(pred_mask, gt_mask).sum()
    union = np.logical_or(pred_mask, gt_mask).sum()
    return float(inter / union) if union > 0 else 0.0
