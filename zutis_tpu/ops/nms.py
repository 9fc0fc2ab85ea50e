"""Device-side per-category greedy mask NMS.

Behavioural contract (reference networks/zutis.py:211-299): per category
(background id 0 excluded), repeatedly select the highest-scoring remaining
mask and discard candidates whose IoU with it exceeds `nms_threshold`; a
candidate also drops out when its (possibly down-weighted) score falls to or
below `score_floor` (0.001). Empty masks are dropped. With hard NMS the
procedure is exactly classic greedy NMS in descending score order, which is
what we run — but on device: pairwise IoU is one [Q, HW] x [HW, Q] matmul on
the MXU, and the sequential suppression scan is a fori_loop over the 100
score-sorted proposals (SURVEY.md section 7 hard part 4).

Soft-NMS variants ("linear", "gaussian", zutis.py:262-266) rescale scores of
overlapping candidates instead; they are implemented in the same scan. Note:
the reference re-sorts candidates after every re-weighting round; the scan
processes in the original score order, which can differ for soft NMS when
re-weighting reorders candidates. Hard NMS (the default used by every eval
path in the reference) is exact.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nms_type",))
def mask_nms(
    masks: jnp.ndarray,  # [Q, H, W] bool/0-1
    scores: jnp.ndarray,  # [Q] float
    category_ids: jnp.ndarray,  # [Q] int
    nms_threshold: float = 0.3,
    score_floor: float = 0.001,
    sigma: float = 0.5,
    nms_type: str = "hard",
):
    """Returns (keep [Q] bool, out_scores [Q] float). Masks with category 0,
    empty masks, and scores <= score_floor are never kept."""
    q = masks.shape[0]
    flat = masks.reshape(q, -1).astype(jnp.float32)
    areas = flat.sum(-1)
    inter = jnp.einsum("qc,pc->qp", flat, flat,
                       preferred_element_type=jnp.float32)
    union = areas[:, None] + areas[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    same_cat = category_ids[:, None] == category_ids[None, :]

    order = jnp.argsort(-scores)  # descending
    iou_s = iou[order][:, order]
    cat_s = same_cat[order][:, order]
    scores_s = scores[order]
    eligible = (
        (category_ids[order] != 0)
        & (areas[order] > 0)
    )

    def body(i, state):
        keep, cur_scores = state
        s_i = cur_scores[i]
        ok = eligible[i] & (s_i > score_floor)
        keep = keep.at[i].set(ok)
        if nms_type == "hard":
            # zero the scores of same-category candidates it suppresses
            suppress = keep[i] & cat_s[i] & (iou_s[i] > nms_threshold)
            cur_scores = jnp.where(
                suppress & (jnp.arange(q) > i), 0.0, cur_scores
            )
        elif nms_type == "linear":
            w = jnp.where(iou_s[i] > nms_threshold, 1.0 - iou_s[i], 1.0)
            w = jnp.where(keep[i] & cat_s[i] & (jnp.arange(q) > i), w, 1.0)
            cur_scores = cur_scores * w
        else:  # gaussian
            w = jnp.exp(-(iou_s[i] ** 2) / sigma)
            w = jnp.where(keep[i] & cat_s[i] & (jnp.arange(q) > i), w, 1.0)
            cur_scores = cur_scores * w
        return keep, cur_scores

    keep_s, scores_out_s = jax.lax.fori_loop(
        0, q, body, (jnp.zeros(q, bool), scores_s)
    )
    # un-sort
    inv = jnp.argsort(order)
    return keep_s[inv], scores_out_s[inv]
