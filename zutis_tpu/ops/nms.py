"""Device-side per-category greedy mask NMS.

Behavioural contract (reference networks/zutis.py:211-299): per category
(background id 0 excluded), repeatedly RE-SORT the remaining candidates by
their current (possibly re-weighted) score, select the max, re-weight the
rest by IoU with it — hard: 0 beyond `nms_threshold`; linear: (1 - IoU)
beyond the threshold; gaussian: exp(-IoU^2 / sigma) — and drop candidates
whose score falls to or below `score_floor` (0.001). Selected masks keep
their selection-time score. Empty masks never emit predictions.

TPU-first: pairwise IoU is one [Q, HW] x [HW, Q] matmul on the MXU; the
selection is a fori_loop of Q rounds, each taking a masked argmax over the
LIVE scores — which reproduces the reference's re-sort-every-round semantics
exactly for all three NMS types (categories never interact, so a global
argmax yields each category's selection sequence; SURVEY.md section 7 hard
part 4). One vmap over the batch gives the batched evaluator its NMS.
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
    """Returns (keep [Q] bool, out_scores [Q] float). Kept entries carry
    their selection-time score; masks with category 0 or empty masks are
    never kept."""
    q = masks.shape[0]
    # pairwise intersections on the int8 MXU path (s8 x s8 -> s32): exact
    # for {0,1} masks up to 2^31 pixels, ~4x the f32 dot rate on v5e and
    # 1/4 the HBM read traffic of an f32 flatten. The dot contracts over
    # the trailing (h, w) axes IN PLACE — an explicit reshape(q, -1) of the
    # tiled bool layout materialised a full relayout copy (3.4 ms/iter at
    # the 512x640 eval bucket, tools/trace_instance.py)
    m8 = masks.astype(jnp.int8)
    contract = tuple(range(1, m8.ndim))
    inter = jax.lax.dot_general(
        m8, m8, dimension_numbers=((contract, contract), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    areas = jnp.diagonal(inter)  # mask . mask == area
    union = areas[:, None] + areas[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    same_cat = category_ids[:, None] == category_ids[None, :]
    eligible = (category_ids != 0) & (areas > 0)

    def body(_, state):
        keep, cur_scores, candidate = state
        avail = candidate & eligible
        live = jnp.where(avail, cur_scores, -jnp.inf)
        i = jnp.argmax(live)
        selected = live[i] > -jnp.inf  # False once no candidates remain
        keep = keep.at[i].set(keep[i] | selected)
        candidate = candidate.at[i].set(candidate[i] & ~selected)

        iou_i = iou[i]
        if nms_type == "hard":
            w = jnp.where(iou_i > nms_threshold, 0.0, 1.0)
        elif nms_type == "linear":
            w = jnp.where(iou_i > nms_threshold, 1.0 - iou_i, 1.0)
        else:  # gaussian
            w = jnp.exp(-(iou_i ** 2) / sigma)
        apply_w = selected & same_cat[i] & candidate
        cur_scores = cur_scores * jnp.where(apply_w, w, 1.0)
        # the floor sweep applies ONLY to candidates re-weighted this round:
        # the reference (zutis.py:268-272) floor-checks survivors after each
        # re-weighting, but a candidate whose ORIGINAL score is <= 0.001 is
        # still selected when it becomes its category's max; already-kept
        # entries are untouched
        candidate = candidate & (~apply_w | (cur_scores > score_floor))
        return keep, cur_scores, candidate

    keep, out_scores, _ = jax.lax.fori_loop(
        0, q, body,
        (jnp.zeros(q, bool), scores.astype(jnp.float32), eligible),
    )
    return keep, out_scores
