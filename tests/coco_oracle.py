"""Deliberately-naive COCO mask-AP oracle for differential testing.

An INDEPENDENT transcription of the COCO evaluation protocol
(the published algorithm behind pycocotools' COCOeval, which the reference
calls at trainer.py:255-291 and coco20k_eval.py:280-315): dense numpy masks
only, direct greedy matching re-run from scratch for every
(category, area range, maxDet, IoU threshold) cell, O(everything)
accumulation — no code, no data structures, and no intermediate results
shared with zutis_tpu/engine/coco_eval.py. VERDICT r4 task 5: the round-4
per-area-range matching bug showed that fixtures written by the evaluator's
author can miss protocol mistakes; this oracle is the in-env substitute for
the uninstallable pycocotools.

Inputs are plain dicts with DENSE boolean masks (never RLE — the production
evaluator's RLE path is thereby cross-checked end-to-end):
  gt:  {image_id, category_id, mask, iscrowd, ignore}
  det: {image_id, category_id, mask, score}

Protocol notes encoded here, each straight from the published algorithm:
  * detections sorted by descending score (stable -> ties keep input
    order), capped at maxDet per image AFTER sorting;
  * a GT is ignored for a cell when crowd, flagged ignore, or its area is
    outside the range; ignored GTs are considered last (stable sort), and
    a detection already holding a non-ignored match never trades it for an
    ignored one;
  * an already-matched GT is unavailable unless crowd (crowd GTs match any
    number of detections); crowd IoU = intersection / detection area;
  * greedy: each detection takes the available GT with the HIGHEST IoU
    >= threshold (not the first);
  * a matched detection inherits its GT's ignore flag; an unmatched
    detection whose own area is outside the range is ignored, not an FP;
  * accumulation pools detections over images per category (scores
    re-sorted stably), precision is made monotonically non-increasing,
    sampled at 101 recall points with searchsorted-left; cells whose
    non-ignored GT count is zero stay out of every average.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _mask_iou(dt_mask: np.ndarray, gt_mask: np.ndarray,
              crowd: bool) -> float:
    inter = float(np.logical_and(dt_mask, gt_mask).sum())
    if crowd:
        denom = float(dt_mask.sum())
    else:
        denom = float(np.logical_or(dt_mask, gt_mask).sum())
    return inter / denom if denom > 0 else 0.0


def _match_image(gts, dts, thr, lo, hi):
    """Greedy matching for ONE (image, category, threshold, area range).

    Returns (dt_matched, dt_ignored, n_nonignored_gt) for the detections in
    score order. Re-derives everything from the raw masks each call — the
    whole point is to share nothing with the fast evaluator.
    """
    g_ignore = [
        bool(g.get("ignore", 0)) or bool(g.get("iscrowd", 0))
        or not (lo <= float(g["mask"].sum()) <= hi)
        for g in gts
    ]
    # ignored GTs last, original order otherwise (stable)
    order = sorted(range(len(gts)), key=lambda i: (g_ignore[i], 0))
    gt_taken = [False] * len(gts)
    dt_matched = []
    dt_ignored = []
    for d in dts:
        best_gi = -1
        best_iou = min(thr, 1.0 - 1e-10)
        for gi in order:
            g = gts[gi]
            crowd = bool(g.get("iscrowd", 0))
            if gt_taken[gi] and not crowd:
                continue
            if best_gi >= 0 and not g_ignore[best_gi] and g_ignore[gi]:
                break  # holding a real match; only ignored GTs remain
            iou = _mask_iou(d["mask"], g["mask"], crowd)
            if iou < best_iou:
                continue
            best_iou = iou
            best_gi = gi
        if best_gi < 0:
            dt_matched.append(False)
            dt_ignored.append(not (lo <= float(d["mask"].sum()) <= hi))
        else:
            gt_taken[best_gi] = True
            dt_matched.append(True)
            dt_ignored.append(g_ignore[best_gi])
    return dt_matched, dt_ignored, sum(1 for ig in g_ignore if not ig)


def _cell_pr(gts_by_img, dts_by_img, img_ids, thr, lo, hi, max_det):
    """Pooled precision/recall curve for one (cat, thr, area, maxDet)."""
    scores, matched, ignored = [], [], []
    npig = 0
    for img_id in img_ids:
        gts = gts_by_img.get(img_id, [])
        dts = sorted(dts_by_img.get(img_id, []),
                     key=lambda d: -d["score"])[:max_det]
        m, ig, n = _match_image(gts, dts, thr, lo, hi)
        npig += n
        for d, mi, igi in zip(dts, m, ig):
            scores.append(d["score"])
            matched.append(mi)
            ignored.append(igi)
    if npig == 0:
        return None, None
    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    tp = fp = 0
    rc, pr = [], []
    for i in order:
        if ignored[i]:
            continue
        if matched[i]:
            tp += 1
        else:
            fp += 1
        rc.append(tp / npig)
        pr.append(tp / (tp + fp))
    if not rc:
        return [0.0] * len(REC_THRS), 0.0
    for i in range(len(pr) - 2, -1, -1):  # monotone envelope
        pr[i] = max(pr[i], pr[i + 1])
    q = []
    for r in REC_THRS:
        idx = int(np.searchsorted(np.asarray(rc), r, side="left"))
        q.append(pr[idx] if idx < len(pr) else 0.0)
    return q, rc[-1]


def oracle_stats(gt_anns, det_anns, cat_ids, img_ids,
                 max_dets=(1, 10, 100)):
    """Full 12-stat COCO summary, same keys as COCOEvaluator.evaluate."""
    max_dets = sorted(max_dets)
    gts_by, dts_by = {}, {}
    for g in gt_anns:
        gts_by.setdefault((g["category_id"], g["image_id"]), []).append(g)
    for d in det_anns:
        dts_by.setdefault((d["category_id"], d["image_id"]), []).append(d)

    # precision[t, r, k, a, m], recall[t, k, a, m]; -1 = undefined cell
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RANGES), len(max_dets)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cat_ids):
        g_img = {i: gts_by.get((cat, i), []) for i in img_ids}
        d_img = {i: dts_by.get((cat, i), []) for i in img_ids}
        for a, (lo, hi) in enumerate(AREA_RANGES.values()):
            for m, md in enumerate(max_dets):
                for t, thr in enumerate(IOU_THRS):
                    q, r_max = _cell_pr(
                        g_img, d_img, img_ids, thr, lo, hi, md)
                    if q is None:
                        continue
                    precision[t, :, k, a, m] = q
                    recall[t, k, a, m] = r_max

    def ap(t_idx=None, a=0, m=M - 1):
        p = precision[:, :, :, a, m]
        if t_idx is not None:
            p = p[t_idx:t_idx + 1]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def ar(a=0, m=M - 1):
        r = recall[:, :, a, m]
        r = r[r > -1]
        return float(r.mean()) if r.size else -1.0

    area_idx = {n: i for i, n in enumerate(AREA_RANGES)}
    t50 = int(np.flatnonzero(np.isclose(IOU_THRS, 0.5))[0])
    t75 = int(np.flatnonzero(np.isclose(IOU_THRS, 0.75))[0])
    out = {
        "AP": ap(),
        "AP50": ap(t_idx=t50),
        "AP75": ap(t_idx=t75),
        "AP_small": ap(a=area_idx["small"]),
        "AP_medium": ap(a=area_idx["medium"]),
        "AP_large": ap(a=area_idx["large"]),
        "AR_small": ar(a=area_idx["small"]),
        "AR_medium": ar(a=area_idx["medium"]),
        "AR_large": ar(a=area_idx["large"]),
    }
    for i, md in enumerate(max_dets):
        out[f"AR_maxDets_{md}"] = ar(m=i)
    return out
