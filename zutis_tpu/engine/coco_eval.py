"""COCO-style mask AP/AR evaluation, implemented from the COCO evaluation
protocol (the reference outsources this to pycocotools' COCOeval,
trainer.py:255-291 and coco20k_eval.py:280-315; pycocotools is not a
dependency here, so the matching/accumulation algorithm is reproduced from
the published protocol).

Protocol summary:
  * IoU thresholds 0.50:0.05:0.95, recall thresholds 0:0.01:1.
  * Per (image, category): detections sorted by descending score (stable),
    capped at maxDet; each detection greedily matches the not-yet-matched GT
    with the highest IoU >= threshold; crowd GTs may be matched repeatedly
    and use intersection/det-area as IoU; once a non-ignored candidate exists
    an ignored GT cannot take over. Unmatched detections whose area falls
    outside the area range are ignored rather than counted as FPs.
  * Accumulation: detections pooled over images per category, re-sorted by
    score; precision is made monotonically non-increasing, then sampled at
    the 101 recall points; AP averages over categories/thresholds with
    valid GT; AR is the maximum recall.
  * stats: the standard 12-number summary.

Segmentation masks arrive as COCO RLE dicts or polygons (converted through
ops/rle); IoUs are computed in RLE space with ops/rle.counts_iou (C++
two-pointer run merge, numpy fallback) — masks are never densified, matching
pycocotools' maskApi strategy and keeping ~20k-image sweeps off the dense
path (tools/coco_eval_scale.py records the wall time).

Oracle status: pycocotools is not installable in this environment, so parity
with the C implementation cannot be asserted in-repo. Coverage instead:
hand-computable AP scenarios (tests/test_coco_eval.py) for matching, crowd,
area-range and maxDet behaviours, and the RLE layer is cross-validated
byte-for-byte against the independent C++ codec (tests/test_rle_native.py).
When running somewhere with pycocotools, `COCOEvaluator(gt).evaluate(preds)`
takes the same gt-dict/prediction-list inputs as COCOeval for a direct A/B.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from zutis_tpu.ops import rle as rle_ops

AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


class COCOEvaluator:
    def __init__(
        self,
        gt: Dict,
        max_dets: Sequence[int] = (1, 10, 100),
        iou_thrs: Optional[np.ndarray] = None,
        cat_ids: Optional[Sequence[int]] = None,
    ):
        """gt: COCO-format dict with images/annotations/categories."""
        self.iou_thrs = (
            np.linspace(0.5, 0.95, 10) if iou_thrs is None else iou_thrs
        )
        self.rec_thrs = np.linspace(0.0, 1.0, 101)
        self.max_dets = sorted(max_dets)
        self.area_labels = list(AREA_RNG)
        self.imgs = {im["id"]: im for im in gt["images"]}
        self.cat_ids = sorted(
            cat_ids if cat_ids is not None
            else [c["id"] for c in gt["categories"]]
        )
        self.gts = defaultdict(list)
        for ann in gt["annotations"]:
            self.gts[(ann["image_id"], ann["category_id"])].append(ann)
        self.img_ids = sorted(self.imgs)

    def _ann_counts(self, ann: Dict, img: Dict) -> np.ndarray:
        """Run-length sequence of an annotation's mask. RLE segmentations
        (the common case — everything our pipeline emits) decompress without
        ever densifying; polygons rasterise once, then re-encode."""
        seg = ann["segmentation"]
        if isinstance(seg, dict):
            return rle_ops.counts_of(seg)
        mask = rle_ops.polygons_to_mask(seg, img["height"], img["width"])
        return rle_ops._counts_from_mask(mask)

    def evaluate(self, predictions: List[Dict]) -> Dict[str, float]:
        dts = defaultdict(list)
        for i, p in enumerate(predictions):
            p = dict(p)
            p.setdefault("id", i + 1)
            if "area" not in p:
                p["area"] = rle_ops.area(p["segmentation"])
            dts[(p["image_id"], p["category_id"])].append(p)

        T = len(self.iou_thrs)
        R = len(self.rec_thrs)
        K = len(self.cat_ids)
        A = len(self.area_labels)
        M = len(self.max_dets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        max_det_cap = self.max_dets[-1]
        for k, cat_id in enumerate(self.cat_ids):
            # per-image match results at cap maxDet, reused for all A/M
            per_img = []
            for img_id in self.img_ids:
                g = self.gts.get((img_id, cat_id), [])
                d = dts.get((img_id, cat_id), [])
                if not g and not d:
                    continue
                per_img.append(self._evaluate_img(
                    g, d, self.imgs[img_id], max_det_cap))
            if not per_img:
                continue
            # concatenate the category's per-image match results ONCE; every
            # (area, maxDet) cell then reduces over flat arrays with no
            # Python per-image loop (the r3 accumulate dominated 20k-image
            # sweeps, tools/coco_eval_scale.py)
            cat = self._concat_cat(per_img)
            for a, area in enumerate(self.area_labels):
                rng = AREA_RNG[area]
                for m, max_det in enumerate(self.max_dets):
                    self._accumulate(
                        cat, rng, max_det, precision[:, :, k, a, m],
                        recall[:, k, a, m],
                    )

        self.precision = precision
        self.recall = recall
        return self._summarize()

    def _evaluate_img(self, gts: List[Dict], dts: List[Dict], img: Dict,
                      max_det: int) -> Dict:
        T = len(self.iou_thrs)
        dts = sorted(dts, key=lambda d: -d["score"])[:max_det]
        g_crowd = np.array([bool(g.get("iscrowd", 0)) for g in gts], dtype=bool)
        # crowd (always-ignored) GTs sort last
        g_order = np.argsort(g_crowd, kind="stable")
        gts = [gts[i] for i in g_order]
        g_crowd = g_crowd[g_order]

        if gts and dts:
            # IoU in RLE space (counts two-pointer merge) — no dense decode;
            # at COCO-20K scale the dense path's per-pair [h, w] stacks were
            # the projected end-to-end wall (VERDICT r3)
            gc = [self._ann_counts(g, img) for g in gts]
            dc = [rle_ops.counts_of(d["segmentation"]) for d in dts]
            ious = rle_ops.counts_iou(dc, gc, iscrowd=g_crowd.tolist())
        else:
            ious = np.zeros((len(dts), len(gts)))

        G, D = len(gts), len(dts)
        gt_area = np.array([g["area"] for g in gts], dtype=np.float64)
        dt_area = np.array([d["area"] for d in dts], dtype=np.float64)
        dt_score = np.array([d["score"] for d in dts], dtype=np.float64)

        dtm = np.zeros((T, D), dtype=np.int64)  # matched gt index+1
        dt_ig_match = np.zeros((T, D), dtype=bool)
        gtm = np.zeros((T, G), dtype=np.int64)

        for t, thr in enumerate(self.iou_thrs):
            for di in range(D):
                best_iou = min(thr, 1 - 1e-10)
                best = -1
                for gi in range(G):
                    if gtm[t, gi] > 0 and not g_crowd[gi]:
                        continue
                    # ignored GTs come last; stop once we have a real match
                    if best > -1 and not self._gt_ignored_base(
                        gts[best], g_crowd[best]
                    ) and self._gt_ignored_base(gts[gi], g_crowd[gi]):
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best = gi
                if best == -1:
                    continue
                dtm[t, di] = best + 1
                dt_ig_match[t, di] = self._gt_ignored_base(
                    gts[best], g_crowd[best])
                gtm[t, best] = di + 1

        return {
            "gt_area": gt_area,
            "gt_crowd": g_crowd,
            "dt_area": dt_area,
            "dt_score": dt_score,
            "dtm": dtm,
            "dt_ig_match": dt_ig_match,
            "matched_gt_area": np.where(
                dtm > 0, gt_area[np.maximum(dtm - 1, 0)], 0.0
            ) if G else np.zeros_like(dtm, dtype=np.float64),
        }

    @staticmethod
    def _gt_ignored_base(g: Dict, crowd: bool) -> bool:
        return bool(crowd or g.get("ignore", 0))

    @staticmethod
    def _concat_cat(per_img):
        """Flatten one category's per-image match results. `dt_rank` is each
        detection's 0-based score rank WITHIN its image (detections arrive
        already score-sorted per image), so capping at maxDet m later is just
        `dt_rank < m` — no per-image slicing."""
        dt_score = np.concatenate([r["dt_score"] for r in per_img])
        dt_rank = np.concatenate(
            [np.arange(len(r["dt_score"])) for r in per_img])
        dtm = np.concatenate([r["dtm"] for r in per_img], axis=1)
        matched_area = np.concatenate(
            [r["matched_gt_area"] for r in per_img], axis=1)
        matched_crowd = np.concatenate(
            [r["dt_ig_match"] for r in per_img], axis=1)
        dt_area = np.concatenate([r["dt_area"] for r in per_img])
        gt_area = np.concatenate([r["gt_area"] for r in per_img])
        gt_crowd = np.concatenate([r["gt_crowd"] for r in per_img])
        # one stable global sort by descending score, shared by all
        # (area, maxDet) cells
        order = np.argsort(-dt_score, kind="mergesort")
        return {
            "dt_score": dt_score[order],
            "dt_rank": dt_rank[order],
            "dtm": dtm[:, order],
            "matched_area": matched_area[:, order],
            "matched_crowd": matched_crowd[:, order],
            "dt_area": dt_area[order],
            "gt_area": gt_area,
            "gt_crowd": gt_crowd,
        }

    def _accumulate(self, cat, rng, max_det, precision_out, recall_out):
        T = len(self.iou_thrs)
        g_ig = (
            cat["gt_crowd"]
            | (cat["gt_area"] < rng[0])
            | (cat["gt_area"] > rng[1])
        )
        npig = int((~g_ig).sum())
        if npig == 0:
            return
        sel = cat["dt_rank"] < max_det  # per-image maxDet cap, score order
        dtm = cat["dtm"][:, sel]
        nd = dtm.shape[1]
        if nd:
            matched_area = cat["matched_area"][:, sel]
            matched_crowd = cat["matched_crowd"][:, sel]
            dt_area = cat["dt_area"][sel]
            # dt ignored: matched to an ignored gt (by crowd/area) or
            # unmatched with out-of-range area
            m_ig = (dtm > 0) & (
                matched_crowd
                | (matched_area < rng[0])
                | (matched_area > rng[1])
            )
            a_out = (dt_area < rng[0]) | (dt_area > rng[1])
            dt_ig = m_ig | ((dtm == 0) & a_out[None, :])
            tp_cum = np.cumsum((dtm > 0) & ~dt_ig, axis=1, dtype=np.float64)
            fp_cum = np.cumsum((dtm == 0) & ~dt_ig, axis=1, dtype=np.float64)
        else:
            tp_cum = np.zeros((T, 0))
            fp_cum = np.zeros((T, 0))

        R = len(self.rec_thrs)
        rc = tp_cum / npig
        pr = tp_cum / np.maximum(tp_cum + fp_cum, np.finfo(np.float64).eps)
        recall_out[:] = rc[:, -1] if nd else 0.0
        if not nd:
            precision_out[:] = np.zeros((T, R))
            return
        # monotone non-increasing precision envelope (vectorised suffix max)
        pr = np.maximum.accumulate(pr[:, ::-1], axis=1)[:, ::-1]
        q = np.zeros((T, R))
        for t in range(T):
            inds = np.searchsorted(rc[t], self.rec_thrs, side="left")
            valid = inds < nd
            q[t, valid] = pr[t, inds[valid]]
        precision_out[:] = q

    def _summarize(self) -> Dict[str, float]:
        def ap(iou=None, area="all", max_det=None):
            max_det = self.max_dets[-1] if max_det is None else max_det
            a = self.area_labels.index(area)
            m = self.max_dets.index(max_det)
            p = self.precision[:, :, :, a, m]
            if iou is not None:
                t = np.flatnonzero(np.isclose(self.iou_thrs, iou))[0]
                p = p[t:t + 1]
            p = p[p > -1]
            return float(p.mean()) if p.size else -1.0

        def ar(area="all", max_det=None):
            max_det = self.max_dets[-1] if max_det is None else max_det
            a = self.area_labels.index(area)
            m = self.max_dets.index(max_det)
            r = self.recall[:, :, a, m]
            r = r[r > -1]
            return float(r.mean()) if r.size else -1.0

        md = self.max_dets
        return {
            "AP": ap(),
            "AP50": ap(iou=0.5),
            "AP75": ap(iou=0.75),
            "AP_small": ap(area="small"),
            "AP_medium": ap(area="medium"),
            "AP_large": ap(area="large"),
            f"AR_maxDets_{md[0]}": ar(max_det=md[0]),
            f"AR_maxDets_{md[1] if len(md) > 1 else md[0]}":
                ar(max_det=md[1] if len(md) > 1 else md[0]),
            f"AR_maxDets_{md[-1]}": ar(max_det=md[-1]),
            "AR_small": ar(area="small"),
            "AR_medium": ar(area="medium"),
            "AR_large": ar(area="large"),
        }
