"""Differential test: COCOEvaluator vs the independent brute-force oracle.

VERDICT r4 task 5: the round-4 per-area-range matching bug proved that
author-written fixtures can miss protocol mistakes in
zutis_tpu/engine/coco_eval.py. tests/coco_oracle.py is a from-scratch
transcription of the protocol (dense masks, per-cell re-matching, zero
shared code); this test throws randomized scenes at both — crowds, ignore
flags, all three area buckets, binding maxDet caps, duplicate detections,
exact score ties, empty masks — and demands the full 12-stat summary agree
to 1e-9.

Reference workload being protected: coco20k_eval.py:280-315 /
trainer.py:255-291 (pycocotools COCOeval on mask predictions).
"""
import numpy as np
import pytest

from tests.coco_oracle import oracle_stats
from zutis_tpu.engine.coco_eval import COCOEvaluator
from zutis_tpu.ops import rle

N_SCENES = 120


def random_rect_mask(rng, h, w, allow_empty=False):
    if allow_empty and rng.rand() < 0.05:
        return np.zeros((h, w), np.uint8)
    # bias sizes across the small/medium/large area buckets
    scale = rng.choice([0.15, 0.45, 0.95])
    bh = max(1, int(h * scale * rng.uniform(0.5, 1.0)))
    bw = max(1, int(w * scale * rng.uniform(0.5, 1.0)))
    y0 = rng.randint(0, max(1, h - bh + 1))
    x0 = rng.randint(0, max(1, w - bw + 1))
    m = np.zeros((h, w), np.uint8)
    m[y0:y0 + bh, x0:x0 + bw] = 1
    return m


def jitter(rng, mask):
    """Shifted/regrown copy of a GT mask — partial-IoU detections."""
    h, w = mask.shape
    dy, dx = rng.randint(-3, 4), rng.randint(-3, 4)
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return out
    ys = np.clip(ys + dy, 0, h - 1)
    xs = np.clip(xs + dx, 0, w - 1)
    out[ys, xs] = 1
    if rng.rand() < 0.3:  # grow one row to perturb area/IoU
        y1 = min(int(ys.max()) + 1, h - 1)
        out[y1, xs.min():xs.max() + 1] = 1
    return out


def random_scene(rng):
    n_imgs = rng.randint(1, 4)
    cat_ids = list(range(1, rng.randint(2, 4)))
    size = 120 if rng.rand() < 0.4 else 48  # 120px scenes reach "large"
    gt_dense, det_dense = [], []
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, n_imgs + 1):
        images.append({"id": img_id, "height": size, "width": size})
        for _ in range(rng.randint(0, 6)):
            m = random_rect_mask(rng, size, size)
            cat = int(rng.choice(cat_ids))
            g = {
                "image_id": img_id, "category_id": cat, "mask": m,
                "iscrowd": int(rng.rand() < 0.2),
                "ignore": int(rng.rand() < 0.15),
            }
            gt_dense.append(g)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "segmentation": rle.encode(m), "area": int(m.sum()),
                "iscrowd": g["iscrowd"], "ignore": g["ignore"],
            })
            ann_id += 1
            if rng.rand() < 0.8:  # jittered detection of this GT
                det_dense.append({
                    "image_id": img_id, "category_id": cat,
                    "mask": jitter(rng, m),
                    # quantised scores force exact ties across detections
                    "score": round(float(rng.randint(1, 10)) / 10.0, 1),
                })
            if rng.rand() < 0.2:  # duplicate detection (same GT twice)
                det_dense.append({
                    "image_id": img_id, "category_id": cat,
                    "mask": m.copy(),
                    "score": round(float(rng.randint(1, 10)) / 10.0, 1),
                })
        for _ in range(rng.randint(0, 3)):  # false positives
            det_dense.append({
                "image_id": img_id,
                "category_id": int(rng.choice(cat_ids)),
                "mask": random_rect_mask(rng, size, size, allow_empty=True),
                "score": round(float(rng.randint(1, 10)) / 10.0, 1),
            })
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c} for c in cat_ids],
    }
    predictions = [
        {"image_id": d["image_id"], "category_id": d["category_id"],
         "segmentation": rle.encode(d["mask"]), "score": d["score"]}
        for d in det_dense
    ]
    return gt, predictions, gt_dense, det_dense, cat_ids, n_imgs


@pytest.mark.parametrize("seed", range(N_SCENES))
def test_differential_random_scene(seed):
    rng = np.random.RandomState(1000 + seed)
    gt, predictions, gt_dense, det_dense, cat_ids, n_imgs = (
        random_scene(rng))
    # alternate maxDets so the cap binds (1, 2, 3) on half the scenes
    max_dets = (1, 10, 100) if seed % 2 == 0 else (1, 2, 3)
    got = COCOEvaluator(gt, max_dets=max_dets).evaluate(predictions)
    want = oracle_stats(
        gt_dense, det_dense, cat_ids=sorted(cat_ids),
        img_ids=list(range(1, n_imgs + 1)), max_dets=max_dets)
    for key, w in want.items():
        assert got[key] == pytest.approx(w, abs=1e-9), (
            f"seed {seed}: {key} evaluator={got[key]} oracle={w}")


def test_regression_ignored_gt_not_poolable_as_fp():
    """Hand-pinned scenario kept from the differential sweep family: a
    detection matching only an out-of-range GT must be ignored in that
    range, never an FP (the class of bug the r4 self-review caught)."""
    size = 48
    m_small = np.zeros((size, size), np.uint8)
    m_small[0:10, 0:10] = 1  # area 100 -> small bucket
    gt = {
        "images": [{"id": 1, "height": size, "width": size}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "segmentation": rle.encode(m_small), "area": 100,
            "iscrowd": 0,
        }],
        "categories": [{"id": 1}],
    }
    preds = [{"image_id": 1, "category_id": 1,
              "segmentation": rle.encode(m_small), "score": 0.9}]
    got = COCOEvaluator(gt).evaluate(preds)
    want = oracle_stats(
        [{"image_id": 1, "category_id": 1, "mask": m_small,
          "iscrowd": 0, "ignore": 0}],
        [{"image_id": 1, "category_id": 1, "mask": m_small, "score": 0.9}],
        cat_ids=[1], img_ids=[1])
    for key, w in want.items():
        assert got[key] == pytest.approx(w, abs=1e-9)
    # medium/large have no GT: undefined (-1), not zero
    assert got["AP_medium"] == -1.0 and got["AP_large"] == -1.0
