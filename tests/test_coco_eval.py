"""COCO evaluator tests with hand-computable AP values."""
import numpy as np

from zutis_tpu.engine.coco_eval import COCOEvaluator
from zutis_tpu.ops import rle


def block_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def make_gt(ann_masks, h=32, w=32):
    images, annotations = [], []
    ann_id = 1
    for img_id, masks in ann_masks.items():
        images.append({"id": img_id, "height": h, "width": w})
        for m, cat in masks:
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "segmentation": rle.encode(m), "area": int(m.sum()),
                "iscrowd": 0, "bbox": rle.to_bbox(m),
            })
            ann_id += 1
    return {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }


def pred(img_id, m, score, cat=1):
    return {"image_id": img_id, "category_id": cat,
            "segmentation": rle.encode(m), "score": score}


def test_perfect_prediction_ap_1():
    g = block_mask(32, 32, 4, 14, 4, 14)
    gt = make_gt({1: [(g, 1)]})
    ev = COCOEvaluator(gt)
    stats = ev.evaluate([pred(1, g, 0.9)])
    assert stats["AP"] == 1.0
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 1.0


def test_partial_iou_matches_low_thresholds_only():
    # gt: 20px; dt overlaps 15px, union 25 -> IoU = 0.6
    g = block_mask(32, 32, 0, 4, 0, 5)       # 4x5 = 20
    d = block_mask(32, 32, 0, 4, 0, 5).copy()
    d[0, 0:5] = 0                             # drop 5 -> inter 15
    d[4, 0:5] = 1                             # add 5 -> area 20, union 25
    assert rle.mask_iou(d[None], g[None])[0, 0] == 15 / 25
    gt = make_gt({1: [(g, 1)]})
    stats = COCOEvaluator(gt).evaluate([pred(1, d, 0.9)])
    # matched at thresholds 0.50, 0.55, 0.60 -> AP = 3/10
    np.testing.assert_allclose(stats["AP"], 0.3, atol=1e-6)
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 0.0


def test_false_positive_halves_nothing_when_lower_ranked():
    g = block_mask(32, 32, 4, 14, 4, 14)
    fp = block_mask(32, 32, 20, 30, 20, 30)
    gt = make_gt({1: [(g, 1)]})
    stats = COCOEvaluator(gt).evaluate(
        [pred(1, g, 0.9), pred(1, fp, 0.5)])
    # TP ranks first: precision at every recall point stays 1
    assert stats["AP"] == 1.0


def test_missed_gt_reduces_recall():
    g1 = block_mask(32, 32, 0, 10, 0, 10)
    g2 = block_mask(32, 32, 20, 30, 20, 30)
    gt = make_gt({1: [(g1, 1), (g2, 1)]})
    stats = COCOEvaluator(gt).evaluate([pred(1, g1, 0.9)])
    # recall caps at 0.5 -> precision 1 up to r=0.5, 0 beyond: AP ~ 51/101
    np.testing.assert_allclose(stats["AP"], 51 / 101, atol=1e-6)


def test_max_dets_cap():
    h = w = 32
    gts, dts = [], []
    for i in range(3):
        m = block_mask(h, w, 10 * i, 10 * i + 8, 0, 8)
        gts.append((m, 1))
        dts.append(pred(1, m, 0.9 - 0.1 * i))
    gt = make_gt({1: gts})
    ev = COCOEvaluator(gt, max_dets=(1, 2, 3))
    stats = ev.evaluate(dts)
    np.testing.assert_allclose(stats["AR_maxDets_1"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(stats["AR_maxDets_2"], 2 / 3, atol=1e-6)
    assert stats["AR_maxDets_3"] == 1.0


def test_crowd_gt_not_counted_and_absorbs_matches():
    g = block_mask(32, 32, 0, 10, 0, 10)
    crowd = block_mask(32, 32, 20, 32, 20, 32)
    gt = make_gt({1: [(g, 1)]})
    gt["annotations"].append({
        "id": 99, "image_id": 1, "category_id": 1,
        "segmentation": rle.encode(crowd), "area": int(crowd.sum()),
        "iscrowd": 1, "bbox": rle.to_bbox(crowd),
    })
    # dt inside the crowd region: ignored, not an FP
    d_crowd = block_mask(32, 32, 22, 30, 22, 30)
    stats = COCOEvaluator(gt).evaluate(
        [pred(1, g, 0.9), pred(1, d_crowd, 0.8)])
    assert stats["AP"] == 1.0


def test_area_range_rematch():
    """Matching is redone PER AREA RANGE with out-of-range GTs ignored and
    sorted last (pycocotools evaluateImg): a detection that greedily matched
    a small GT in the 'all' cell must fall back to the medium GT in the
    'medium' cell instead of leaving it unmatched."""
    h = w = 128
    S = block_mask(h, w, 0, 30, 0, 30)      # 900 px  -> small (< 32^2)
    M = block_mask(h, w, 0, 40, 0, 40)      # 1600 px -> medium
    D = block_mask(h, w, 0, 31, 0, 30)      # 930 px; IoU vs S = 900/930,
    #                                         IoU vs M = 930/1600 = 0.58125
    gt = make_gt({1: [(S, 1), (M, 1)]}, h=h, w=w)
    stats = COCOEvaluator(gt).evaluate([pred(1, D, 0.9)])
    # small cell: M ignored, D matches S at every threshold -> AP_small 1
    assert stats["AP_small"] == 1.0
    # medium cell: S ignored (sorted last), D matches M at thr .50/.55;
    # at higher thresholds D is unmatched but its 930 px area is out of
    # medium range -> ignored, not an FP
    np.testing.assert_allclose(stats["AP_medium"], 0.2, atol=1e-6)
    np.testing.assert_allclose(stats["AR_medium"], 0.2, atol=1e-6)


def test_ignore_flag_gt_sorted_last():
    """Annotation-level ignore=1 GTs behave like crowd for sorting and the
    recall denominator: a detection with higher IoU on the ignored GT must
    still match the real GT, and npig must exclude the ignored one."""
    G_ig = block_mask(32, 32, 0, 20, 0, 20)   # IoU vs D = 400/420 = 0.952
    G_real = block_mask(32, 32, 0, 20, 0, 24)  # IoU vs D = 420/480 = 0.875
    D = block_mask(32, 32, 0, 20, 0, 21)
    gt = make_gt({1: [(G_ig, 1), (G_real, 1)]})
    gt["annotations"][0]["ignore"] = 1
    stats = COCOEvaluator(gt).evaluate([pred(1, D, 0.9)])
    # matched to G_real at thr 0.50..0.85 -> 8/10 thresholds; npig = 1
    np.testing.assert_allclose(stats["AP"], 0.8, atol=1e-6)
    np.testing.assert_allclose(stats["AR_maxDets_100"], 0.8, atol=1e-6)
