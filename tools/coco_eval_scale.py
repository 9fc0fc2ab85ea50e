"""COCO-20K-scale synthetic benchmark of the host COCO evaluator
(engine/coco_eval.py) — VERDICT r3 task 4.

The reference runs pycocotools' C COCOeval over 19,817 images
(reference coco20k_eval.py:280-315). This tool synthesises a GT + prediction
set of that scale with realistic detection counts and times
`COCOEvaluator(gt).evaluate(preds)` end-to-end, proving the RLE-native
evaluator (counts two-pointer IoU, C++ string parsing) is not the pipeline
wall. Masks are generated as rectangles with analytically constructed
run-length sequences, so generation cost stays out of the way.

  python tools/coco_eval_scale.py [--n-images 19817] [--dets 20] [--gts 7]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from zutis_tpu.engine.coco_eval import COCOEvaluator  # noqa: E402
from zutis_tpu.ops.rle import _compress_counts  # noqa: E402


def rect_rle(h: int, w: int, y0: int, y1: int, x0: int, x1: int) -> dict:
    """Analytic COCO RLE of an axis-aligned rectangle (no rasterisation)."""
    ones = y1 - y0
    ncols = x1 - x0
    assert ones > 0 and ncols > 0
    counts = [x0 * h + y0]
    for c in range(ncols - 1):
        counts += [ones, h - ones]
    counts += [ones, h * w - ((x1 - 1) * h + y1)]
    return {"size": [h, w], "counts": _compress_counts(counts)}


def synthesize(n_images: int, dets_per_img: int, gts_per_img: int,
               n_cats: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    images, annotations, preds = [], [], []
    ann_id = 1
    t0 = time.time()
    for img_id in range(1, n_images + 1):
        h = int(rng.integers(360, 521))
        w = int(rng.integers(480, 641))
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{img_id:012d}.jpg"})
        n_gt = int(rng.integers(1, gts_per_img + 1))
        gt_boxes = []
        for _ in range(n_gt):
            y0 = int(rng.integers(0, h - 40))
            x0 = int(rng.integers(0, w - 40))
            y1 = y0 + int(rng.integers(20, min(200, h - y0)))
            x1 = x0 + int(rng.integers(20, min(200, w - x0)))
            cat = int(rng.integers(1, n_cats + 1))
            gt_boxes.append((y0, y1, x0, x1, cat))
            seg = rect_rle(h, w, y0, y1, x0, x1)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cat,
                "segmentation": seg, "area": (y1 - y0) * (x1 - x0),
                "iscrowd": 0,
                "bbox": [x0, y0, x1 - x0, y1 - y0],
            })
            ann_id += 1
        for di in range(dets_per_img):
            if di < len(gt_boxes) and rng.random() < 0.7:
                # jittered true positive
                y0, y1, x0, x1, cat = gt_boxes[di]
                jy = int(rng.integers(-8, 9))
                jx = int(rng.integers(-8, 9))
                y0 = max(0, min(h - 2, y0 + jy)); y1 = max(y0 + 1, min(h, y1 + jy))
                x0 = max(0, min(w - 2, x0 + jx)); x1 = max(x0 + 1, min(w, x1 + jx))
            else:
                y0 = int(rng.integers(0, h - 30))
                x0 = int(rng.integers(0, w - 30))
                y1 = y0 + int(rng.integers(15, min(150, h - y0)))
                x1 = x0 + int(rng.integers(15, min(150, w - x0)))
                cat = int(rng.integers(1, n_cats + 1))
            preds.append({
                "image_id": img_id, "category_id": cat,
                "segmentation": rect_rle(h, w, y0, y1, x0, x1),
                "score": float(rng.random()),
            })
    gt = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"cat{c}"}
                       for c in range(1, n_cats + 1)],
    }
    return gt, preds, time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=19817)
    ap.add_argument("--dets", type=int, default=20)
    ap.add_argument("--gts", type=int, default=7)
    ap.add_argument("--cats", type=int, default=80)
    args = ap.parse_args(argv)

    gt, preds, t_gen = synthesize(args.n_images, args.dets, args.gts,
                                  args.cats)
    t0 = time.time()
    ev = COCOEvaluator(gt)
    metrics = ev.evaluate(preds)
    t_eval = time.time() - t0
    print(json.dumps({
        "n_images": args.n_images,
        "n_predictions": len(preds),
        "n_gt": sum(1 for _ in gt["annotations"]),
        "gen_seconds": round(t_gen, 2),
        "eval_seconds": round(t_eval, 2),
        "eval_images_per_sec": round(args.n_images / t_eval, 1),
        "AP": metrics["AP"],
        "AP50": metrics["AP50"],
    }))


if __name__ == "__main__":
    main()
