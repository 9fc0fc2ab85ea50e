"""COCO run-length-encoding codec (byte-compatible with the pycocotools JSON
format), implemented from the published format specification.

The reference relies on pycocotools' C maskApi for RLE encode/decode at the
dataset boundary (reference datasets/index_dataset.py:219-224,
networks/zutis.py:290,448). This module provides:

  encode(mask) / decode(rle): binary mask [h, w] <-> {"size": [h, w],
      "counts": <compressed str>}; masks are flattened in Fortran
      (column-major) order; counts alternate runs of 0s and 1s starting with
      zeros. The compressed string packs each count (delta-coded against
      count[i-2] for i > 2) as little-endian 5-bit groups with a continuation
      bit, offset by chr(48) — the LEB128 variant COCO uses.
  area(rle), to_bbox(rle), rle_iou: host-side helpers for COCO JSON I/O.

A C++ codec (native/rle.cc) accelerates batch encode for eval throughput; this
numpy version is the reference implementation and fallback.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict[str, Union[List[int], str]]


def _counts_from_mask(mask: np.ndarray) -> np.ndarray:
    """mask: [h, w] {0,1} -> run lengths (column-major, zeros first)."""
    flat = np.asfortranarray(mask.astype(np.uint8)).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], change, [n]])
    counts = np.diff(boundaries)
    if flat[0] == 1:  # must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _compress_counts(counts: Sequence[int]) -> str:
    out = []
    counts = list(map(int, counts))
    for i, c in enumerate(counts):
        # delta-code against counts[i-2] from the 4th count on (COCO spec)
        x = c - counts[i - 2] if i > 2 else c
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = (x != -1) if (chunk & 0x10) else (x != 0)
            if more:
                chunk |= 0x20
            out.append(chr(chunk + 48))
    return "".join(out)


def _decompress_counts(s: str) -> np.ndarray:
    counts: List[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        while True:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            i += 1
            k += 1
            if not (c & 0x20):
                if c & 0x10:  # sign-extend
                    x |= -1 << (5 * k)
                break
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode(mask: np.ndarray) -> RLE:
    """mask: [h, w] binary -> COCO compressed RLE dict."""
    h, w = mask.shape
    counts = _counts_from_mask(mask)
    return {"size": [int(h), int(w)], "counts": _compress_counts(counts)}


def decode(rle: RLE) -> np.ndarray:
    """COCO RLE dict -> [h, w] uint8 mask. Accepts compressed (str counts) and
    uncompressed (list counts) RLEs."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        counts = _decompress_counts(counts)
    else:
        counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    assert total == h * w, f"RLE length {total} != {h}*{w}"
    flat = np.zeros(h * w, np.uint8)
    ends = np.cumsum(counts)
    starts = ends - counts
    for i in range(1, len(counts), 2):
        flat[starts[i]:ends[i]] = 1
    return flat.reshape((w, h)).T  # undo Fortran order


def area(rle: RLE) -> int:
    counts = counts_of(rle)
    return int(np.asarray(counts[1::2]).sum())


def to_bbox(mask: np.ndarray) -> List[float]:
    """Tight xyxy box of a binary mask (torchvision masks_to_boxes semantics,
    reference networks/zutis.py:294). Empty mask -> zeros."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]


def mask_iou(
    dts: np.ndarray,  # [n_dt, h, w]
    gts: np.ndarray,  # [n_gt, h, w]
    iscrowd: Sequence[bool] | None = None,
) -> np.ndarray:
    """Pairwise mask IoU [n_dt, n_gt]; for crowd GT the denominator is the dt
    area (COCO convention)."""
    d = dts.reshape(len(dts), -1).astype(np.float64)
    g = gts.reshape(len(gts), -1).astype(np.float64)
    inter = d @ g.T
    da = d.sum(-1)[:, None]
    ga = g.sum(-1)[None, :]
    union = da + ga - inter
    if iscrowd is not None and any(iscrowd):
        crowd = np.asarray(iscrowd, bool)[None, :]
        union = np.where(crowd, da + 0 * ga, union)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def counts_iou(
    dt_counts: List[np.ndarray],
    gt_counts: List[np.ndarray],
    iscrowd: Sequence[bool] | None = None,
) -> np.ndarray:
    """Pairwise mask IoU [n_dt, n_gt] computed directly on run-length
    sequences, never densifying either mask (the reference leans on
    pycocotools' C implementation of the same idea,
    reference coco20k_eval.py:281-291). Exact integer arithmetic, so results
    are bit-identical to `mask_iou` over the decoded masks. Prefers the C++
    two-pointer merge (native.native_rle_iou); this numpy fallback evaluates
    each dt run against gt's cumulative-coverage function in
    O(n_dt_runs * log n_gt_runs) per pair."""
    from zutis_tpu.native import native_rle_iou

    nd, ng = len(dt_counts), len(gt_counts)
    crowd = (np.zeros(ng, bool) if iscrowd is None
             else np.asarray(iscrowd, bool))
    got = native_rle_iou(list(dt_counts), list(gt_counts), list(crowd))
    if got is not None:
        return got

    def one_intervals(counts):
        ends = np.cumsum(counts)
        starts = ends - counts
        return starts[1::2].astype(np.int64), ends[1::2].astype(np.int64)

    d_iv = [one_intervals(np.asarray(c)) for c in dt_counts]
    g_iv = [one_intervals(np.asarray(c)) for c in gt_counts]
    d_area = np.array([int((e - s).sum()) for s, e in d_iv], np.int64)
    g_area = np.array([int((e - s).sum()) for s, e in g_iv], np.int64)

    out = np.zeros((nd, ng), np.float64)
    for gi, (gs, ge) in enumerate(g_iv):
        if len(gs) == 0:
            continue
        cum = np.concatenate([[0], np.cumsum(ge - gs)])

        def coverage_below(x):
            # total gt-covered length in [0, x)
            j = np.searchsorted(gs, x, side="right") - 1
            jc = np.maximum(j, 0)
            val = cum[jc] + np.clip(x - gs[jc], 0, ge[jc] - gs[jc])
            return np.where(j >= 0, val, 0)

        for di, (ds, de) in enumerate(d_iv):
            if len(ds) == 0:
                continue
            inter = int((coverage_below(de) - coverage_below(ds)).sum())
            union = (d_area[di] if crowd[gi]
                     else d_area[di] + g_area[gi] - inter)
            out[di, gi] = inter / union if union > 0 else 0.0
    return out


def counts_of(rle: RLE) -> np.ndarray:
    """The decompressed run-length sequence of a COCO RLE dict (C++ string
    parser when available; the Python decoder is the reference fallback)."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        from zutis_tpu.native import native_string_to_counts

        got = native_string_to_counts(counts)
        return got if got is not None else _decompress_counts(counts)
    return np.asarray(counts, np.int64)


def polygons_to_mask(polygons: List[Sequence[float]], h: int, w: int) -> np.ndarray:
    """COCO polygon segmentation -> binary mask via cv2 even-odd fill (the
    reference gets this from pycocotools' frPyObjects; boundary pixels may
    differ by <1px)."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    """Any COCO 'segmentation' field (polygon list / RLE dict) -> mask."""
    if isinstance(seg, dict):
        return decode(seg)
    return polygons_to_mask(seg, h, w)
