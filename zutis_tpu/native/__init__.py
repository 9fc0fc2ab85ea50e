"""Native (C++) runtime pieces, loaded via ctypes.

The reference leans on pycocotools' C maskApi for RLE at every dataset/eval
boundary (SURVEY.md section 2.3). Here `native/rle.cc` is the C++ codec —
built on demand with g++ into librle.so next to this file and exposed
through ctypes (no pybind11 in the image). ops/rle.py uses it when available
and keeps the numpy implementation as reference/fallback; the two
implementations cross-validate in tests/test_rle_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.cc")
_LIB = os.path.join(_DIR, "librle.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_rle_lib() -> Optional[ctypes.CDLL]:
    """The C++ RLE codec, building it on first use; None when no toolchain."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        if not _build() and not os.path.exists(_LIB):
            return None
        # build failed but a prebuilt librle.so exists (mtime-stale only —
        # git clones don't preserve mtimes): load it rather than silently
        # dropping to the ~100x-slower Python codec on g++-less boxes
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.rle_encode_batch.restype = ctypes.c_int
    lib.rle_encode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rle_counts_to_string_batch.restype = ctypes.c_int
    lib.rle_counts_to_string_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rle_string_to_counts.restype = ctypes.c_int
    lib.rle_string_to_counts.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.rle_iou_batch.restype = None
    lib.rle_iou_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    lib.rle_encode_packed_batch.restype = ctypes.c_int
    lib.rle_encode_packed_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def native_encode(mask: np.ndarray) -> Optional[str]:
    """C++ encode of one [h, w] binary mask -> counts string (None when the
    native lib is unavailable)."""
    lib = load_rle_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    cap = 2 * h * w + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out, cap)
    assert n >= 0, "rle_encode overflow"
    return out.raw[:n].decode("ascii")


def native_decode(counts: str, h: int, w: int) -> Optional[np.ndarray]:
    lib = load_rle_lib()
    if lib is None:
        return None
    out = np.zeros((h, w), np.uint8)
    rc = lib.rle_decode(
        counts.encode("ascii"), len(counts), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0, "malformed RLE"
    return out


def native_encode_packed(
    packed: np.ndarray,  # [n_masks, stride_bytes] uint8, F-order packed bits
    sel: np.ndarray,  # [n_sel] int32 indices into the mask axis
    col_stride_bits: int,  # padded rows per column (multiple of 8)
    hs: np.ndarray,  # [n_sel] native rows per selected mask
    ws: np.ndarray,  # [n_sel] native cols per selected mask
):
    """C++ batch encode of packed-bit masks over their native windows.
    -> (counts strings, bboxes [n_sel, 4] xyxy int, areas [n_sel] int64),
    or None when the native lib is unavailable."""
    lib = load_rle_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed.reshape(packed.shape[0], -1),
                                  dtype=np.uint8)
    sel = np.ascontiguousarray(sel, dtype=np.int32)
    hs = np.ascontiguousarray(hs, dtype=np.int32)
    ws = np.ascontiguousarray(ws, dtype=np.int32)
    n_sel = len(sel)
    if n_sel == 0:
        return [], np.zeros((0, 4), np.int32), np.zeros((0,), np.int64)
    bboxes = np.zeros((n_sel, 4), np.int32)
    areas = np.zeros((n_sel,), np.int64)
    offsets = (ctypes.c_int * n_sel)()
    # worst case ~1 char per pixel; start smaller and retry on overflow
    cap = int(hs.astype(np.int64) @ ws.astype(np.int64) // 4 + 4096 * n_sel)
    while True:
        out = ctypes.create_string_buffer(cap)
        total = lib.rle_encode_packed_batch(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            packed.strides[0], sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_sel, col_stride_bits,
            hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out, cap, offsets,
            bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if total >= 0:
            break
        cap *= 4
    bounds = list(offsets) + [total]
    raw = out.raw
    strings = [raw[bounds[i]:bounds[i + 1]].decode("ascii")
               for i in range(n_sel)]
    return strings, bboxes, areas


def counts_to_strings(
    counts: np.ndarray,  # [n, stride] run-length sequences
    n_counts: np.ndarray,  # [n] valid prefix lengths
) -> Optional[List[str]]:
    """C++ compression of device-computed RLE counts (ops/rle_device.py) to
    COCO strings; None when the native lib is unavailable."""
    lib = load_rle_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n_counts = np.ascontiguousarray(n_counts, dtype=np.int32)
    n, stride = counts.shape
    if n == 0:
        return []
    offsets = (ctypes.c_int * n)()
    # a 64-bit count emits at most 13 five-bit groups; 16/count is safe
    # slack — but retry with a larger arena on overflow anyway (mirrors
    # native_encode_packed) instead of asserting mid-eval
    cap = int(16 * n_counts.sum() + 64 * n)
    while True:
        out = ctypes.create_string_buffer(cap)
        total = lib.rle_counts_to_string_batch(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n, stride, out, cap, offsets)
        if total >= 0:
            break
        cap *= 4
    bounds = list(offsets) + [total]
    raw = out.raw
    return [raw[bounds[i]:bounds[i + 1]].decode("ascii") for i in range(n)]


def native_string_to_counts(s: str) -> Optional[np.ndarray]:
    """C++ parse of one COCO counts string -> int64 run sequence (None when
    the native lib is unavailable). ~100x the Python decoder's speed — at
    COCO-20K scale string parsing would otherwise dominate the evaluator."""
    lib = load_rle_lib()
    if lib is None:
        return None
    raw = s.encode("ascii")
    out = np.empty(len(raw) + 1, np.int64)
    n = lib.rle_string_to_counts(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(out))
    assert n >= 0, "malformed RLE counts string"
    return out[:n]


def native_rle_iou(
    dt_counts: List[np.ndarray],  # per-dt run-length sequences (int64)
    gt_counts: List[np.ndarray],  # per-gt run-length sequences (int64)
    iscrowd: List[bool],
) -> Optional[np.ndarray]:
    """C++ pairwise mask IoU straight from RLE counts (two-pointer run merge,
    the pycocotools maskApi approach — no densify). -> [n_dt, n_gt] float64,
    or None when the native lib is unavailable."""
    lib = load_rle_lib()
    if lib is None:
        return None
    nd, ng = len(dt_counts), len(gt_counts)
    if nd == 0 or ng == 0:
        return np.zeros((nd, ng), np.float64)
    sd = max(len(c) for c in dt_counts)
    sg = max(len(c) for c in gt_counts)
    dpad = np.zeros((nd, sd), np.int64)
    for i, c in enumerate(dt_counts):
        dpad[i, : len(c)] = c
    gpad = np.zeros((ng, sg), np.int64)
    for i, c in enumerate(gt_counts):
        gpad[i, : len(c)] = c
    n_dt = np.asarray([len(c) for c in dt_counts], np.int32)
    n_gt = np.asarray([len(c) for c in gt_counts], np.int32)
    crowd = np.asarray(iscrowd, np.uint8)
    out = np.zeros((nd, ng), np.float64)
    lib.rle_iou_batch(
        dpad.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_dt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nd, sd,
        gpad.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), ng, sg,
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def native_encode_batch(masks: np.ndarray) -> Optional[List[str]]:
    """C++ batch encode of [n, h, w] masks -> list of counts strings."""
    lib = load_rle_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(masks.astype(np.uint8))
    n, h, w = m.shape
    cap = 2 * n * h * w + 64 * n
    out = ctypes.create_string_buffer(cap)
    offsets = (ctypes.c_int * n)()
    total = lib.rle_encode_batch(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, out, cap,
        offsets)
    assert total >= 0, "rle_encode_batch overflow"
    bounds = list(offsets) + [total]
    raw = out.raw
    return [raw[bounds[i]:bounds[i + 1]].decode("ascii") for i in range(n)]
