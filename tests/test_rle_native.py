"""C++ RLE codec (native/rle.cc) vs the numpy codec (ops/rle.py).

Two independent implementations of the published COCO counts format written
from the spec — byte-identical agreement on random and structured masks is
the strongest oracle available in this image (pycocotools itself is not
installed; SURVEY.md section 7 hard part 7)."""
import numpy as np
import pytest

from zutis_tpu.native import (
    load_rle_lib,
    native_decode,
    native_encode,
    native_encode_batch,
)
from zutis_tpu.ops import rle as rle_ops

pytestmark = pytest.mark.skipif(
    load_rle_lib() is None, reason="no C++ toolchain for librle.so"
)


def _random_masks(rng, n=24):
    masks = []
    for _ in range(n):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        kind = rng.integers(0, 4)
        if kind == 0:
            m = (rng.random((h, w)) < 0.5).astype(np.uint8)
        elif kind == 1:
            m = np.zeros((h, w), np.uint8)
        elif kind == 2:
            m = np.ones((h, w), np.uint8)
        else:
            m = np.zeros((h, w), np.uint8)
            m[h // 4:max(h // 4 + 1, 3 * h // 4),
              w // 4:max(w // 4 + 1, 3 * w // 4)] = 1
        masks.append(m)
    return masks


def test_counts_strings_byte_identical():
    rng = np.random.default_rng(0)
    for m in _random_masks(rng):
        py = rle_ops.encode(m)["counts"]
        cc = native_encode(m)
        assert py == cc, (m.shape, py, cc)


def test_decode_roundtrip_cross():
    """Python-encoded -> C++-decoded and vice versa."""
    rng = np.random.default_rng(1)
    for m in _random_masks(rng):
        h, w = m.shape
        py_rle = rle_ops.encode(m)
        back = native_decode(py_rle["counts"], h, w)
        np.testing.assert_array_equal(back, m)
        cc_counts = native_encode(m)
        back_py = rle_ops.decode({"size": [h, w], "counts": cc_counts})
        np.testing.assert_array_equal(back_py, m)


def test_batch_encode_matches_single():
    rng = np.random.default_rng(2)
    masks = np.stack([
        (rng.random((31, 17)) < 0.4).astype(np.uint8) for _ in range(8)
    ])
    got = native_encode_batch(masks)
    want = [rle_ops.encode(m)["counts"] for m in masks]
    assert got == want
