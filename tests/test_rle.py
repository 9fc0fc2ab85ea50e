"""RLE codec round-trip and known-value tests (byte format per the COCO spec)."""
import numpy as np

from zutis_tpu.ops import rle


def test_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(20):
        h, w = rng.randint(1, 40, 2)
        m = (rng.rand(h, w) > 0.5).astype(np.uint8)
        r = rle.encode(m)
        back = rle.decode(r)
        np.testing.assert_array_equal(back, m)
        assert rle.area(r) == m.sum()


def test_roundtrip_structured():
    m = np.zeros((20, 30), np.uint8)
    m[3:15, 5:25] = 1
    m[8:10, 10:12] = 0
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)
    assert rle.area(r) == int(m.sum())


def test_all_zero_and_all_one():
    z = np.zeros((4, 5), np.uint8)
    o = np.ones((4, 5), np.uint8)
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    np.testing.assert_array_equal(rle.decode(rle.encode(o)), o)


def test_counts_are_column_major():
    # single pixel at (row=1, col=0) of a 3x2 mask: F-order index 1
    m = np.zeros((3, 2), np.uint8)
    m[1, 0] = 1
    counts = rle._counts_from_mask(m)
    np.testing.assert_array_equal(counts, [1, 1, 4])


def test_uncompressed_counts_accepted():
    m = rle.decode({"size": [3, 2], "counts": [1, 1, 4]})
    want = np.zeros((3, 2), np.uint8)
    want[1, 0] = 1
    np.testing.assert_array_equal(m, want)


def test_leb128_spec_small_values():
    # values < 16 with no continuation encode as single chars (value + 48)
    assert rle._compress_counts([5]) == chr(5 + 48)
    np.testing.assert_array_equal(rle._decompress_counts(chr(5 + 48)), [5])
    # first three counts are raw; from the 4th on, delta vs counts[i-2]
    s = rle._compress_counts([2, 3, 7])
    assert s == chr(2 + 48) + chr(3 + 48) + chr(7 + 48)
    np.testing.assert_array_equal(rle._decompress_counts(s), [2, 3, 7])
    s4 = rle._compress_counts([2, 3, 7, 3])
    # 4th count stored as 3 - 3 = 0
    assert s4 == chr(2 + 48) + chr(3 + 48) + chr(7 + 48) + chr(48)
    np.testing.assert_array_equal(rle._decompress_counts(s4), [2, 3, 7, 3])


def test_mask_iou_and_crowd():
    a = np.zeros((10, 10), np.uint8); a[:5] = 1
    b = np.zeros((10, 10), np.uint8); b[2:7] = 1
    ious = rle.mask_iou(a[None], b[None])
    np.testing.assert_allclose(ious[0, 0], 30 / 70, rtol=1e-6)
    crowd = rle.mask_iou(a[None], b[None], iscrowd=[True])
    np.testing.assert_allclose(crowd[0, 0], 30 / 50, rtol=1e-6)


def test_bbox():
    m = np.zeros((8, 8), np.uint8)
    m[2:5, 3:7] = 1
    assert rle.to_bbox(m) == [3.0, 2.0, 6.0, 4.0]
