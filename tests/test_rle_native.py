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


def test_packed_batch_matches_python_codec():
    """Device bit-packing + C++ word-scan == numpy codec, byte for byte,
    including bbox/area sidecars — exact native windows."""
    import jax.numpy as jnp

    from zutis_tpu.native import native_encode_packed
    from zutis_tpu.postproc.instance import (
        col_stride_bits, pack_masks_fortran,
    )

    rng = np.random.default_rng(3)
    for m in _random_masks(rng, n=16):
        h, w = m.shape
        packed = np.asarray(pack_masks_fortran(jnp.asarray(m[None] > 0)))
        strings, bboxes, areas = native_encode_packed(
            packed, np.array([0]), col_stride_bits(h),
            np.array([h]), np.array([w]))
        want = rle_ops.encode(m)
        assert strings[0] == want["counts"], (h, w)
        assert areas[0] == int(m.sum())
        if m.any():
            assert [float(v) for v in bboxes[0]] == rle_ops.to_bbox(m)


def test_packed_batch_windowed_bucket():
    """Bucket-padded masks encode only their native (h, w) window — the
    batched-eval layout (engine/batched_eval.py)."""
    import jax.numpy as jnp

    from zutis_tpu.native import native_encode_packed
    from zutis_tpu.postproc.instance import pack_masks_fortran

    rng = np.random.default_rng(4)
    Hb, Wb = 64, 48
    n = 6
    masks = np.zeros((n, Hb, Wb), bool)
    hs = rng.integers(1, Hb + 1, n).astype(np.int32)
    ws = rng.integers(1, Wb + 1, n).astype(np.int32)
    for i in range(n):
        masks[i, :hs[i], :ws[i]] = rng.random((hs[i], ws[i])) < 0.6
    packed = np.asarray(pack_masks_fortran(jnp.asarray(masks)))
    strings, bboxes, areas = native_encode_packed(
        packed, np.arange(n), Hb, hs, ws)
    for i in range(n):
        native = masks[i, :hs[i], :ws[i]].astype(np.uint8)
        assert strings[i] == rle_ops.encode(native)["counts"], i
        assert areas[i] == int(native.sum())


def test_packed_fallback_without_native(monkeypatch):
    """No toolchain: the packed path unpacks on host and uses the numpy
    codec — same predictions."""
    import jax.numpy as jnp

    import zutis_tpu.native as native_mod
    from zutis_tpu.postproc.instance import (
        col_stride_bits, instances_to_coco, instances_to_coco_packed,
        pack_masks_fortran,
    )

    monkeypatch.setattr(native_mod, "native_encode_packed",
                        lambda *a, **k: None)
    rng = np.random.default_rng(6)
    b, q, H, W = 2, 4, 21, 18
    masks = rng.random((b, q, H, W)) < 0.4
    dev = {
        "masks": masks,
        "scores": rng.random((b, q)).astype(np.float32),
        "category_ids": rng.integers(0, 3, (b, q)),
        "keep": np.ones((b, q), bool),
    }
    want = instances_to_coco(dev, image_ids=[1, 2])
    packed_dev = {
        "masks_packed": np.asarray(pack_masks_fortran(jnp.asarray(masks))),
        "scores": dev["scores"],
        "category_ids": dev["category_ids"],
        "keep": dev["keep"],
        "col_stride_bits": col_stride_bits(H),
    }
    got = instances_to_coco_packed(packed_dev, image_ids=[1, 2],
                                   sizes=[(H, W)] * 2)
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert g["segmentation"]["counts"] == w_["segmentation"]["counts"]
        assert g["bbox"] == w_["bbox"]


def test_instances_to_coco_packed_equals_dense():
    """The packed assembly path produces the same predictions as the dense
    instances_to_coco on identical device output."""
    import jax.numpy as jnp

    from zutis_tpu.postproc.instance import (
        col_stride_bits, instances_to_coco, instances_to_coco_packed,
        pack_masks_fortran,
    )

    rng = np.random.default_rng(5)
    b, q, H, W = 3, 5, 37, 29
    masks = rng.random((b, q, H, W)) < 0.3
    masks[0, 1] = False  # empty kept mask is skipped by both paths
    dev = {
        "masks": masks,
        "scores": rng.random((b, q)).astype(np.float32),
        "category_ids": rng.integers(0, 7, (b, q)),
        "keep": rng.random((b, q)) < 0.6,
    }
    want = instances_to_coco(dev, image_ids=[10, 11, 12],
                             new_label_id_to_old_label_id={i: i + 100
                                                           for i in range(7)})
    packed_dev = {
        "masks_packed": np.asarray(pack_masks_fortran(jnp.asarray(masks))),
        "scores": dev["scores"],
        "category_ids": dev["category_ids"],
        "keep": dev["keep"],
        "col_stride_bits": col_stride_bits(H),
    }
    got = instances_to_coco_packed(
        packed_dev, image_ids=[10, 11, 12], sizes=[(H, W)] * 3,
        new_label_id_to_old_label_id={i: i + 100 for i in range(7)})
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert g["category_id"] == w_["category_id"]
        assert g["image_id"] == w_["image_id"]
        assert g["segmentation"]["counts"] == w_["segmentation"]["counts"]
        assert g["segmentation"]["size"] == w_["segmentation"]["size"]
        assert g["bbox"] == w_["bbox"]
        assert abs(g["score"] - w_["score"]) < 1e-6
        assert g["image_size"] == w_["image_size"]


def test_device_rle_counts_equals_dense():
    """Device counts path (compaction + run extraction + C++ compression)
    == dense instances_to_coco on identical inputs, INCLUDING cap-overflow
    fallbacks (tiny k_cap/col_cap/max_runs force them) and bucket-padded
    native windows."""
    import jax.numpy as jnp

    from zutis_tpu.ops.rle_device import rle_encode_masks_device
    from zutis_tpu.postproc.instance import (
        col_stride_bits, instances_to_coco, instances_to_coco_counts,
        pack_masks_fortran,
    )

    rng = np.random.RandomState(0)
    B, Q, H, W = 3, 8, 41, 37
    masks = np.zeros((B, Q, H, W), bool)
    for b in range(B):
        for q in range(Q):
            if (b + q) % 5 == 4:
                masks[b, q] = rng.rand(H, W) > 0.5  # noisy -> overflow
            else:
                y, x = rng.randint(0, H - 6), rng.randint(0, W - 6)
                masks[b, q, y:y + 6, x:x + 6] = True
    keep = rng.rand(B, Q) < 0.8
    scores = rng.rand(B, Q).astype(np.float32)
    cats = rng.randint(0, 5, (B, Q))

    dense = instances_to_coco(
        {"masks": masks, "scores": scores, "category_ids": cats,
         "keep": keep}, image_ids=[1, 2, 3])

    rle = rle_encode_masks_device(
        jnp.asarray(masks), jnp.asarray(keep),
        k_cap=4, col_cap=4, max_runs=64)
    assert int(np.asarray(rle["overflow"]).sum()) > 0  # fallbacks exercised
    assert int(np.asarray(rle["n_kept"]).max()) > 4
    res = {k: np.asarray(v) for k, v in rle.items()}
    res.update(scores=scores, category_ids=cats, keep=keep)
    got = instances_to_coco_counts(
        res, image_ids=[1, 2, 3], sizes=[(H, W)] * 3,
        dev_packed=pack_masks_fortran(jnp.asarray(masks)),
        col_stride_bits_packed=col_stride_bits(H))
    assert len(got) == len(dense)
    for g, w_ in zip(got, dense):
        assert g["image_id"] == w_["image_id"]
        assert g["category_id"] == w_["category_id"]
        assert g["segmentation"]["counts"] == w_["segmentation"]["counts"]
        assert g["segmentation"]["size"] == w_["segmentation"]["size"]
        assert g["bbox"] == w_["bbox"]
        assert abs(g["score"] - w_["score"]) < 1e-6

    # windowed buckets: native (h, w) < bucket shape
    Hb, Wb = 48, 40
    m2 = np.zeros((2, 4, Hb, Wb), bool)
    hw = [(33, 29), (48, 40)]
    for b in range(2):
        h, w = hw[b]
        for q in range(4):
            y, x = rng.randint(0, h - 5), rng.randint(0, w - 5)
            m2[b, q, y:y + 5, x:x + 5] = True
    k2 = np.ones((2, 4), bool)
    s2 = rng.rand(2, 4).astype(np.float32)
    c2 = rng.randint(0, 3, (2, 4))
    dense2 = []
    for b in range(2):
        h, w = hw[b]
        dense2.extend(instances_to_coco(
            {"masks": m2[b:b + 1, :, :h, :w], "scores": s2[b:b + 1],
             "category_ids": c2[b:b + 1], "keep": k2[b:b + 1]},
            image_ids=[10 + b]))
    rle2 = rle_encode_masks_device(
        jnp.asarray(m2), jnp.asarray(k2),
        native_hw=jnp.asarray(np.array(hw, np.int32)),
        k_cap=4, col_cap=4, max_runs=64)
    res2 = {k: np.asarray(v) for k, v in rle2.items()}
    res2.update(scores=s2, category_ids=c2, keep=k2)
    got2 = instances_to_coco_counts(res2, image_ids=[10, 11], sizes=hw)
    assert len(got2) == len(dense2)
    for g, w_ in zip(got2, dense2):
        assert g["segmentation"]["counts"] == w_["segmentation"]["counts"]
        assert g["bbox"] == w_["bbox"]


def test_host_blob_roundtrip():
    """pack_host_blob -> unpack_host_blob restores every eval output
    bit-exactly (single-transfer host boundary, ops/rle_device.py)."""
    import jax.numpy as jnp

    from zutis_tpu.ops.rle_device import (
        pack_host_blob, rle_encode_masks_device, unpack_host_blob,
    )

    rng = np.random.default_rng(7)
    B, Q, H, W = 2, 6, 24, 16
    masks = rng.random((B, Q, H, W)) < 0.4
    keep = rng.random((B, Q)) < 0.5
    scores = rng.random((B, Q)).astype(np.float32)
    cats = rng.integers(0, 9, (B, Q)).astype(np.int32)
    rle = rle_encode_masks_device(
        jnp.asarray(masks), jnp.asarray(keep), k_cap=4, col_cap=4,
        max_runs=32)
    blob = pack_host_blob(jnp.asarray(scores), jnp.asarray(cats),
                          jnp.asarray(keep), rle)
    out = unpack_host_blob(np.asarray(blob))
    np.testing.assert_array_equal(out["scores"], scores)
    np.testing.assert_array_equal(out["category_ids"], cats)
    np.testing.assert_array_equal(out["keep"], keep)
    for k in ("q_index", "valid", "n_kept", "counts", "n_runs",
              "overflow", "bbox", "area"):
        np.testing.assert_array_equal(out[k], np.asarray(rle[k]),
                                      err_msg=k)


def test_counts_iou_matches_dense():
    """RLE-space IoU (C++ two-pointer merge AND the numpy coverage-function
    fallback) == dense mask_iou, including the crowd denominator."""
    import zutis_tpu.native as native_mod
    from zutis_tpu.ops.rle import _counts_from_mask

    rng = np.random.default_rng(7)
    h, w = 37, 29
    dts = np.stack([
        (rng.random((h, w)) < p).astype(np.uint8)
        for p in (0.3, 0.5, 0.7, 0.0)
    ])
    gts = np.stack([
        (rng.random((h, w)) < p).astype(np.uint8)
        for p in (0.4, 0.6, 1.0)
    ])
    crowd = [False, True, False]
    dense = rle_ops.mask_iou(dts, gts, iscrowd=crowd)
    dc = [_counts_from_mask(m) for m in dts]
    gc = [_counts_from_mask(m) for m in gts]

    got_native = rle_ops.counts_iou(dc, gc, iscrowd=crowd)
    np.testing.assert_allclose(got_native, dense, rtol=0, atol=1e-12)

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(native_mod, "native_rle_iou", lambda *a, **k: None)
        got_py = rle_ops.counts_iou(dc, gc, iscrowd=crowd)
    np.testing.assert_allclose(got_py, dense, rtol=0, atol=1e-12)


def test_native_string_parse_matches_python():
    from zutis_tpu.native import native_string_to_counts
    from zutis_tpu.ops.rle import _decompress_counts

    rng = np.random.default_rng(11)
    for m in _random_masks(rng, n=12):
        s = rle_ops.encode(m)["counts"]
        got = native_string_to_counts(s)
        np.testing.assert_array_equal(got, _decompress_counts(s))


def test_host_blob_escape_path_big_runs():
    """Escape-table coverage at sizes where it actually fires: at real
    eval buckets most masks have a leading empty span > 2^16 pixels, so
    the paired-uint16 counts transport must reconstruct runs >= 2^16 via
    esc_pos/esc_hi (ops/rle_device.py N_ESC escapes per slot)."""
    import jax.numpy as jnp

    from zutis_tpu.ops.rle_device import (
        pack_host_blob, rle_encode_masks_device, unpack_host_blob,
    )

    H, W = 300, 260  # H*W = 78,000 > 2^16
    masks = np.zeros((1, 2, H, W), bool)
    # query 0: one blob far into Fortran order -> leading run ~70k > 65535
    masks[0, 0, 150:160, 230:240] = True
    # query 1: blob at the start AND one at the end -> a big MIDDLE run
    masks[0, 1, 0:4, 0:4] = True
    masks[0, 1, 290:296, 250:256] = True
    keep = np.ones((1, 2), bool)
    scores = np.asarray([[0.9, 0.8]], np.float32)
    cats = np.asarray([[1, 2]], np.int32)
    rle = rle_encode_masks_device(
        jnp.asarray(masks), jnp.asarray(keep), k_cap=2, col_cap=16,
        max_runs=128)
    counts_dev = np.asarray(rle["counts"])
    assert (counts_dev > 65535).any(), "test did not exercise big runs"
    assert not np.asarray(rle["overflow"]).any()
    blob = pack_host_blob(jnp.asarray(scores), jnp.asarray(cats),
                          jnp.asarray(keep), rle)
    out = unpack_host_blob(np.asarray(blob))
    np.testing.assert_array_equal(out["counts"], counts_dev)
    # decoded counts reproduce the dense masks exactly
    from zutis_tpu.ops import rle as rle_ops

    for k in range(2):
        n = int(np.asarray(rle["n_runs"])[0, k])
        counts = [int(c) for c in out["counts"][0, k, :n]]
        # device counts end at the last set pixel; the host assembler
        # (instances_to_coco_counts) appends the trailing empty span
        tail = H * W - sum(counts)
        if tail:
            counts.append(tail)
        dec = rle_ops.decode({"size": [H, W], "counts": counts})
        np.testing.assert_array_equal(dec.astype(bool), masks[0, k])


def test_host_blob_escape_overflow_flags_dense_fallback():
    """More than N_ESC (8) runs >= 2^16 in one mask cannot ride the paired
    transport: the slot must come back with overflow=True so callers take
    the dense-mask fallback instead of silently corrupting the RLE."""
    import jax.numpy as jnp

    from zutis_tpu.ops.rle_device import (
        pack_host_blob, rle_encode_masks_device, unpack_host_blob,
    )

    H, W = 840, 800  # 672,000 pixels
    masks = np.zeros((1, 1, H, W), bool)
    # 10 isolated single-pixel islands spaced > 2^16 apart in Fortran
    # order -> >= 9 zero-gap runs above 65535
    flat = np.zeros(H * W, bool)
    for i in range(10):
        flat[i * 66000] = True
    masks[0, 0] = flat.reshape(W, H).T  # Fortran order view
    keep = np.ones((1, 1), bool)
    rle = rle_encode_masks_device(
        jnp.asarray(masks), jnp.asarray(keep), k_cap=1, col_cap=16,
        max_runs=64)
    blob = pack_host_blob(
        jnp.asarray(np.ones((1, 1), np.float32)),
        jnp.asarray(np.zeros((1, 1), np.int32)),
        jnp.asarray(keep), rle)
    out = unpack_host_blob(np.asarray(blob))
    assert bool(out["overflow"][0, 0]), \
        "esc_overflow did not flag the >N_ESC-big-runs mask"
