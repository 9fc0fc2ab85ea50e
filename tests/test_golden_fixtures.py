"""Hand-derived golden fixtures for the RLE codec(s) and COCOeval.

VERDICT r2 task 5: both in-repo RLE codecs previously cross-validated only
each other; the fixtures in tests/fixtures/*.json were derived BY HAND from
the published formats (derivations recorded in the files), so a shared bias
between the implementations cannot satisfy them. The COCOeval scenarios pin
the full 12-stat summary for matching, ordering, crowd and area-range
behaviour against protocol-level hand computation."""
import json
import os

import numpy as np
import pytest

from zutis_tpu.engine.coco_eval import COCOEvaluator
from zutis_tpu.native import load_rle_lib, native_encode
from zutis_tpu.ops import rle as rle_ops

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def _mask_from_rows(rows):
    return np.array([[int(c) for c in r] for r in rows], np.uint8)


# ---------------- RLE golden vectors ----------------

def test_compress_counts_golden():
    fix = _load("rle_golden.json")
    for case in fix["counts_to_string"]:
        got = rle_ops._compress_counts(case["counts"])
        assert got == case["string"], (case["counts"], got, case["string"])


def test_decompress_counts_golden():
    fix = _load("rle_golden.json")
    for case in fix["counts_to_string"]:
        got = rle_ops._decompress_counts(case["string"]).tolist()
        assert got == case["counts"], (case["string"], got)


def test_mask_encode_golden_python():
    fix = _load("rle_golden.json")
    for case in fix["mask_to_counts"]:
        m = _mask_from_rows(case["mask_rows"])
        rle = rle_ops.encode(m)
        assert rle["counts"] == case["string"], case
        assert rle_ops._counts_from_mask(m).tolist() == case["counts"], case


@pytest.mark.skipif(load_rle_lib() is None,
                    reason="no C++ toolchain for librle.so")
def test_mask_encode_golden_native():
    fix = _load("rle_golden.json")
    for case in fix["mask_to_counts"]:
        m = _mask_from_rows(case["mask_rows"])
        assert native_encode(m) == case["string"], case


@pytest.mark.skipif(load_rle_lib() is None,
                    reason="no C++ toolchain for librle.so")
def test_mask_encode_golden_packed():
    import jax.numpy as jnp

    from zutis_tpu.native import native_encode_packed
    from zutis_tpu.postproc.instance import (
        col_stride_bits, pack_masks_fortran,
    )

    fix = _load("rle_golden.json")
    for case in fix["mask_to_counts"]:
        m = _mask_from_rows(case["mask_rows"])
        h, w = m.shape
        packed = np.asarray(pack_masks_fortran(jnp.asarray(m[None] > 0)))
        strings, _, _ = native_encode_packed(
            packed, np.array([0]), col_stride_bits(h),
            np.array([h]), np.array([w]))
        assert strings[0] == case["string"], case


def test_decode_golden_roundtrip():
    fix = _load("rle_golden.json")
    for case in fix["mask_to_counts"]:
        m = _mask_from_rows(case["mask_rows"])
        h, w = m.shape
        back = rle_ops.decode({"size": [h, w], "counts": case["string"]})
        np.testing.assert_array_equal(back, m)


# ---------------- COCOeval golden scenarios ----------------

@pytest.mark.parametrize(
    "scenario", _load("coco_eval_golden.json")["scenarios"],
    ids=lambda s: s["name"])
def test_coco_eval_golden(scenario):
    stats = COCOEvaluator(scenario["gt"]).evaluate(scenario["predictions"])
    for key, want in scenario["expected"].items():
        assert stats[key] == pytest.approx(want, abs=1e-9), (
            scenario["name"], key, stats[key], want)
