"""Parity tests for zutis_tpu.ops.resize against torch.nn.functional.interpolate
(the reference's interpolation backend; SURVEY.md 2.3)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from zutis_tpu.ops.resize import interpolate, resize_2d


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((24, 24), (48, 48)), ((24, 24), (17, 31)), ((14, 14), (24, 24)),
     ((96, 96), (384, 384)), ((7, 9), (14, 18))],
)
def test_matches_torch(mode, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode=mode,
                         align_corners=False).numpy()
    got = np.asarray(interpolate(jnp.asarray(x), size=out_hw, mode=mode))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scale_factor_x2():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 12, 10).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="bilinear",
                         align_corners=False).numpy()
    got = np.asarray(interpolate(jnp.asarray(x), scale_factor=2, mode="bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_identity():
    x = jnp.arange(24.0).reshape(1, 1, 4, 6)
    np.testing.assert_array_equal(np.asarray(resize_2d(x, (4, 6))), np.asarray(x))
