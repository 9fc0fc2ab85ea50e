"""Device (jittable) bilateral solver == host scipy oracle
(SURVEY.md section 7 hard part 3 / section 2.3 sparse-CG row)."""
import numpy as np

import jax.numpy as jnp

from zutis_tpu.ops import bilateral as host
from zutis_tpu.ops import bilateral_device as dev


def _scene(seed=0, h=48, w=64):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.float32)
    # piecewise-constant regions + noise: gives the grid real structure
    img[:, : w // 2] = (40, 90, 160)
    img[:, w // 2:] = (200, 140, 60)
    img[h // 3: 2 * h // 3, w // 4: 3 * w // 4] = (90, 200, 90)
    img += rng.randn(h, w, 3) * 6
    img = np.clip(img, 0, 255)
    target = np.zeros((h, w), np.float32)
    target[h // 3 - 2: 2 * h // 3 + 2, w // 4 - 3: 3 * w // 4 + 3] = 1.0
    return img, target


def test_soft_output_matches_host_oracle():
    img, target = _scene()
    soft_host, _ = host.bilateral_solver_output(img.astype(np.uint8), target)
    soft_dev = np.asarray(dev.bilateral_solve_device(
        jnp.asarray(img), jnp.asarray(target)))
    # scipy CG early-stops on rtol and the oracle quantises YUV in float64
    # vs the device's float32 — pixels exactly on a cell boundary may land
    # in a neighbouring grid cell, so compare distribution-wise: tiny mean
    # error, few outlier pixels, thresholded agreement almost everywhere
    d = np.abs(soft_dev - soft_host)
    assert d.mean() < 2e-3
    assert (d > 0.05).mean() < 0.01
    agree = (soft_dev > 0.5) == (soft_host > 0.5)
    assert agree.mean() > 0.99


def test_refined_mask_matches_host_oracle():
    img, target = _scene(seed=1)
    _, refined_host = host.bilateral_solver_output(
        img.astype(np.uint8), target)
    _, refined_dev = dev.bilateral_solver_output_device(
        jnp.asarray(img), jnp.asarray(target))
    refined_dev = np.asarray(refined_dev)
    iou = (refined_dev & refined_host).sum() / max(
        (refined_dev | refined_host).sum(), 1)
    assert iou > 0.98, iou


def test_hole_fill_and_component_selection():
    """Synthetic soft map with a hole and two components: the device refine
    must fill the hole and keep the larger foreground component (background
    is the global largest)."""
    from scipy import ndimage

    soft = np.zeros((40, 50), np.float32)
    soft[5:25, 5:30] = 1.0     # big component ...
    soft[10:15, 10:20] = 0.0   # ... with a hole
    soft[30:36, 40:48] = 1.0   # small component
    got = np.asarray(dev.refine_mask_device(jnp.asarray(soft)))

    binary = ndimage.binary_fill_holes(soft > 0.5)
    labeled, n = ndimage.label(binary)
    sizes = [np.sum(labeled == i) for i in range(n + 1)]
    want = labeled == np.argsort(sizes)[-2]
    np.testing.assert_array_equal(got, want)
    # the hole was filled
    assert got[12, 15]
    # the small component was dropped
    assert not got[32, 44]


def test_refine_no_foreground_returns_ones():
    soft = np.zeros((16, 16), np.float32)
    got = np.asarray(dev.refine_mask_device(jnp.asarray(soft)))
    assert got.all()
