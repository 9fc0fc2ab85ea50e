"""SelfMask forward shape/behaviour tests + bilateral solver sanity
(the solver should snap a sloppy mask to a color region)."""
import numpy as np

import jax
import jax.numpy as jnp

from zutis_tpu.models.selfmask import SelfMask, pad_to_patch_multiple
from zutis_tpu.ops.bilateral import bilateral_solver_output


def test_selfmask_forward_and_best_masks():
    from zutis_tpu.models import selfmask as sm

    # default 12-layer encoder depth, but tiny 32-dim width: still fast
    small = sm.SelfMask(n_queries=4, n_decoder_layers=2, embed_dim=32,
                        heads=2, patch_size=8)
    x = np.random.RandomState(0).randn(1, 3, 32, 40).astype(np.float32)
    x = pad_to_patch_multiple(x, 8)
    params = small.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = small.apply({"params": params}, jnp.asarray(x))
    q = 4
    h, w = 32 // 8 * 2, 40 // 8 * 2  # x2 pixel-decoder upsample
    assert out["mask_pred"].shape == (1, q, h, w)
    assert out["objectness"].shape == (1, q)
    assert 0.0 <= float(out["mask_pred"].min()) <= 1.0

    best = small.apply({"params": params}, jnp.asarray(x),
                       method=sm.SelfMask.best_masks)
    assert best.shape == (1, 32, 40)
    assert best.dtype == jnp.uint8


def test_bilateral_solver_refines_to_color_region():
    rng = np.random.RandomState(0)
    H = W = 48
    img = np.full((H, W, 3), 30, np.uint8)
    img[8:40, 8:40] = [200, 60, 60]  # red square on dark background
    img = (img.astype(np.int32)
           + rng.randint(-8, 8, img.shape)).clip(0, 255).astype(np.uint8)
    # sloppy target: roughly the square but eroded + shifted
    target = np.zeros((H, W), np.float64)
    target[14:36, 10:34] = 1.0

    soft, refined = bilateral_solver_output(img, target)
    assert soft.shape == (H, W)
    # the refined mask should cover most of the red square
    square = np.zeros((H, W), bool)
    square[8:40, 8:40] = True
    inter = (refined & square).sum()
    union = (refined | square).sum()
    assert inter / union > 0.5, f"IoU too low: {inter / union:.3f}"


def test_pad_to_patch_multiple():
    x = np.ones((1, 3, 30, 41), np.float32)
    p = pad_to_patch_multiple(x, 8)
    assert p.shape == (1, 3, 32, 48)
    assert p[..., 30:, :].sum() == 0
