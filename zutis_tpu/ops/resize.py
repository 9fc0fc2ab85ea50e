"""Torch-parity image interpolation as per-axis weight matmuls.

The reference pipeline depends on PyTorch `F.interpolate` semantics in three
hot places (see SURVEY.md): bicubic positional-embedding interpolation
(reference networks/clip_arch.py:357-374), bilinear patch-token upsampling
(networks/zutis.py:488-497), and bilinear mask up/down-sampling
(criterion.py:124, networks/zutis.py:367,424). mIoU parity is sensitive to the
exact kernel (SURVEY.md section 7, hard part 5), and `jax.image.resize`'s cubic
kernel uses a=-0.5 while torch uses a=-0.75, so we build our own.

TPU-first design: instead of gathers, each axis resize is a dense
[out_size, in_size] weight matrix (2 or 4 non-zeros per row) applied as a
matmul — the MXU does the interpolation. Weight matrices depend only on static
shapes, so they are computed with numpy at trace time and baked into the
compiled program as constants.

Semantics match `torch.nn.functional.interpolate(..., align_corners=False)`:
half-pixel source centers `src = (dst + 0.5) * in/out - 0.5` with replicate
(clamped) borders; cubic kernel is Keys with a = -0.75.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, scale: float | None = None
) -> np.ndarray:
    """[out_size, in_size] row-stochastic interpolation matrix (float32).

    `scale` overrides the src/dst ratio: torch uses `1/scale_factor` directly
    when `F.interpolate(..., scale_factor=s)` is called (instead of
    `in/out`), which matters for the reference's `+0.1` positional-embedding
    fudge factor (reference networks/clip_arch.py:366-371).
    """
    if in_size == out_size and scale is None:
        return np.eye(in_size, dtype=np.float32)
    if scale is None:
        scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "linear":
        f = np.floor(src)
        t = src - f
        for tap, w in ((0, 1.0 - t), (1, t)):
            idx = np.clip(f + tap, 0, in_size - 1).astype(np.int64)
            np.add.at(mat, (dst.astype(np.int64), idx), w)
    elif mode == "cubic":
        f = np.floor(src)
        t = src - f
        for tap in (-1, 0, 1, 2):
            w = _cubic_kernel(t - tap)
            idx = np.clip(f + tap, 0, in_size - 1).astype(np.int64)
            np.add.at(mat, (dst.astype(np.int64), idx), w)
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return mat.astype(np.float32)


def resize_2d(
    x: jnp.ndarray,
    size: Sequence[int],
    mode: str = "linear",
    scales: Sequence[float] | None = None,
) -> jnp.ndarray:
    """Resize the last two axes of `x` to `size` = (H, W).

    `mode` is "linear" (torch bilinear) or "cubic" (torch bicubic), both with
    align_corners=False semantics. Works for any leading batch/channel axes.
    `scales` optionally pins the (src/dst) coordinate scales per axis, matching
    torch's scale_factor code path.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = int(size[0]), int(size[1])
    if (h_in, w_in) == (h_out, w_out) and scales is None:
        return x
    dtype = x.dtype
    sh, sw = (None, None) if scales is None else scales
    wh = jnp.asarray(_resize_matrix(h_in, h_out, mode, sh))
    ww = jnp.asarray(_resize_matrix(w_in, w_out, mode, sw))
    y = x.astype(jnp.float32)
    # [..., h_in, w_in] -> [..., h_out, w_in] -> [..., h_out, w_out]
    y = jnp.einsum("oh,...hw->...ow", wh, y)
    y = jnp.einsum("ow,...hw->...ho", ww, y)
    return y.astype(dtype)


def interpolate(
    x: jnp.ndarray,
    size: Sequence[int] | None = None,
    scale_factor: float | Sequence[float] | None = None,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Drop-in analogue of `torch.nn.functional.interpolate` for NCHW inputs
    (align_corners=False). Accepts mode in {"bilinear", "bicubic"}."""
    mode = {"bilinear": "linear", "bicubic": "cubic"}.get(mode, mode)
    scales = None
    if size is None:
        assert scale_factor is not None
        if isinstance(scale_factor, (int, float)):
            scale_factor = (scale_factor, scale_factor)
        size = (
            int(np.floor(x.shape[-2] * scale_factor[0])),
            int(np.floor(x.shape[-1] * scale_factor[1])),
        )
        # torch (recompute_scale_factor=False) maps coordinates with the given
        # scale factor, not in/out — keep that exactly.
        scales = (1.0 / scale_factor[0], 1.0 / scale_factor[1])
    return resize_2d(x, size, mode=mode, scales=scales)
