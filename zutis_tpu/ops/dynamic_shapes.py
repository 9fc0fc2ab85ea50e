"""Per-sample dynamic-geometry ops under static padded shapes.

XLA requires static shapes, but evaluation images arrive at per-image native
resolutions (reference trainer.py:294-375 runs batch-1 at each image's own
(H, W)). The bucketed batched evaluator (engine/batched_eval.py) pads images
to a small set of bucket shapes and keeps each sample's NATIVE geometry as
data. Everything here consumes a static padded extent plus traced per-sample
native sizes and reproduces exactly what the per-image program computes on
the valid window:

  - `dynamic_resize_matrix`: the torch-parity interpolation matrices of
    ops/resize.py, rebuilt with jnp so the source extent can be a traced
    value. One static [out, in_pad] matrix per sample whose rows only touch
    clamped native source indices — the matmul IS the resize (MXU work, no
    gathers), identical to `_resize_matrix` when the native size is static.
  - `replicate_edges`: clamps the token grid to the native window
    (out[i, j] = x[min(i, h-1), min(j, w-1)]), which makes a subsequent
    align_corners=False x2 upsample of the padded grid agree exactly with
    the native upsample on the valid window (border taps clamp to the same
    values the native program clamps to).
  - `sine_pos_embed_dynamic`: models/pos_embed.py with the normalising
    denominator taken from the per-sample native grid, not the padded one
    (reference networks/positional_embedding.py:34-38 normalises by the
    true feature extent).
  - `interpolate_pos_embed_batched`: per-sample bicubic CLIP pos-emb
    interpolation to the native grid (incl. the reference's +0.1
    scale-factor fudge, networks/clip_arch.py:357-374), placed at the
    top-left of the padded grid.
  - `token_valid_mask`: [b, hp*wp] validity of each padded token.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def _cubic_kernel(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    return jnp.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        jnp.where(
            ax < 2.0,
            a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a,
            0.0,
        ),
    )


def dynamic_resize_matrix(
    out_size: int,
    in_pad: int,
    in_native: jnp.ndarray,  # traced scalar (int or float)
    mode: str = "linear",
    scale: jnp.ndarray | None = None,  # optional traced src/dst ratio
) -> jnp.ndarray:
    """[out_size, in_pad] float32 interpolation matrix; same semantics as
    ops/resize.py:_resize_matrix with a traced source extent."""
    in_native = in_native.astype(jnp.float32)
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if scale is None:
        scale = in_native / out_size
    src = (dst + 0.5) * scale - 0.5
    f = jnp.floor(src)
    t = src - f
    cols = jnp.arange(in_pad, dtype=jnp.float32)[None, :]  # [1, in_pad]
    taps = (0, 1) if mode == "linear" else (-1, 0, 1, 2)
    mat = jnp.zeros((out_size, in_pad), jnp.float32)
    for tap in taps:
        if mode == "linear":
            w = 1.0 - t if tap == 0 else t
        else:
            w = _cubic_kernel(t - tap)
        idx = jnp.clip(f + tap, 0.0, in_native - 1.0)  # [out]
        mat = mat + (cols == idx[:, None]).astype(jnp.float32) * w[:, None]
    return mat


def batched_resize_native(
    x: jnp.ndarray,  # [b, c, hp, wp]
    native_hw: jnp.ndarray,  # [b, 2] source extents (<= hp, wp)
    out_hw: Tuple[int, int],
    mode: str = "linear",
) -> jnp.ndarray:
    """Per-sample resize of each valid [h_i, w_i] window to the static
    (H_out, W_out); values outside the valid window never contribute
    (interpolation taps are clamped into the native extent)."""
    _, _, hp, wp = x.shape
    H, W = out_hw
    y32 = x.astype(jnp.float32)
    wh = _vmapped_matrix(H, hp, native_hw[:, 0], mode)
    ww = _vmapped_matrix(W, wp, native_hw[:, 1], mode)
    y = jnp.einsum("boh,bchw->bcow", wh, y32)
    y = jnp.einsum("bow,bchw->bcho", ww, y)
    return y.astype(x.dtype)


def _vmapped_matrix(out_size, in_pad, in_native_vec, mode):
    import jax

    return jax.vmap(
        lambda n: dynamic_resize_matrix(out_size, in_pad, n, mode)
    )(in_native_vec)


def replicate_edges(
    grid: jnp.ndarray,  # [b, hp, wp, c]
    native_hw: jnp.ndarray,  # [b, 2]
) -> jnp.ndarray:
    """out[b, i, j] = grid[b, min(i, h_b-1), min(j, w_b-1)]."""
    b, hp, wp, _ = grid.shape
    rows = jnp.minimum(
        jnp.arange(hp)[None, :], native_hw[:, 0:1] - 1
    )  # [b, hp]
    cols = jnp.minimum(jnp.arange(wp)[None, :], native_hw[:, 1:2] - 1)
    out = jnp.take_along_axis(grid, rows[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, cols[:, None, :, None], axis=2)
    return out


def sine_pos_embed_dynamic(
    hp: int,
    wp: int,
    num_pos_feats: int,
    native_hw: jnp.ndarray,  # [b, 2]
    temperature: float = 10000.0,
) -> jnp.ndarray:
    """[b, hp*wp, 2*num_pos_feats] — models/pos_embed.py:sine_pos_embed with
    the per-sample native extent as the normaliser."""
    eps = 1e-6
    scale = 2 * math.pi
    b = native_hw.shape[0]
    ys = jnp.arange(1, hp + 1, dtype=jnp.float32)
    xs = jnp.arange(1, wp + 1, dtype=jnp.float32)
    y = ys[None, :] / (native_hw[:, 0:1].astype(jnp.float32) + eps) * scale
    x = xs[None, :] / (native_hw[:, 1:2].astype(jnp.float32) + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    py = y[:, :, None] / dim_t  # [b, hp, npf]
    px = x[:, :, None] / dim_t  # [b, wp, npf]

    def interleave(p):
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], -1)

    py = interleave(py)[:, :, None, :]  # [b, hp, 1, npf]
    px = interleave(px)[:, None, :, :]  # [b, 1, wp, npf]
    py = jnp.broadcast_to(py, (b, hp, wp, num_pos_feats))
    px = jnp.broadcast_to(px, (b, hp, wp, num_pos_feats))
    pos = jnp.concatenate([py, px], axis=-1)  # y-features first
    return pos.reshape(b, hp * wp, 2 * num_pos_feats)


def interpolate_pos_embed_batched(
    pos_embed: jnp.ndarray,  # [1 + g*g, d] CLIP positional embedding
    native_hw: jnp.ndarray,  # [b, 2] native token grids
    pad_hw: Tuple[int, int],
) -> jnp.ndarray:
    """[b, 1 + hp*wp, d]: per-sample bicubic interpolation of the patch
    pos-emb to each native grid (reference +0.1 fudge), placed top-left in
    the padded grid; padded positions hold out-of-window garbage that the
    attention mask excludes."""
    import jax

    hp, wp = pad_hw
    cls_pe, patch_pe = pos_embed[:1], pos_embed[1:]
    hw, d = patch_pe.shape
    g = int(math.sqrt(hw))
    grid = patch_pe.reshape(g, g, d).astype(jnp.float32)

    def per_sample(nhw):
        h = nhw[0].astype(jnp.float32)
        w = nhw[1].astype(jnp.float32)
        # torch scale_factor path: coordinate scale = 1/sf, sf = (n + 0.1)/g
        wh = dynamic_resize_matrix(
            hp, g, jnp.asarray(float(g)), "cubic", scale=g / (h + 0.1)
        )
        ww = dynamic_resize_matrix(
            wp, g, jnp.asarray(float(g)), "cubic", scale=g / (w + 0.1)
        )
        return jnp.einsum("hg,gkd,wk->hwd", wh, grid, ww)

    pe = jax.vmap(per_sample)(native_hw)  # [b, hp, wp, d]
    b = pe.shape[0]
    pe = pe.reshape(b, hp * wp, d)
    cls = jnp.broadcast_to(cls_pe[None].astype(jnp.float32), (b, 1, d))
    return jnp.concatenate([cls, pe], axis=1)


def token_valid_mask(
    native_hw: jnp.ndarray, hp: int, wp: int
) -> jnp.ndarray:
    """[b, hp*wp] int32: 1 where the padded token index is inside the
    per-sample native grid."""
    rows = jnp.arange(hp)[None, :, None]  # [1, hp, 1]
    cols = jnp.arange(wp)[None, None, :]
    valid = (rows < native_hw[:, 0:1, None]) & (cols < native_hw[:, 1:2, None])
    b = native_hw.shape[0]
    return valid.reshape(b, hp * wp).astype(jnp.int32)
