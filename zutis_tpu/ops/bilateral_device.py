"""Device-side (jittable) fast bilateral solver + connected components.

The same Barron-Poole algorithm as the host oracle (ops/bilateral.py; the
reference escapes to scipy.sparse CG + scipy.ndimage on CPU —
utils/bilateral_solver.py:127-195), re-designed for XLA's static shapes:

  - Grid construction without CSR matrices: pixel cell keys are mixed-radix
    packed (radix padded by +-1 so neighbour arithmetic cannot alias), then
    SORTED; unique ranks come from a cumsum over change flags, giving the
    pixel->vertex map. Capacity is npixels; unused tail slots hold an int32
    sentinel that keeps the unique-key array sorted for searchsorted.
  - splat = scatter-add over the pixel->vertex map; slice = gather back.
  - blur = 2*dim*x + one searchsorted gather per (dimension, +-1) stencil
    tap — the [1 2 1] blur as pure gathers, no sparse matrices.
  - bistochastisation + Jacobi-preconditioned CG in fori_loops (fixed 25
    iterations like the reference call site).
  - hole fill + connected components as iterative label propagation
    (min-neighbour flood fill in a while_loop) — the device equivalent of
    scipy.ndimage.binary_fill_holes / label; selection keeps the
    second-largest component counting background as a component, exactly
    like the reference's argsort over ndimage sizes
    (utils/bilateral_solver.py:185-195).

tests/test_bilateral_device.py checks the whole pipeline against the host
oracle. Runs under jit on TPU or CPU; used by data/pseudo_masks.py when
ZUTIS_TPU_BILATERAL=device.

Hardware-qualified round 5 (BILATERAL_QUALIFY.json, tools/
bilateral_qualify.py, real v5e at the 512x640 pseudo-labeling shape):
host scipy 408.8 ms/image vs device 2232.5 ms/image (mask IoU agreement
0.96 mean over 8 cases) — the gather/scatter-heavy grid ops and the
serial 25-iteration CG chain are VPU/latency-bound, not MXU work, so the
TPU loses to scipy by 5.5x and the host path stays the measured default.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_RGB2YUV = jnp.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], jnp.float32)
_YUV_OFFSET = jnp.array([0.0, 128.0, 128.0], jnp.float32)

_SENTINEL = jnp.iinfo(jnp.int32).max


def _grid_keys(image, sigma_spatial, sigma_luma, sigma_chroma):
    """[N] int32 packed cell keys + the per-dim strides (static radices)."""
    h, w = image.shape[:2]
    yuv = image.astype(jnp.float32) @ _RGB2YUV.T + _YUV_OFFSET
    ys, xs = jnp.mgrid[:h, :w]
    coords = [
        (xs / sigma_spatial).astype(jnp.int32).ravel(),
        (ys / sigma_spatial).astype(jnp.int32).ravel(),
        (yuv[..., 0] / sigma_luma).astype(jnp.int32).ravel(),
        (yuv[..., 1] / sigma_chroma).astype(jnp.int32).ravel(),
        (yuv[..., 2] / sigma_chroma).astype(jnp.int32).ravel(),
    ]
    # static radices with +-1 slack so neighbour key arithmetic never
    # aliases another cell (digits live in [1, radix-2])
    extents = [
        int(w // sigma_spatial) + 1,
        int(h // sigma_spatial) + 1,
        int(255 // sigma_luma) + 1,
        int(255 // sigma_chroma) + 1,
        int(255 // sigma_chroma) + 1,
    ]
    radices = [e + 2 for e in extents]
    total = 1
    for r in radices:
        total *= r
    assert total < 2 ** 31, (
        f"bilateral grid too large for int32 keys: {total}"
    )
    strides = []
    s = 1
    for r in reversed(radices):
        strides.append(s)
        s *= r
    strides = list(reversed(strides))
    key = jnp.zeros_like(coords[0])
    for c, st in zip(coords, strides):
        key = key + (c + 1) * st
    return key, jnp.asarray(strides, jnp.int32)


@partial(jax.jit, static_argnames=(
    "sigma_spatial", "sigma_luma", "sigma_chroma", "lam", "confidence_value",
    "cg_maxiter", "bistoch_iters"))
def bilateral_solve_device(
    image: jnp.ndarray,  # [H, W, 3] float/uint8 RGB
    target: jnp.ndarray,  # [H, W] float
    sigma_spatial: int = 16,
    sigma_luma: int = 16,
    sigma_chroma: int = 8,
    lam: float = 256.0,
    confidence_value: float = 0.999,
    cg_maxiter: int = 25,
    bistoch_iters: int = 10,
    a_diag_min: float = 1e-5,
) -> jnp.ndarray:
    """Soft solver output [H, W] float32 (the pre-threshold map)."""
    h, w = target.shape
    n = h * w
    keys, strides = _grid_keys(image, sigma_spatial, sigma_luma, sigma_chroma)

    sort_idx = jnp.argsort(keys)
    sorted_keys = keys[sort_idx]
    new_flag = jnp.concatenate([
        jnp.ones(1, jnp.int32),
        (sorted_keys[1:] != sorted_keys[:-1]).astype(jnp.int32),
    ])
    rank_sorted = jnp.cumsum(new_flag) - 1  # vertex id per sorted pixel
    inverse = jnp.zeros(n, jnp.int32).at[sort_idx].set(rank_sorted)
    # unique keys at their rank; tail stays at the sorted sentinel
    ukeys = jnp.full(n, _SENTINEL, jnp.int32).at[rank_sorted].set(sorted_keys)

    def splat(x):  # [N pixels] -> [N vertices]
        return jnp.zeros(n, jnp.float32).at[inverse].add(x)

    def slice_(y):  # [N vertices] -> [N pixels]
        return y[inverse]

    # one searchsorted per (dim, +-1): positions of neighbour cells
    nb_pos, nb_hit = [], []
    for d in range(5):
        for off in (-1, 1):
            nbk = jnp.where(
                ukeys == _SENTINEL, _SENTINEL, ukeys + off * strides[d])
            pos = jnp.searchsorted(ukeys, nbk)
            pos = jnp.clip(pos, 0, n - 1)
            hit = (ukeys[pos] == nbk) & (nbk != _SENTINEL)
            nb_pos.append(pos)
            nb_hit.append(hit)
    nb_pos = jnp.stack(nb_pos)  # [10, N]
    nb_hit = jnp.stack(nb_hit)

    def blur(x):  # [N vertices] -> [N vertices]
        out = 2 * 5 * x
        gathered = x[nb_pos]  # [10, N]
        out = out + jnp.sum(jnp.where(nb_hit, gathered, 0.0), axis=0)
        return out

    # bistochastisation (host oracle: _bistochastize)
    m = splat(jnp.ones(n, jnp.float32))
    valid = m > 0
    nvec = jnp.ones(n, jnp.float32)
    for _ in range(bistoch_iters):
        denom = blur(nvec)
        nvec = jnp.where(
            valid & (denom > 0), jnp.sqrt(nvec * m / jnp.maximum(denom, 1e-20)),
            0.0)
    mvec = nvec * blur(nvec)

    conf = jnp.full(n, confidence_value, jnp.float32)
    w_splat = splat(conf)
    a_diag = jnp.maximum(
        lam * (mvec - nvec * (2 * 5) * nvec) + w_splat, a_diag_min)

    def a_mv(y):
        return lam * (mvec * y - nvec * blur(nvec * y)) + w_splat * y

    b = splat(target.ravel().astype(jnp.float32) * conf)
    y0 = jnp.where(w_splat > 0, b / jnp.maximum(w_splat, 1e-20), 0.0)

    # Jacobi-preconditioned CG, fixed iteration count (reference cg_maxiter)
    def cg_step(_, state):
        y, r, z, p, rz = state
        ap = a_mv(p)
        denom = jnp.vdot(p, ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        y = y + alpha * p
        r = r - alpha * ap
        z = r / a_diag
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return y, r, z, p, rz_new

    r0 = b - a_mv(y0)
    z0 = r0 / a_diag
    state = (y0, r0, z0, z0, jnp.vdot(r0, z0))
    y, *_ = jax.lax.fori_loop(0, cg_maxiter, cg_step, state)
    return slice_(y).reshape(h, w)


def _propagate_labels(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Min-neighbour label flood within `mask` (4-connectivity) until
    convergence — the device analogue of scipy.ndimage.label's flood fill.
    Every round combines one neighbour spread with one POINTER JUMP
    (label <- label[label], valid because labels hold pixel indices whose
    own label is the component minimum so far), so winding components
    converge in ~log(diameter) rounds instead of O(diameter)."""
    big = jnp.iinfo(jnp.int32).max
    h, w = labels.shape
    n = h * w

    def spread(lab):
        padded = jnp.pad(lab, 1, constant_values=big)
        nb = jnp.minimum(
            jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
            jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:]),
        )
        return jnp.where(mask, jnp.minimum(lab, nb), big)

    def jump(lab):
        flat = lab.ravel()
        idx = jnp.clip(flat, 0, n - 1)
        hopped = jnp.where(flat < big, flat[idx], big)
        return jnp.minimum(flat, hopped).reshape(h, w)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = jump(spread(lab))
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.asarray(True)))
    return labels


@jax.jit
def refine_mask_device(soft: jnp.ndarray) -> jnp.ndarray:
    """Threshold at 0.5, fill holes, keep the second-largest component with
    background counted as a component (reference
    utils/bilateral_solver.py:185-195). -> [H, W] bool."""
    h, w = soft.shape
    n = h * w
    big = jnp.iinfo(jnp.int32).max
    binary = soft > 0.5

    # hole fill: background reachable from the border stays background
    inv = ~binary
    ys, xs = jnp.mgrid[:h, :w]
    border = (ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1)
    seed = jnp.where(inv & border, 0, big)
    reach = _propagate_labels(seed, inv)
    filled = binary | (inv & (reach == big))

    # connected components of the filled foreground
    idx = (ys * w + xs).astype(jnp.int32)
    labels = _propagate_labels(jnp.where(filled, idx, big), filled)

    # component sizes; background counts as one component in slot n
    flat = jnp.where(filled.ravel(), labels.ravel(), n)
    counts = jnp.zeros(n + 1, jnp.float32).at[flat].add(1.0)
    # top-2 over counts (reference: argsort(sizes)[-2])
    top1 = jnp.argmax(counts)
    counts2 = counts.at[top1].set(-1.0)
    top2 = jnp.argmax(counts2)
    n_components = jnp.sum(counts[:n] > 0)

    refined = flat.reshape(h, w) == top2
    # no foreground components at all -> all-ones (reference IndexError path)
    return jnp.where(n_components == 0, jnp.ones((h, w), bool), refined)


def bilateral_solver_output_device(
    image, target, **kwargs
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in analogue of ops/bilateral.py:bilateral_solver_output, fully
    on device."""
    soft = bilateral_solve_device(jnp.asarray(image), jnp.asarray(target),
                                  **kwargs)
    return soft, refine_mask_device(soft)
