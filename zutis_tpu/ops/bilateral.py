"""Fast bilateral solver for pseudo-mask refinement.

Implements the bilateral-solver algorithm (Barron & Poole, ECCV 2016) as the
reference uses it for SelfMask mask refinement (reference
utils/bilateral_solver.py:152-195 `bilateral_solver_output`): build a 5-D
XYLUV bilateral grid over the image, splat the target mask and confidence
into grid space, solve (lam * smoothness + data) y = splat(w*t) with
Jacobi-preconditioned CG, slice back, threshold at 0.5, fill holes, and keep
the second-largest connected component (the largest is background).

Parameters mirror the reference call site: sigma_spatial 16, sigma_luma 16,
sigma_chroma 8, lam 256, cg_maxiter 25, cg_tol 1e-5, confidence 0.999.

This host implementation (numpy + scipy.sparse CG) is the correctness oracle;
the TPU path (fixed-capacity grid hashing + Pallas stencil CG, SURVEY.md
section 7 hard part 3) plugs in behind the same function signature.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_RGB2YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]]
)
_YUV_OFFSET = np.array([0.0, 128.0, 128.0])


class BilateralGrid:
    """Sparse splat/blur/slice operators over hashed 5-D grid vertices."""

    def __init__(self, image: np.ndarray, sigma_spatial: float = 16,
                 sigma_luma: float = 16, sigma_chroma: float = 8):
        from scipy.sparse import csr_matrix

        im = np.asarray(image, np.float64)
        yuv = im @ _RGB2YUV.T + _YUV_OFFSET
        h, w = im.shape[:2]
        ys, xs = np.mgrid[:h, :w]
        coords = np.stack([
            (xs / sigma_spatial).astype(np.int64).ravel(),
            (ys / sigma_spatial).astype(np.int64).ravel(),
            (yuv[..., 0] / sigma_luma).astype(np.int64).ravel(),
            (yuv[..., 1] / sigma_chroma).astype(np.int64).ravel(),
            (yuv[..., 2] / sigma_chroma).astype(np.int64).ravel(),
        ], axis=1)  # [npix, 5]
        self.npixels, self.dim = coords.shape
        # pack each coordinate tuple into one integer key
        self._basis = 256 ** np.arange(self.dim)
        keys = coords @ self._basis
        # return_index is each unique key's FIRST occurrence in original
        # pixel order — vertex v's representative coordinates
        uniq_keys, first, inverse = np.unique(
            keys, return_index=True, return_inverse=True)
        self.nvertices = len(uniq_keys)
        self._uniq_keys = uniq_keys
        self._uniq_coords = coords[first]
        self.S = csr_matrix(
            (np.ones(self.npixels), (inverse, np.arange(self.npixels))),
            shape=(self.nvertices, self.npixels),
        )
        # one [1 0 1] blur matrix per dimension (central element excluded)
        self._blurs = []
        for d in range(self.dim):
            rows, cols = [], []
            for offset in (-1, 1):
                nb = self._uniq_coords.copy()
                nb[:, d] += offset
                nb_keys = nb @ self._basis
                pos = np.searchsorted(uniq_keys, nb_keys)
                pos = np.clip(pos, 0, self.nvertices - 1)
                hit = uniq_keys[pos] == nb_keys
                rows.append(np.flatnonzero(hit))
                cols.append(pos[hit])
            rows = np.concatenate(rows)
            cols = np.concatenate(cols)
            self._blurs.append(csr_matrix(
                (np.ones(len(rows)), (rows, cols)),
                shape=(self.nvertices, self.nvertices),
            ))

    def splat(self, x: np.ndarray) -> np.ndarray:
        return self.S @ x

    def slice(self, y: np.ndarray) -> np.ndarray:
        return self.S.T @ y

    def blur(self, x: np.ndarray) -> np.ndarray:
        out = 2 * self.dim * x
        for b in self._blurs:
            out = out + b @ x
        return out


def _bistochastize(grid: BilateralGrid, maxiter: int = 10):
    from scipy.sparse import diags

    m = grid.splat(np.ones(grid.npixels))
    n = np.ones(grid.nvertices)
    for _ in range(maxiter):
        n = np.sqrt(n * m / grid.blur(n))
    m = n * grid.blur(n)
    return diags(n), diags(m)


def solve(
    grid: BilateralGrid,
    target: np.ndarray,  # [npix, k]
    confidence: np.ndarray,  # [npix, 1]
    lam: float = 256.0,
    a_diag_min: float = 1e-5,
    cg_tol: float = 1e-5,
    cg_maxiter: int = 25,
) -> np.ndarray:
    from scipy.sparse import diags
    from scipy.sparse.linalg import LinearOperator, cg

    Dn, Dm = _bistochastize(grid)
    # smoothness operator applied matrix-free: lam*(Dm y - Dn blur(Dn y))
    n_vec = Dn.diagonal()
    m_vec = Dm.diagonal()
    w_splat = grid.splat(confidence)
    a_diag = np.maximum(
        lam * (m_vec - n_vec * (2 * grid.dim) * n_vec) + w_splat[:, 0],
        a_diag_min,
    )

    def a_mv(y):
        smooth = lam * (m_vec * y - n_vec * grid.blur(n_vec * y))
        return smooth + w_splat[:, 0] * y

    A = LinearOperator((grid.nvertices, grid.nvertices), matvec=a_mv)
    M = LinearOperator(
        (grid.nvertices, grid.nvertices), matvec=lambda y: y / a_diag
    )
    b = grid.splat(target * confidence)
    y0 = b / w_splat
    out = np.empty_like(y0)
    for k in range(target.shape[1]):
        yk, _ = cg(A, b[:, k], x0=y0[:, k], M=M, maxiter=cg_maxiter,
                   rtol=cg_tol)
        out[:, k] = yk
    return grid.slice(out)


def bilateral_solver_output(
    image: np.ndarray,  # [H, W, 3] uint8 RGB
    target: np.ndarray,  # [H, W] float/binary
    sigma_spatial: float = 16,
    sigma_luma: float = 16,
    sigma_chroma: float = 8,
    lam: float = 256.0,
    confidence_value: float = 0.999,
    cg_maxiter: int = 25,
    cg_tol: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (soft solver output [H, W] float, refined binary mask [H, W] bool).

    The binary output thresholds at 0.5, fills holes, and keeps the
    second-largest connected component (the largest being background); if
    that fails the all-ones mask is returned — all per the reference
    (bilateral_solver.py:185-195)."""
    from scipy import ndimage

    assert target.ndim == 2
    h, w = target.shape
    grid = BilateralGrid(
        image, sigma_spatial=sigma_spatial, sigma_luma=sigma_luma,
        sigma_chroma=sigma_chroma,
    )
    t = target.reshape(-1, 1).astype(np.float64)
    c = np.full((h * w, 1), confidence_value)
    soft = solve(grid, t, c, lam=lam, cg_maxiter=cg_maxiter,
                 cg_tol=cg_tol).reshape(h, w)

    binary = ndimage.binary_fill_holes(soft > 0.5)
    labeled, n_objects = ndimage.label(binary)
    sizes = [np.sum(labeled == i) for i in range(n_objects + 1)]
    order = np.argsort(sizes)
    try:
        refined = labeled == order[-2]
    except IndexError:
        refined = np.ones((h, w), bool)
    return soft, refined
