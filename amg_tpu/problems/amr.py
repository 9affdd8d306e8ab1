"""Locally-refined (AMR-analog) problem generators.

The reference's AMR problems (MFEM ZZ-estimator + ThresholdRefiner loops,
reference: src/Elasticity.cpp:150-261, src/Laplacian.cpp:202-424) produce
matrices whose defining property for the solver is LOCAL REFINEMENT: element
sizes varying by orders of magnitude toward a feature, giving multiscale
diagonal entries and high condition numbers. The native equivalent here is a
graded-mesh finite-volume Laplacian: node coordinates follow a power grading
toward a corner singularity, x_i = (i/n)^gamma, so h varies by ~gamma orders
of magnitude — the same matrix character AMR produces, assembled directly
(no external mesh machinery).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from amg_tpu.dtypes import SETUP_DTYPE
from amg_tpu.problems.laplacian import Problem
from amg_tpu.sparse.csr import CSRMatrix


def _graded_coords(n: int, gamma: float) -> np.ndarray:
    """n+1 node coordinates in [0,1], graded toward 0 with exponent gamma."""
    return (np.arange(n + 1) / n) ** gamma


def laplacian_graded(
    nx: int,
    ny: int | None = None,
    gamma: float = 2.5,
) -> Problem:
    """2D diffusion on a tensor-product graded mesh (finite volume, Dirichlet).

    gamma=1 is the uniform mesh; gamma~2.5 mimics 3-4 rounds of corner
    refinement (h_min/h_max ~ n^(1-gamma))."""
    ny = nx if ny is None else ny
    xs = _graded_coords(nx, gamma)
    ys = _graded_coords(ny, gamma)
    # unknowns at interior nodes (1..n-1 per axis)
    nxi, nyi = nx - 1, ny - 1
    n = nxi * nyi
    idx = np.arange(n).reshape(nxi, nyi)
    hx = np.diff(xs)  # (nx,)
    hy = np.diff(ys)
    # control-volume sizes at interior nodes
    cvx = 0.5 * (hx[:-1] + hx[1:])  # (nxi,)
    cvy = 0.5 * (hy[:-1] + hy[1:])
    rows, cols, vals = [], [], []
    diag = np.zeros((nxi, nyi))
    # x-direction fluxes: face conductance 1/hx per unit y, times the
    # control-volume y-extent
    wx = 1.0 / hx
    c = wx[1:-1][:, None] * cvy[None, :]  # (nxi-1, nyi) interior faces
    r = idx[:-1, :].reshape(-1)
    cidx = idx[1:, :].reshape(-1)
    v = -c.reshape(-1)
    rows += [r, cidx]
    cols += [cidx, r]
    vals += [v, v]
    diag[:-1, :] += c
    diag[1:, :] += c
    # Dirichlet boundary x faces
    diag[0, :] += wx[0] * cvy
    diag[-1, :] += wx[-1] * cvy
    # y couplings
    wy = 1.0 / hy
    c = (cvx[:, None] * wy[1:-1][None, :])  # (nxi, nyi-1)
    r = idx[:, :-1].reshape(-1)
    cidx = idx[:, 1:].reshape(-1)
    v = -c.reshape(-1)
    rows += [r, cidx]
    cols += [cidx, r]
    vals += [v, v]
    diag[:, :-1] += c
    diag[:, 1:] += c
    diag[:, 0] += cvx * wy[0]
    diag[:, -1] += cvx * wy[-1]
    rows.append(idx.reshape(-1))
    cols.append(idx.reshape(-1))
    vals.append(diag.reshape(-1))
    m = sp.coo_matrix(
        (
            np.concatenate(vals).astype(SETUP_DTYPE),
            (np.concatenate(rows), np.concatenate(cols)),
        ),
        shape=(n, n),
    )
    return Problem(
        name="graded", A=CSRMatrix.from_scipy(m), stencil=None,
        grid_shape=(nxi, nyi),
    )
