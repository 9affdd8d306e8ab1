"""Auxiliary-space (AMS/Hiptmair) Maxwell solver: exact-sequence structure,
preconditioner SPD-ness, and the curl-curl solve that plain AMG stalls on
(BASELINE config 5's problem, reference src/Maxwell.cpp:50-208)."""

import numpy as np
import jax.numpy as jnp

from amg_tpu.problems.maxwell import maxwell_curlcurl
from amg_tpu.setup.hierarchy import HierarchyParams, _format_converter
from amg_tpu.solve.ams import ams_precondition, build_ams, solve_ams_pcg


def test_exact_sequence_gradient():
    """A @ G = sigma*vol*G: the curl term annihilates gradients."""
    n, sigma = 6, 2.0
    p = maxwell_curlcurl(n=n, sigma=sigma)
    As = p.A.to_scipy()
    Gs = p.aux["G"].to_scipy()
    vol = (1.0 / n) ** 3
    assert abs(As @ Gs - sigma * vol * Gs).max() < 1e-12


def test_gradient_maps_interior_potentials():
    p = maxwell_curlcurl(n=5)
    G = p.aux["G"]
    assert G.shape[0] == p.A.n_rows
    assert G.shape[1] == (5 - 1) ** 3  # interior nodes only


def test_ams_preconditioner_spd():
    p = maxwell_curlcurl(n=5)
    ams, cfg = build_ams(p.A, p.aux["G"])
    n = p.A.n_rows
    rng = np.random.default_rng(0)
    V = rng.standard_normal((n, 6))
    MV = np.stack(
        [np.asarray(ams_precondition(ams, cfg, jnp.asarray(v))) for v in V.T],
        axis=1,
    )
    S = V.T @ MV
    np.testing.assert_allclose(S, S.T, atol=1e-10)
    assert (np.linalg.eigvalsh((S + S.T) / 2) > 0).all()


def test_maxwell_ams_solve():
    p = maxwell_curlcurl(n=10, sigma=1.0)
    ams, cfg = build_ams(p.A, p.aux["G"])
    conv = _format_converter(HierarchyParams())
    A_dev = conv(p.A, jnp.float64)
    res = solve_ams_pcg(A_dev, ams, cfg, jnp.asarray(p.rhs), tol=1e-8)
    assert float(res.rel_resnorm) < 1e-8
    assert int(res.iters) < 60  # plain AMG-PCG: >200 and stalls


def test_maxwell_ams_small_sigma():
    """Robustness as sigma -> 0 (the regime where the gradient kernel
    dominates and nodal AMG fails completely)."""
    p = maxwell_curlcurl(n=8, sigma=1e-3)
    ams, cfg = build_ams(p.A, p.aux["G"])
    conv = _format_converter(HierarchyParams())
    A_dev = conv(p.A, jnp.float64)
    res = solve_ams_pcg(A_dev, ams, cfg, jnp.asarray(p.rhs), tol=1e-8)
    assert float(res.rel_resnorm) < 1e-8
    assert int(res.iters) < 60
