"""Golden convergence-history regression + independent oracle cross-check.

Round-1 verdict item 6: parity must rest on stored golden residual
histories (exact, seeded) and an oracle implemented independently of the
framework's own setup code — the reference cross-validates against
BoomerAMG/MFEM the same way (reference: src/SMEM_Main.cpp:697-723,
-hypre_test_error; SURVEY.md §4's test pyramid)."""

import glob
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
GOLDEN_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))


@pytest.mark.parametrize(
    "path", GOLDEN_FILES, ids=[os.path.basename(p) for p in GOLDEN_FILES]
)
def test_golden_history(path):
    """Re-run each BASELINE config and require the exact recorded trajectory:
    cycle count equal, residual history to 1e-10 relative, hierarchy shape
    (per-level n, nnz) identical."""
    from amg_tpu.utils.config import SolverOptions
    from amg_tpu.utils.runner import run_experiment

    with open(path) as f:
        g = json.load(f)
    st = run_experiment(SolverOptions(**g["config"]))
    assert st.cycles == g["cycles"], (
        f"cycle count changed: {st.cycles} vs golden {g['cycles']}"
    )
    assert st.num_levels == g["num_levels"]
    assert st.level_n == g["level_n"], "hierarchy shape (n) drifted"
    assert st.level_nnz == g["level_nnz"], "hierarchy shape (nnz) drifted"
    np.testing.assert_allclose(
        np.asarray(st.history), np.asarray(g["history"]),
        rtol=1e-10, atol=1e-14,
        err_msg="residual history drifted from golden",
    )
    np.testing.assert_allclose(
        st.operator_complexity, g["operator_complexity"], rtol=1e-12
    )


# ---------------------------------------------------------------------------
# Independent oracle: a minimal classical two-grid AMG written in plain
# numpy/scipy, sharing NO code with amg_tpu.setup — direct interpolation on
# a greedy C/F split, dense Galerkin RAP, exact coarse solve, weighted
# Jacobi smoothing. If amg_tpu's two-level cycle needed far more iterations
# than this textbook construction, the setup would be broken.
# ---------------------------------------------------------------------------


def _oracle_two_grid(A, b, tol, max_iters=100, theta=0.25, omega=2.0 / 3.0):
    import scipy.sparse as sp

    n = A.shape[0]
    Ad = A.toarray()
    D = np.diag(Ad)
    # strength: -a_ij >= theta * max_k(-a_ik)
    offd = Ad - np.diag(D)
    rowmax = np.maximum((-offd).max(axis=1), 1e-300)
    S = (-offd) >= theta * rowmax[:, None]
    # greedy independent-set C/F split by descending measure
    measure = S.sum(axis=0)
    state = np.zeros(n, np.int8)  # 0 undecided, 1 C, -1 F
    for i in np.argsort(-measure):
        if state[i] == 0:
            state[i] = 1
            state[np.flatnonzero(S[i] | S[:, i]) ] = np.where(
                state[np.flatnonzero(S[i] | S[:, i])] == 0, -1,
                state[np.flatnonzero(S[i] | S[:, i])],
            )
    C = np.flatnonzero(state == 1)
    cmap = {c: j for j, c in enumerate(C)}
    # direct interpolation
    P = np.zeros((n, C.size))
    for i in range(n):
        if state[i] == 1:
            P[i, cmap[i]] = 1.0
            continue
        nbrs = [j for j in np.flatnonzero(S[i]) if state[j] == 1]
        if not nbrs:
            continue
        denom = sum(Ad[i, j] for j in nbrs)
        if denom == 0:
            continue
        # row-sum preserving direct weights
        alpha = (Ad[i].sum() - Ad[i, i] - denom) + denom
        for j in nbrs:
            P[i, cmap[j]] = -(Ad[i, j] / Ad[i, i]) * (
                (Ad[i].sum() - Ad[i, i]) / denom
            )
    Ac = P.T @ Ad @ P
    x = np.zeros(n)
    r0 = np.linalg.norm(b)
    for it in range(1, max_iters + 1):
        # pre-smooth (weighted Jacobi), coarse correct, post-smooth
        x = x + omega * (b - Ad @ x) / D
        r = b - Ad @ x
        x = x + P @ np.linalg.solve(Ac, P.T @ r)
        x = x + omega * (b - Ad @ x) / D
        if np.linalg.norm(b - Ad @ x) / r0 <= tol:
            return it
    return max_iters


def test_two_level_vs_independent_oracle():
    """amg_tpu's two-level MULT cycle must not need more than 2x the
    iterations of the independently-written textbook two-grid."""
    import jax.numpy as jnp

    from amg_tpu.problems import laplacian_2d_5pt
    from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy
    from amg_tpu.smooth import SmootherType
    from amg_tpu.solve import CycleConfig, CycleType, solve

    prob = laplacian_2d_5pt(16)
    b_np = np.random.default_rng(0).random(prob.n)
    oracle_iters = _oracle_two_grid(prob.A.to_scipy(), b_np, tol=1e-8)
    assert oracle_iters < 100, "oracle itself failed to converge"

    params = HierarchyParams(smoother=SmootherType.JACOBI, max_levels=2)
    hh, hier = build_hierarchy(prob.A, params, fine_stencil=prob.stencil)
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.JACOBI)
    res = solve(hier, cfg, jnp.asarray(b_np), tol=1e-8, max_cycles=200)
    assert float(res.rel_resnorm) <= 1e-8
    assert int(res.iters) <= 2 * oracle_iters, (
        f"amg_tpu 2-level took {int(res.iters)} vs oracle {oracle_iters}"
    )


def test_goldens_exist():
    names = {os.path.basename(p) for p in GOLDEN_FILES}
    # 5 BASELINE configs + 2 distributed round-2 configs + round-3
    # elasticity-defaults (SA+PCG) config + 2 round-4 medium-scale
    # configs (110k-dof 27pt, 49k-dof DIA elasticity mixed-precision)
    assert len(names) == 10, f"expected 10 goldens, have {names}"
