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
    # + the round-4 JGS mixed-precision production recipe + the round-5
    # assembled config-5 (grid-parallel async additive Maxwell) and the
    # round-5 medium (33k-dof) accelerated async multadd
    assert len(names) == 13, f"expected 13 goldens, have {names}"


# ---------------------------------------------------------------------------
# Round-4 (verdict item 7): MULTI-LEVEL independent oracle — a complete
# classical AMG hierarchy in plain numpy/scipy (strength graph, greedy
# independent-set C/F split, direct interpolation, sparse Galerkin RAP),
# sharing NO code with amg_tpu.setup. The repo's HMIS-style/ext+i hierarchy
# must land inside structural corridors of this textbook construction on 3D
# problems — a drifting coarsening (e.g. operator complexity +20%) fails.
# (The reference's iteration counts depend on BoomerAMG's exact hierarchy,
# src/SMEM_Setup.cpp:1673-1759; with hypre unavailable offline, this
# corridor is the strongest available external check.)
# ---------------------------------------------------------------------------


def _oracle_classical_hierarchy(As, theta=0.25, max_levels=25, max_coarse=60):
    import scipy.sparse as sp

    levels = []
    ops = []
    A = As.tocsr()
    while True:
        n = A.shape[0]
        levels.append((n, A.nnz))
        if n <= max_coarse or len(levels) >= max_levels:
            ops.append((A, None))
            break
        D = A.diagonal()
        offd = (A - sp.diags(D)).tocoo()
        vals = -offd.data  # classical strength on -a_ij
        rowmax = np.zeros(n)
        np.maximum.at(rowmax, offd.row, vals)
        rowmax = np.maximum(rowmax, 1e-300)
        keep = vals >= theta * rowmax[offd.row]
        S = sp.csr_matrix(
            (np.ones(keep.sum()), (offd.row[keep], offd.col[keep])),
            shape=(n, n),
        )
        Sym = ((S + S.T) > 0).tocsr()
        measure = np.asarray(S.sum(axis=0)).ravel()
        state = np.zeros(n, np.int8)  # 0 undecided, 1 C, -1 F
        for i in np.argsort(-measure, kind="stable"):
            if state[i] == 0:
                state[i] = 1
                nb = Sym.indices[Sym.indptr[i]:Sym.indptr[i + 1]]
                state[nb[state[nb] == 0]] = -1
        Cpts = np.flatnonzero(state == 1)
        if Cpts.size == 0 or Cpts.size == n:
            break
        cmap = -np.ones(n, np.int64)
        cmap[Cpts] = np.arange(Cpts.size)
        # direct interpolation (row-sum preserving classical weights)
        sc = keep & (state[offd.col] == 1)  # strong-C entries
        r_, c_, a_ = offd.row[sc], offd.col[sc], offd.data[sc]
        denom = np.zeros(n)
        np.add.at(denom, r_, a_)
        total = np.zeros(n)
        np.add.at(total, offd.row, offd.data)
        ok = (state == -1) & (denom != 0)
        w = -(a_ / D[r_]) * (total[r_] / denom[r_])
        fm = ok[r_]
        rows = np.concatenate([r_[fm], Cpts])
        cols = np.concatenate([cmap[c_[fm]], np.arange(Cpts.size)])
        data = np.concatenate([w[fm], np.ones(Cpts.size)])
        P = sp.csr_matrix((data, (rows, cols)), shape=(n, Cpts.size))
        ops.append((A, P))
        A = (P.T @ A @ P).tocsr()
        A.eliminate_zeros()
    ns = [l[0] for l in levels]
    nnzs = [l[1] for l in levels]
    return {
        "n": ns,
        "nnz": nnzs,
        "operator_complexity": sum(nnzs) / nnzs[0],
        "num_levels": len(ns),
        "ops": ops,  # [(A_k, P_k)] with P None on the coarsest
    }


def _oracle_vcycle_iters(oracle, b, tol=1e-8, max_iters=200, omega=2.0 / 3.0):
    """Weighted-Jacobi V(1,1) cycle on the oracle hierarchy, plain scipy —
    the independent multi-level CONVERGENCE yardstick."""
    import numpy as np_
    import scipy.sparse.linalg as spla

    ops = oracle["ops"]
    L = len(ops)
    diags = [A.diagonal() for A, _ in ops]
    coarse_lu = spla.splu(ops[-1][0].tocsc())

    def vcycle(k, x, f):
        A, P = ops[k]
        if k == L - 1:
            return coarse_lu.solve(f)
        x = x + omega * (f - A @ x) / diags[k]
        r = f - A @ x
        e = vcycle(k + 1, np_.zeros(P.shape[1]), P.T @ r)
        x = x + P @ e
        x = x + omega * (f - A @ x) / diags[k]
        return x

    x = np_.zeros(b.size)
    r0 = np_.linalg.norm(b)
    for it in range(1, max_iters + 1):
        x = vcycle(0, x, b)
        if np_.linalg.norm(b - ops[0][0] @ x) / r0 <= tol:
            return it
    return max_iters


@pytest.mark.parametrize("problem", ["27pt16", "7pt20"])
def test_hierarchy_within_multilevel_oracle_corridor(problem):
    from amg_tpu.problems import laplacian_3d_7pt, laplacian_3d_27pt
    from amg_tpu.setup.hierarchy import HierarchyParams, build_host_hierarchy

    prob = (
        laplacian_3d_27pt(16) if problem == "27pt16" else laplacian_3d_7pt(20)
    )
    oracle = _oracle_classical_hierarchy(prob.A.to_scipy())
    hh = build_host_hierarchy(prob.A, HierarchyParams())
    st = hh.stats()
    # corridor 1: hierarchy depth within 1 level
    assert abs(st["num_levels"] - oracle["num_levels"]) <= 1, (
        st["n"], oracle["n"]
    )
    # corridor 2: per-level size within 2x of the oracle's on shared levels
    for k in range(min(st["num_levels"], oracle["num_levels"])):
        ratio = st["n"][k] / oracle["n"][k]
        assert 0.5 <= ratio <= 2.0, (k, st["n"], oracle["n"])
    # corridor 3: operator complexity within [0.7, 1.35]x of the oracle
    # (observed: repo ext+i is ~1.15-1.20x the oracle's direct interp; a
    # +20% coarsening-quality drift breaks the upper bound)
    oc = st["operator_complexity"] / oracle["operator_complexity"]
    assert 0.7 <= oc <= 1.35, (
        f"operator complexity drifted: repo {st['operator_complexity']:.3f}"
        f" vs oracle {oracle['operator_complexity']:.3f}"
    )


@pytest.mark.parametrize("problem", ["27pt16", "7pt16"])
def test_convergence_within_multilevel_oracle_corridor(problem):
    """Independent CONVERGENCE corridor: the production V(1,1) Jacobi
    cycle must converge within 1.6x the iterations of the scipy-only
    oracle V-cycle on the oracle's own textbook hierarchy (3D problems,
    1e-8) — the multi-level analog of the round-1 two-grid oracle."""
    import jax.numpy as jnp

    from amg_tpu.problems import laplacian_3d_7pt, laplacian_3d_27pt
    from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy
    from amg_tpu.smooth import SmootherType
    from amg_tpu.solve import CycleConfig, CycleType, solve

    prob = (
        laplacian_3d_27pt(16) if problem == "27pt16" else laplacian_3d_7pt(16)
    )
    oracle = _oracle_classical_hierarchy(prob.A.to_scipy())
    b = np.random.default_rng(0).random(prob.n)
    oracle_iters = _oracle_vcycle_iters(oracle, b, tol=1e-8)
    assert oracle_iters < 200, "oracle itself failed to converge"

    params = HierarchyParams(smoother=SmootherType.JACOBI)
    hh, hier = build_hierarchy(prob.A, params, fine_stencil=prob.stencil)
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.JACOBI)
    res = solve(hier, cfg, jnp.asarray(b), tol=1e-8, max_cycles=400)
    assert float(res.rel_resnorm) <= 1e-8
    assert int(res.iters) <= max(1.6 * oracle_iters, oracle_iters + 3), (
        f"amg_tpu took {int(res.iters)} vs oracle {oracle_iters}"
    )
