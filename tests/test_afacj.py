"""AFACj with the ideal interpolant (round-1 verdict item 8).

The hypre patch's P_array_afacj is realized as the diagonal-Schur ideal
interpolant P_id = [-D_ff^-1 A_fc; I] (one-point Jacobi approximation of
[-A_ff^-1 A_fc; I]); the AFACj cycle runs its chains through it with a
standard final hop (reference: DMEM_SyncAFACCycle,
src/DMEM_Mult.cpp:453-612)."""

import numpy as np
import pytest

import jax.numpy as jnp

from amg_tpu.problems import difconv_3d, laplacian_2d_5pt
from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy
from amg_tpu.setup.coarsen import C_PT
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType, solve
from amg_tpu.solve.driver import cheby_setup
from amg_tpu.sparse.ell import ell_from_csr


def test_pid_structure():
    """P_id = [-D_ff^-1 A_fc; I]: identity on C rows, -a_ic/a_ii on F rows."""
    prob = laplacian_2d_5pt(12)
    hh, _ = build_hierarchy(
        prob.A, HierarchyParams(smoother=SmootherType.L1_JACOBI)
    )
    hl = hh.levels[0]
    P = hl.P_id.to_scipy().toarray()
    A = hl.A.to_scipy().toarray()
    cf = hl.cf
    crows = np.flatnonzero(cf == C_PT)
    cmap = {c: j for j, c in enumerate(crows)}
    for j, c in enumerate(crows):
        row = np.zeros(P.shape[1])
        row[j] = 1.0
        np.testing.assert_allclose(P[c], row)
    frows = np.flatnonzero(cf != C_PT)
    for i in frows[:20]:
        expect = np.zeros(P.shape[1])
        for c in crows:
            if A[i, c] != 0.0:
                expect[cmap[c]] = -A[i, c] / A[i, i]
        np.testing.assert_allclose(P[i], expect, atol=1e-15)
    # R_id is the exact transpose
    R = hl.R_id.to_scipy().toarray()
    np.testing.assert_allclose(R, P.T)


def test_afacj_converges_and_beats_injection():
    """The verdict's done-criterion: ideal-interpolant AFACj beats the
    injection-interpolant variant on a difconv case."""
    prob = difconv_3d(12, 12, 12, eps=0.1)
    params = HierarchyParams(smoother=SmootherType.L1_JACOBI)
    hh, hier = build_hierarchy(prob.A, params, fine_stencil=prob.stencil)
    b = jnp.asarray(np.random.default_rng(0).random(prob.n))
    cfg = CycleConfig(cycle=CycleType.AFACJ, smoother=SmootherType.L1_JACOBI)

    def run(h):
        coeffs = cheby_setup(h, cfg)
        return solve(h, cfg, b, tol=1e-8, max_cycles=400,
                     accel="cheby", cheby_coeffs=coeffs)

    res_ideal = run(hier)
    assert float(res_ideal.rel_resnorm) <= 1e-8
    # swap the ideal interpolants for pure C-point injection (the round-1
    # approximation) — must be measurably worse
    levels_inj = []
    for k, lv in enumerate(hier.levels):
        if lv.R_inj is not None:
            hl = hh.levels[k]
            P_inj = ell_from_csr(hl.R_inj.transpose(), dtype=params.dtype)
            levels_inj.append(lv._replace(P_id=P_inj, R_id=lv.R_inj))
        else:
            levels_inj.append(lv)
    hier_inj = hier._replace(levels=tuple(levels_inj))
    res_inj = run(hier_inj)
    assert int(res_ideal.iters) < 0.7 * int(res_inj.iters), (
        int(res_ideal.iters), int(res_inj.iters),
    )


def test_afacj_defaults_cli():
    from amg_tpu.utils.config import SolverOptions
    from amg_tpu.utils.runner import run_experiment

    st = run_experiment(SolverOptions(problem="5pt", n=32, solver="afacj"))
    assert st.rel_resnorm <= 1e-8
    st = run_experiment(
        SolverOptions(problem="5pt", n=24, solver="async_afacx")
    )
    assert st.rel_resnorm <= 1e-8
