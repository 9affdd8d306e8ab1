"""Per-phase instrumentation: segmented cycles must compute the production
iteration exactly, and the phase/message accounting must be complete
(reference metrics: src/Main.hpp:159-185, src/DMEM_Misc.cpp:7-279)."""

import numpy as np
import pytest

import jax.numpy as jnp

from amg_tpu.parallel import make_row_mesh
from amg_tpu.parallel.dist import build_dist_hierarchy, pad_vector
from amg_tpu.problems import laplacian_2d_5pt
from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy, build_host_hierarchy
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType
from amg_tpu.solve.cycles import cycle_step
from amg_tpu.utils.phases import profile_phases


@pytest.fixture(scope="module")
def setup24():
    prob = laplacian_2d_5pt(24)
    params = HierarchyParams(
        smoother=SmootherType.L1_JACOBI, keep_stencil_fine=False
    )
    hh, hier = build_hierarchy(prob.A, params)
    b = jnp.asarray(np.random.default_rng(0).random(prob.n))
    return prob, hh, hier, b


@pytest.mark.parametrize("cyc", [CycleType.MULT, CycleType.MULTADD,
                                 CycleType.BPX, CycleType.AFACX,
                                 CycleType.AFACJ])
def test_segmented_equals_production(setup24, cyc):
    prob, hh, hier, b = setup24
    cfg = CycleConfig(
        cycle=cyc, smoother=SmootherType.L1_JACOBI,
        use_smoothed_transfers=(cyc == CycleType.MULTADD),
    )
    rep = profile_phases(hier, cfg, b, num_cycles=3)
    x = jnp.zeros_like(b)
    for _ in range(3):
        x = cycle_step(hier, cfg, x, b)
    np.testing.assert_allclose(
        np.asarray(rep._x), np.asarray(x), rtol=1e-12, atol=1e-14
    )
    t = rep.totals()
    assert t["smooth_wtime"] > 0 and t["restrict_wtime"] > 0
    assert rep.num_levels == hier.num_levels


def test_comm_accounting_halo(setup24):
    """On a halo hierarchy the per-cycle message/byte counts are exact and
    nonzero on every level with off-device coupling."""
    prob, hh, hier, b = setup24
    params = HierarchyParams(
        smoother=SmootherType.L1_JACOBI, keep_stencil_fine=False,
        device_format="ell",
    )
    mesh = make_row_mesh(8)
    hier8, pad_info = build_dist_hierarchy(hh, params, mesh, comm="halo")
    b8 = pad_vector(b, pad_info, mesh)
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
    rep = profile_phases(hier8, cfg, b8, num_cycles=1)
    assert sum(rep.comm_msgs) > 0
    assert sum(rep.comm_bytes) > 0
    # every non-coarsest level exchanges halos; the coarsest level's solve
    # is the replicated dense inverse (no halo channel)
    assert all(by > 0 for by in rep.comm_bytes[:-1])
    assert rep.comm_bytes[-1] == 0


def test_cli_num_runs_aggregation(capsys):
    from amg_tpu.utils.cli import main

    main(["-problem", "5pt", "-n", "16", "-solver", "mult",
          "-num_runs", "2", "-print_level_stats"])
    out = capsys.readouterr().out
    assert "aggregate over 2 runs" in out
    assert "per-phase wtime" in out


def test_cli_iteration_sweep(capsys):
    """-start/-incr/-max_num_iters re-runs the solve at each fixed cycle
    count (reference: src/SMEM_Main.cpp:108-110,694)."""
    from amg_tpu.utils.cli import main

    main(["-problem", "5pt", "-n", "16", "-solver", "mult", "-tol", "0",
          "-start_num_iters", "2", "-incr_num_iters", "2",
          "-max_num_iters", "6"])
    out = capsys.readouterr().out
    for k in (2, 4, 6):
        assert f"=== num_cycles = {k} ===" in out
    assert out.count("cycles") >= 3


class TestStructuredPhases:
    def test_structured_hierarchy_profiles(self):
        """Per-phase profiling covers structured/DIA hierarchies (round 4):
        the segmented profiler is duck-typed over the level operators."""
        from amg_tpu.utils.config import SolverOptions
        from amg_tpu.utils.runner import run_experiment

        st = run_experiment(SolverOptions(
            problem="elasticity", nx=16, ny=4, nz=4, elast_bc="identity",
            hierarchy="structured", solver="mult", print_level_stats=True,
        ))
        assert st.phase is not None
        t = st.phase.totals()
        assert t["smooth_wtime"] > 0 and t["residual_wtime"] > 0
        assert st.phase.num_levels >= 2
