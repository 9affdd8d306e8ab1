"""CLI-default convergence regressions.

Round-1 verdict: `-solver async_multadd` (5pt/32) and `-solver afacx`
(27pt/16) burned their full cycle budget at default settings. The fixups now
default the additive family onto Chebyshev/Richardson acceleration
(reference runs them the same way: src/DMEM_Misc.cpp:612-666,
src/SMEM_Sync_AMG.cpp:296-406) — these tests pin that the exact observed
failing invocations converge, with margin.
"""

from amg_tpu.utils.config import SolverOptions
from amg_tpu.utils.runner import run_experiment


def _run(**kw):
    opts = SolverOptions(**kw)
    return run_experiment(opts)


class TestAdditiveDefaultsConverge:
    def test_afacx_defaults_27pt(self):
        st = _run(problem="27pt", n=12, solver="afacx")
        assert st.rel_resnorm <= 1e-8
        assert st.cycles < 80, f"afacx default took {st.cycles} cycles"

    def test_multadd_defaults_5pt(self):
        st = _run(problem="5pt", n=32, solver="multadd")
        assert st.rel_resnorm <= 1e-8
        assert st.cycles <= 25, f"multadd default took {st.cycles} cycles"

    def test_async_multadd_defaults_5pt(self):
        # the exact round-1 failing invocation (was 1.4e-7 at 200 cycles)
        st = _run(problem="5pt", n=32, solver="async_multadd")
        assert st.rel_resnorm <= 1e-8
        assert st.cycles <= 170, f"async_multadd took {st.cycles} cycles"

    def test_async_afacx_defaults(self):
        st = _run(problem="27pt", n=12, solver="async_afacx")
        assert st.rel_resnorm <= 1e-8
        assert st.cycles <= 170, f"async_afacx took {st.cycles} cycles"


class TestFEMProblemDefaultsConverge:
    """Round-3: `-problem elasticity` and `-problem maxwell` at bare CLI
    defaults stalled (rel res 6.9 / 8.0e-3 after 200 cycles) — plain V(1,1)
    with classical/nodal AMG is a near-unity contraction on these systems.
    The fixups now route elasticity onto SA(rigid-body modes)+PCG and
    maxwell onto AMS-PCG, like the reference's MFEM/hypre production paths."""

    def test_elasticity_defaults(self):
        st = _run(problem="elasticity", n=8)
        assert st.rel_resnorm <= 1e-8
        assert st.cycles <= 120, f"elasticity default took {st.cycles} cycles"

    def test_maxwell_defaults(self):
        st = _run(problem="maxwell", n=8)
        assert st.rel_resnorm <= 1e-8
        assert st.cycles <= 60, f"maxwell default took {st.cycles} cycles"

    def test_fixup_resolution(self):
        opts = SolverOptions(problem="elasticity").fixup()
        assert opts.setup_type == "sa" and opts.outer_solver == "pcg"
        opts = SolverOptions(problem="maxwell").fixup()
        assert opts.outer_solver == "ams_pcg"
        # explicit user choices are preserved
        opts = SolverOptions(problem="elasticity", setup_type="classical",
                             outer_solver="pcg").fixup()
        assert opts.setup_type == "classical"
        opts = SolverOptions(problem="maxwell", accel="cheby").fixup()
        assert opts.outer_solver == "none"
        opts = SolverOptions(problem="5pt").fixup()
        assert opts.setup_type == "classical" and opts.outer_solver == "none"


def test_fixup_defaults_additive_accel():
    opts = SolverOptions(solver="afacx").fixup()
    assert opts.accel == "cheby"
    opts = SolverOptions(solver="async_multadd").fixup()
    assert opts.accel == "richardson"
    # explicit user choice is preserved
    opts = SolverOptions(solver="afacx", accel="richardson").fixup()
    assert opts.accel == "richardson"
    # outer PCG suppresses the auto-acceleration
    opts = SolverOptions(solver="multadd", outer_solver="pcg").fixup()
    assert opts.accel == "none"


def test_staged_smoke_flags(tmp_path):
    """-only_build_matrix / -print_matrix staged smoke (reference:
    -only_build_matrix, DMEM_Main.cpp:661-667; matrix dump round-trip)."""
    from amg_tpu.problems.io import read_binary_triplets

    path = str(tmp_path / "a.bin")
    st = _run(problem="5pt", n=8, only_build_matrix=True, print_matrix=path)
    assert st.n == 64 and st.cycles == 0
    A = read_binary_triplets(path)
    assert A.n_rows == 64 and A.nnz == 288


def test_async_smooth_distributed_unstructured():
    """One-level async smoothing over HaloELL for a matrix with no stencil
    (the unstructured finestIntra channel)."""
    st = _run(problem="graded", n=17, solver="async_smooth", num_devices=8,
              tol=1e-4, num_cycles=4000)
    assert st.rel_resnorm <= 1e-4


def test_ext_solver_aliases():
    """The reference's short solver names (eebpx/iebpx family) resolve."""
    for alias, full in (
        ("eebpx", "explicit_ext_bpx"),
        ("iebpx", "implicit_ext_bpx"),
        ("async_eebpx", "async_explicit_ext_bpx"),
        ("async_iebpx", "async_implicit_ext_bpx"),
    ):
        opts = SolverOptions(solver=alias).fixup()
        assert opts.solver == full


def test_anorm_error_zero_rhs():
    """Zero-RHS A-norm error metric (reference e_Anorm/e0_Anorm)."""
    st = _run(problem="5pt", n=24, solver="mult", rhs="zeros",
              init_guess="rand")
    assert st.e_anorm_rel is not None
    assert st.e_anorm_rel <= 1e-7
    # rhs != zeros → metric absent
    st = _run(problem="5pt", n=16, solver="mult")
    assert st.e_anorm_rel is None


def test_structured_async_multidevice_dispatch():
    """Structured hierarchy + async solver + num_devices>1 must route to the
    data-parallel async solve (regression: the dispatch gated on
    opts.grid_parallel and passed grid_mesh=None into grid_parallel_solve)."""
    st = _run(problem="27pt", n=8, hierarchy="structured",
              solver="async_multadd", num_devices=8, num_cycles=5, tol=1e-30)
    assert st.cycles == 5  # ran, no crash


def test_ext_no_grid_parallel_nondividing_n():
    """EXT solver with -no_grid_parallel and a row count that doesn't divide
    the mesh runs replicated (regression: padded b vs unpadded AA crash)."""
    st = _run(problem="5pt", n=19, solver="eebpx", num_devices=8,
              grid_parallel=False, num_cycles=120)
    assert st.rel_resnorm <= 1e-8
