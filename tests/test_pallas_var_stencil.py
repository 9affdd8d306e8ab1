"""Pallas variable-coefficient (DIA) stencil kernel: semantics tests in
interpret mode on CPU — parity against the host CSR operator for the
99-offset elasticity DIA form and a variable 7-pt scalar operator
(reference workhorse being replaced: src/SMEM_MatVec.cpp:123-259)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas_var_stencil import (
    coeffs_to_padded,
    halos_of,
    var_from_padded,
    var_stencil_kernel_padded,
    var_to_padded,
)
from amg_tpu.problems.elasticity import elasticity_beam
from amg_tpu.setup.structured import csr_to_dia_stencil


def _setup_elasticity(nx=6, ny=3, nz=3, slab=4):
    prob = elasticity_beam(nx=nx, ny=ny, nz=nz, bc="identity")
    vs = csr_to_dia_stencil(prob.A, prob.grid_shape, jnp.float64)
    gs = vs.grid_shape
    halos = halos_of(vs.offsets)
    c_pad = coeffs_to_padded(
        vs.coeffs.reshape(len(vs.offsets), -1), gs, halos, slab
    )
    return prob, vs, gs, halos, c_pad


class TestVarStencilKernel:
    def test_spmv_parity_elasticity(self):
        slab = 4
        prob, vs, gs, halos, c_pad = _setup_elasticity(slab=slab)
        rng = np.random.default_rng(0)
        x = rng.random(prob.A.n_rows)
        xp = var_to_padded(jnp.asarray(x), gs, halos, slab)
        with pltpu.force_tpu_interpret_mode():
            yp = var_stencil_kernel_padded(
                xp, c_pad, vs.offsets, gs, mode="spmv", slab=slab
            )
        np.testing.assert_allclose(
            np.asarray(var_from_padded(yp, gs, halos)), prob.A @ x,
            atol=1e-12,
        )
        # zero shell preserved
        mask = np.ones(yp.shape, bool)
        hz, hy, hx = halos
        mask[hz : hz + gs[0], hy : hy + gs[1], hx : hx + gs[2]] = False
        assert np.all(np.asarray(yp)[mask] == 0.0)

    def test_residual_and_sweep_parity(self):
        slab = 4
        prob, vs, gs, halos, c_pad = _setup_elasticity(slab=slab)
        rng = np.random.default_rng(1)
        x = rng.random(prob.A.n_rows)
        b = rng.random(prob.A.n_rows)
        scale = 1.0 / np.maximum(
            np.abs(prob.A.to_scipy()).sum(axis=1).A1, 1e-300
        )
        xp = var_to_padded(jnp.asarray(x), gs, halos, slab)
        bp = var_to_padded(jnp.asarray(b), gs, halos, slab)
        sp_ = var_to_padded(jnp.asarray(scale), gs, halos, slab)
        with pltpu.force_tpu_interpret_mode():
            rp = var_stencil_kernel_padded(
                xp, c_pad, vs.offsets, gs, b_pad=bp, mode="residual",
                slab=slab,
            )
            up = var_stencil_kernel_padded(
                xp, c_pad, vs.offsets, gs, b_pad=bp, scale_pad=sp_,
                mode="sweep", slab=slab,
            )
        r_ref = b - prob.A @ x
        np.testing.assert_allclose(
            np.asarray(var_from_padded(rp, gs, halos)), r_ref, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(var_from_padded(up, gs, halos)), x + scale * r_ref,
            atol=1e-12,
        )

    @pytest.mark.parametrize("slab", [2, 8])
    def test_slab_sizes_and_edge_slabs(self, slab):
        """Slab count G=1 edge handling and non-dividing interiors."""
        prob, vs, gs, halos, c_pad = _setup_elasticity(
            nx=5, ny=2, nz=2, slab=slab
        )
        rng = np.random.default_rng(2)
        x = rng.random(prob.A.n_rows)
        xp = var_to_padded(jnp.asarray(x), gs, halos, slab)
        with pltpu.force_tpu_interpret_mode():
            yp = var_stencil_kernel_padded(
                xp, c_pad, vs.offsets, gs, mode="spmv", slab=slab
            )
        np.testing.assert_allclose(
            np.asarray(var_from_padded(yp, gs, halos)), prob.A @ x,
            atol=1e-12,
        )

    def test_scalar_vardifconv(self):
        """Variable 7-pt scalar operator (d=1) through the same kernel."""
        from amg_tpu.problems import vardifconv_3d

        prob = vardifconv_3d(6, 5, 4, eps=0.1, seed=3)
        vs = csr_to_dia_stencil(prob.A, prob.grid_shape, jnp.float64)
        gs = vs.grid_shape
        halos = halos_of(vs.offsets)
        slab = 4
        c_pad = coeffs_to_padded(
            vs.coeffs.reshape(len(vs.offsets), -1), gs, halos, slab
        )
        rng = np.random.default_rng(4)
        x = rng.random(prob.A.n_rows)
        xp = var_to_padded(jnp.asarray(x), gs, halos, slab)
        with pltpu.force_tpu_interpret_mode():
            yp = var_stencil_kernel_padded(
                xp, c_pad, vs.offsets, gs, mode="spmv", slab=slab
            )
        np.testing.assert_allclose(
            np.asarray(var_from_padded(yp, gs, halos)), prob.A @ x,
            atol=1e-12,
        )


def test_dia_kernel_operator_parity():
    """DiaKernelOperator (the TPU device format wrapping this kernel)
    matches the host CSR operator through its flat-vector matvec."""
    from amg_tpu.setup.structured import DiaKernelOperator

    prob, vs, gs, halos, _ = _setup_elasticity()
    op = DiaKernelOperator.from_var_stencil(vs, slab=4)
    rng = np.random.default_rng(5)
    x = rng.random(prob.A.n_rows)
    with pltpu.force_tpu_interpret_mode():
        y = op @ jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(y), prob.A @ x, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(op.diagonal()), prob.A.diagonal(), atol=1e-14
    )


class TestSpmvCompMode:
    """Compensated double-single SpMV mode (round 4): y_hi + y_err must be
    accurate to ~eps^2 — the fast-path matvec of the DS Krylov solve
    (solve/krylov.ds_pcg via ops/ds.matvec_comp dispatch)."""

    def test_matches_xla_compensated(self):
        import jax.numpy as jnp

        from amg_tpu.ops.ds import stencil_matvec_comp
        from amg_tpu.problems.elasticity import elasticity_beam
        from amg_tpu.setup.structured import (
            csr_to_dia_stencil,
            dia_kernel_pair,
        )

        prob = elasticity_beam(nx=12, ny=4, nz=4, bc="identity")
        vs, vs_lo = csr_to_dia_stencil(
            prob.A, prob.grid_shape, jnp.float32, return_lo=True
        )
        op, op_lo = dia_kernel_pair(vs, vs_lo)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(prob.n) * 10,
            jnp.float32,
        )
        with pltpu.force_tpu_interpret_mode():
            y, e = op.matvec_comp(x)
        got = np.asarray(y, np.float64) + np.asarray(e, np.float64)
        yr, er = stencil_matvec_comp(vs, x)
        ref = np.asarray(yr, np.float64) + np.asarray(er, np.float64)
        scale = np.linalg.norm(ref)
        assert np.linalg.norm(got - ref) / scale < 1e-13

    def test_ds_matvec_pair_true_operator(self):
        """ds_matvec on the kernel pair reproduces the TRUE f64 operator
        applied to the f32 input to ~1e-12 relative (operator rounding
        fully compensated by the (hi, lo) coefficient split)."""
        import jax.numpy as jnp

        from amg_tpu.ops.ds import DS, ds_matvec
        from amg_tpu.problems.elasticity import elasticity_beam
        from amg_tpu.setup.structured import (
            csr_to_dia_stencil,
            dia_kernel_pair,
        )

        prob = elasticity_beam(nx=12, ny=4, nz=4, bc="identity")
        pair = dia_kernel_pair(
            *csr_to_dia_stencil(
                prob.A, prob.grid_shape, jnp.float32, return_lo=True
            )
        )
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(prob.n), jnp.float32
        )
        with pltpu.force_tpu_interpret_mode():
            y = ds_matvec(pair, DS(x, jnp.zeros_like(x)))
        got = np.asarray(y.hi, np.float64) + np.asarray(y.lo, np.float64)
        exact = prob.A.to_scipy() @ np.asarray(x, np.float64)
        assert (
            np.linalg.norm(got - exact) / np.linalg.norm(exact) < 1e-12
        )
