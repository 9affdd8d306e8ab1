"""Pallas fused stencil kernel: semantics tests in interpret mode on CPU.

(On-device performance and compilation are exercised by bench.py on the real
chip; these tests pin the kernel's numerics against the assembled matrix.)
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import amg_tpu.ops.pallas_stencil as ps
from amg_tpu.problems import laplacian_3d_7pt, laplacian_3d_27pt, difconv_3d
from amg_tpu.sparse.stencil import StencilOperator, stencil_to_csr


def run_interp(fn, *args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kw)


CASES = [
    ("27pt-box", lambda: laplacian_3d_27pt(8).stencil),  # separable fast path
    ("7pt", lambda: laplacian_3d_7pt(6, 7, 5, cx=1.0, cy=2.0, cz=0.5).stencil),
    ("difconv", lambda: difconv_3d(6, atype=2, ax=-1.5).stencil),
]


class TestPallasStencil:
    @pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
    def test_spmv_matches_assembled(self, name, gen):
        st = gen()
        n = int(np.prod(st.grid_shape))
        x = jnp.asarray(np.random.default_rng(0).random(n))
        y_ref = stencil_to_csr(st) @ np.asarray(x)
        y_pal = run_interp(ps.stencil_matvec_pallas, x, st)
        np.testing.assert_allclose(np.asarray(y_pal), y_ref, atol=1e-12)

    def test_jacobi_sweep_fused(self):
        st = laplacian_3d_27pt(8).stencil
        n = 512
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.random(n))
        b = jnp.asarray(rng.random(n))
        alpha = 2.0 / 3.0 / 52.0
        y_ref = np.asarray(u) + alpha * (
            np.asarray(b) - stencil_to_csr(st) @ np.asarray(u)
        )
        u_pal = run_interp(ps.stencil_jacobi_sweep, u, b, st, alpha)
        np.testing.assert_allclose(np.asarray(u_pal), y_ref, atol=1e-12)

    def test_padded_roundtrip(self):
        gs = (5, 6, 7)
        x = jnp.asarray(np.random.default_rng(2).random(int(np.prod(gs))))
        p = ps.to_padded(x, gs)
        assert p.shape == ps.padded_shape(gs)
        np.testing.assert_allclose(
            np.asarray(ps.from_padded(p, gs)), np.asarray(x)
        )
        # shell is zero
        assert float(jnp.sum(jnp.abs(p))) == pytest.approx(
            float(jnp.sum(jnp.abs(x))), rel=1e-12
        )

    def test_uniform_box_detection(self):
        from amg_tpu.ops.pallas_stencil import _uniform_box_weights

        st = laplacian_3d_27pt(4).stencil
        taps = tuple(
            (int(o[0]), int(o[1]), int(o[2]), float(w))
            for o, w in zip(st.offsets, np.asarray(st.weights))
        )
        assert _uniform_box_weights(taps) == (-1.0, 26.0)
        st7 = laplacian_3d_7pt(4).stencil
        taps7 = tuple(
            (int(o[0]), int(o[1]), int(o[2]), float(w))
            for o, w in zip(st7.offsets, np.asarray(st7.weights))
        )
        assert _uniform_box_weights(taps7) is None


def test_sweep_vec_norm_fused():
    """sweep_vec_norm emits the swept iterate AND the incoming iterate's
    residual-norm partials in one pass (the fused residual+norm of the
    production struct solve loop)."""
    st = laplacian_3d_27pt(8).stencil
    gs = st.grid_shape
    n = int(np.prod(gs))
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random(n))
    b = jnp.asarray(rng.random(n))
    scale = jnp.asarray(0.5 / stencil_to_csr(st).diagonal())
    r_ref = np.asarray(b) - stencil_to_csr(st) @ np.asarray(u)
    u_ref = np.asarray(u) + np.asarray(scale) * r_ref

    up, bp = ps.to_padded(u, gs), ps.to_padded(b, gs)
    sp_ = ps.to_padded(scale, gs)
    weights = tuple(float(w) for w in np.asarray(st.weights))
    out, norm = run_interp(
        ps.stencil_kernel_padded, up, bp, weights, gs, st.offsets,
        0.0, sp_, "sweep_vec_norm",
    )
    np.testing.assert_allclose(
        np.asarray(ps.from_padded(out, gs)), u_ref, atol=1e-12
    )
    np.testing.assert_allclose(
        float(jnp.sum(norm)), float(np.sum(r_ref**2)), rtol=1e-12
    )


def test_double_sweep_fused():
    """sweep2_vec: two fused Jacobi sweeps per launch equal two single
    sweeps exactly (reach-2 halo recompute)."""
    st = laplacian_3d_27pt(10).stencil
    gs = st.grid_shape
    n = int(np.prod(gs))
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.random(n))
    b = jnp.asarray(rng.random(n))
    A = stencil_to_csr(st)
    scale = jnp.asarray(0.6 / A.diagonal())
    u1 = np.asarray(u) + np.asarray(scale) * (np.asarray(b) - A @ np.asarray(u))
    u2 = u1 + np.asarray(scale) * (np.asarray(b) - A @ u1)

    slab = 4
    up, bp = ps.to_padded(u, gs, slab), ps.to_padded(b, gs, slab)
    sp_ = ps.to_padded(scale, gs, slab)
    weights = tuple(float(w) for w in np.asarray(st.weights))
    out = run_interp(
        ps.stencil_kernel_padded, up, bp, weights, gs, st.offsets,
        0.0, sp_, "sweep2_vec", slab,
    )
    np.testing.assert_allclose(
        np.asarray(ps.from_padded(out, gs)), u2, atol=1e-12
    )


def test_double_sweep_scalar_alpha():
    """sweep2 (scalar weight, no scale stream) equals two single sweeps."""
    st = laplacian_3d_27pt(10).stencil
    gs = st.grid_shape
    n = int(np.prod(gs))
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.random(n))
    b = jnp.asarray(rng.random(n))
    A = stencil_to_csr(st)
    alpha = 0.6 / float(A.diagonal()[0])
    u1 = np.asarray(u) + alpha * (np.asarray(b) - A @ np.asarray(u))
    u2 = u1 + alpha * (np.asarray(b) - A @ u1)
    slab = 4
    up, bp = ps.to_padded(u, gs, slab), ps.to_padded(b, gs, slab)
    weights = tuple(float(w) for w in np.asarray(st.weights))
    out = run_interp(
        ps.stencil_kernel_padded, up, bp, weights, gs, st.offsets,
        alpha, None, "sweep2", slab,
    )
    np.testing.assert_allclose(
        np.asarray(ps.from_padded(out, gs)), u2, atol=1e-12
    )


@pytest.mark.parametrize("k", [3, 4])
@pytest.mark.parametrize("slab", [4, 6])
@pytest.mark.parametrize("use_scale", [True, False])
def test_ksweep_fused(k, slab, use_scale):
    """sweepK / sweepK_vec: K fused Jacobi sweeps per launch equal K single
    sweeps exactly (reach-K halo recompute, ping-pong intermediates),
    including the edge slabs and the slab == K boundary case."""
    st = laplacian_3d_27pt(10).stencil
    gs = st.grid_shape
    n = int(np.prod(gs))
    rng = np.random.default_rng(100 + k)
    u = jnp.asarray(rng.random(n))
    b = jnp.asarray(rng.random(n))
    A = stencil_to_csr(st)
    if use_scale:
        scale = jnp.asarray(0.6 / A.diagonal())
        sp_ = ps.to_padded(scale, gs, slab)
        alpha, mode = 0.0, f"sweep{k}_vec"
        sc = np.asarray(scale)
    else:
        alpha = 0.6 / float(A.diagonal()[0])
        sp_, mode = None, f"sweep{k}"
        sc = alpha
    u_ref = np.asarray(u)
    for _ in range(k):
        u_ref = u_ref + sc * (np.asarray(b) - A @ u_ref)
    up, bp = ps.to_padded(u, gs, slab), ps.to_padded(b, gs, slab)
    weights = tuple(float(w) for w in np.asarray(st.weights))
    out = run_interp(
        ps.stencil_kernel_padded, up, bp, weights, gs, st.offsets,
        alpha, sp_, mode, slab,
    )
    np.testing.assert_allclose(
        np.asarray(ps.from_padded(out, gs)), u_ref, atol=1e-12
    )


def test_ksweep_two_slabs_edge():
    """G == 2 (both slabs are edge slabs) still bit-matches chained sweeps."""
    st = laplacian_3d_27pt(8).stencil  # Zr = 16 at slab 8 -> G = 2
    gs = st.grid_shape
    n = int(np.prod(gs))
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random(n))
    b = jnp.asarray(rng.random(n))
    A = stencil_to_csr(st)
    alpha = 0.6 / float(A.diagonal()[0])
    u_ref = np.asarray(u)
    for _ in range(3):
        u_ref = u_ref + alpha * (np.asarray(b) - A @ u_ref)
    slab = 8
    up, bp = ps.to_padded(u, gs, slab), ps.to_padded(b, gs, slab)
    weights = tuple(float(w) for w in np.asarray(st.weights))
    out = run_interp(
        ps.stencil_kernel_padded, up, bp, weights, gs, st.offsets,
        alpha, None, "sweep3", slab,
    )
    np.testing.assert_allclose(
        np.asarray(ps.from_padded(out, gs)), u_ref, atol=1e-12
    )
