"""DIA (generalized-diagonal) stencil format for interleaved vector
problems: the gather-free device format for structured-mesh FEM operators
(elasticity config-4 fine level).

Reference workhorse being replaced: unstructured CSR row loops
(src/SMEM_MatVec.cpp:123-259); here the translation structure of the Q1
beam operator turns SpMV into shifted elementwise multiply-adds.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from amg_tpu.problems.elasticity import elasticity_beam
from amg_tpu.setup.structured import csr_to_dia_stencil


class TestDiaStencil:
    @pytest.mark.parametrize(
        "dims", [(8, 3, 0), (8, 3, 3), (5, 4, 2)]
    )
    def test_matvec_parity(self, dims):
        nx, ny, nz = dims
        prob = elasticity_beam(nx=nx, ny=ny, nz=nz, bc="identity")
        vs = csr_to_dia_stencil(prob.A, prob.grid_shape, jnp.float64)
        rng = np.random.default_rng(0)
        x = rng.random(prob.A.n_rows)
        np.testing.assert_allclose(
            np.asarray(vs @ jnp.asarray(x)), prob.A @ x, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(vs.diagonal()), prob.A.diagonal(), atol=1e-14
        )

    def test_offset_count_3d(self):
        """3D Q1 elasticity in interleaved ordering is exactly 99
        generalized diagonals: 9 (dz,dy) node offsets x 11 lane offsets
        (3*dx_node + comp_b - comp_a in [-5, 5])."""
        prob = elasticity_beam(nx=6, ny=3, nz=3, bc="identity")
        vs = csr_to_dia_stencil(prob.A, prob.grid_shape, jnp.float64)
        assert len(vs.offsets) == 99
        lane = sorted({o[-1] for o in vs.offsets})
        assert lane == list(range(-5, 6))

    def test_identity_bc_matches_reduced(self):
        """bc='identity' full-grid system has the same free-dof solution as
        the bc='reduce' eliminated system, and exact zeros on clamped dofs."""
        import scipy.sparse.linalg as spla

        pf = elasticity_beam(nx=8, ny=3, nz=3, bc="identity")
        pr = elasticity_beam(nx=8, ny=3, nz=3, bc="reduce")
        xf = spla.spsolve(pf.A.to_scipy().tocsc(), pf.rhs)
        xr = spla.spsolve(pr.A.to_scipy().tocsc(), pr.rhs)
        d, npts = 3, (9, 4, 4)
        node_id = np.arange(int(np.prod(npts))).reshape(npts)
        clamped = np.zeros(node_id.size * d, dtype=bool)
        for i in range(d):
            clamped[node_id[0].reshape(-1) * d + i] = True
        assert np.abs(xf[clamped]).max() == 0.0
        # two spsolve factorizations of an ill-conditioned elasticity system
        # agree to ~1e-11 relative to the solution scale; near-zero entries
        # carry cancellation noise, so use a norm-scaled absolute tolerance
        np.testing.assert_allclose(
            xf[~clamped], xr, rtol=1e-6, atol=1e-8 * np.abs(xr).max()
        )

    def test_rejects_unstructured(self):
        """A matrix that is not translation-structured on the claimed grid
        must be rejected, not silently mangled."""
        import scipy.sparse as sp

        from amg_tpu.sparse.csr import CSRMatrix

        rng = np.random.default_rng(0)
        n = 64
        A = sp.random(n, n, density=0.3, random_state=0, format="csr")
        with pytest.raises(ValueError, match="generalized diagonals"):
            csr_to_dia_stencil(
                CSRMatrix.from_scipy(A), (4, 4, 4), jnp.float64,
                max_offsets=8,
            )
