"""FEM problem generators + matrix I/O tests (baseline configs 4-5 problems)."""

import numpy as np
import pytest

import jax.numpy as jnp

from amg_tpu.problems.elasticity import elasticity_beam, lame_params
from amg_tpu.problems.io import (
    bin_to_text,
    problem_from_file,
    rcm_reorder,
    read_binary_triplets,
    text_to_bin,
    write_binary_triplets,
)
from amg_tpu.problems.maxwell import maxwell_curlcurl
from amg_tpu.problems import laplacian_2d_5pt


class TestElasticity:
    def test_spd_2d(self):
        p = elasticity_beam(nx=12, ny=4)
        A = p.A.to_dense()
        np.testing.assert_allclose(A, A.T, atol=1e-10)
        assert np.linalg.eigvalsh(A).min() > 0

    def test_spd_3d(self):
        p = elasticity_beam(nx=6, ny=2, nz=2)
        A = p.A.to_dense()
        np.testing.assert_allclose(A, A.T, atol=1e-10)
        assert np.linalg.eigvalsh(A).min() > 0

    def test_beam_deflects_down(self):
        p = elasticity_beam(nx=12, ny=4)
        x = np.linalg.solve(p.A.to_dense(), p.rhs)
        assert x.reshape(-1, 2)[:, 1].min() < 0

    def test_patch_test_uniform_strain(self):
        """A displacement linear in x (uniform strain) must be reproduced
        exactly by Q1 elements: residual of u=(x,0) vanishes on interior
        dofs of a homogeneous beam."""
        p = elasticity_beam(nx=8, ny=3, stiff_contrast=1.0)
        # rebuild node coords of free dofs
        nx, ny = 8, 3
        L, H = 8.0, 1.0
        xs = np.linspace(0, L, nx + 1)
        ys = np.linspace(0, H, ny + 1)
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        u = np.zeros(((nx + 1) * (ny + 1), 2))
        u[:, 0] = X.reshape(-1)
        free = np.ones((nx + 1) * (ny + 1), dtype=bool)
        free[: ny + 1] = False  # clamped x=0 nodes
        ufree = u[free].reshape(-1)
        r = p.A.to_dense() @ ufree
        # interior dofs (not adjacent to the clamped face, not on the free
        # end where boundary tractions live) must have zero residual
        # interior in BOTH x and y: surface nodes carry the physical
        # tractions of the uniform-strain state (sigma_yy = lambda*eps_xx)
        node_ids = np.arange((nx + 1) * (ny + 1)).reshape(nx + 1, ny + 1)
        interior_nodes = node_ids[2:-1, 1:-1].reshape(-1)
        free_index = -np.ones((nx + 1) * (ny + 1), dtype=int)
        free_index[free] = np.arange(free.sum())
        dofs = []
        for nd in interior_nodes:
            dofs += [2 * free_index[nd], 2 * free_index[nd] + 1]
        assert np.abs(r[dofs]).max() < 1e-10

    def test_material_contrast(self):
        soft = elasticity_beam(nx=8, ny=3, stiff_contrast=1.0)
        hard = elasticity_beam(nx=8, ny=3, stiff_contrast=50.0)
        # stiffer end region -> smaller tip deflection
        xs = np.linalg.solve(soft.A.to_dense(), soft.rhs)
        xh = np.linalg.solve(hard.A.to_dense(), hard.rhs)
        assert abs(xh.min()) < abs(xs.min())


class TestMaxwell:
    def test_spd_with_mass(self):
        m = maxwell_curlcurl(n=4, sigma=1.0)
        A = m.A.to_dense()
        np.testing.assert_allclose(A, A.T, atol=1e-12)
        assert np.linalg.eigvalsh(A).min() > 0

    def test_gradient_nullspace_dimension(self):
        """sigma=0 curl-curl nullspace = discrete gradients of interior
        nodal potentials: dimension (n-1)^3 — the exact-sequence property."""
        n = 4
        m = maxwell_curlcurl(n=n, sigma=0.0)
        eigs = np.linalg.eigvalsh(m.A.to_dense())
        assert int((np.abs(eigs) < 1e-10).sum()) == (n - 1) ** 3

    def test_gradient_in_nullspace(self):
        """Explicitly: C(grad phi) = 0 for the assembled reduced system."""
        n = 4
        m = maxwell_curlcurl(n=n, sigma=0.0)
        A = m.A.to_dense()
        # gradient of a random interior potential: E on edge (p1,p2) =
        # (phi2 - phi1)/h. Build for x/y/z interior edges.
        rng = np.random.default_rng(0)
        npts = n + 1
        phi = np.zeros((npts, npts, npts))
        phi[1:-1, 1:-1, 1:-1] = rng.random((n - 1, n - 1, n - 1))
        h = 1.0 / n
        comps = []
        for d, shape in enumerate(
            [(n, npts, npts), (npts, n, npts), (npts, npts, n)]
        ):
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[d] = slice(0, n)
            sl_hi[d] = slice(1, n + 1)
            comps.append(
                ((phi[tuple(sl_hi)] - phi[tuple(sl_lo)]) / h).reshape(-1)
            )
        e_full = np.concatenate(comps)
        # restrict to the kept (interior) edges: recompute keep mask
        from amg_tpu.problems.maxwell import _edge_ids

        eshapes, eoff = _edge_ids(n)
        keep = np.ones(int(eoff[-1]), dtype=bool)
        for d in range(3):
            es = eshapes[d]
            eidx = np.stack(
                np.meshgrid(*[np.arange(s) for s in es], indexing="ij"),
                axis=-1,
            ).reshape(-1, 3)
            eid = eoff[d] + np.arange(eidx.shape[0])
            onb = np.zeros(eidx.shape[0], dtype=bool)
            for pax in range(3):
                if pax == d:
                    continue
                onb |= (eidx[:, pax] == 0) | (eidx[:, pax] == npts - 1)
            keep[eid[onb]] = False
        e = e_full[keep]
        assert np.abs(A @ e).max() < 1e-12


class TestMatrixIO:
    def test_binary_roundtrip(self, tmp_path):
        prob = laplacian_2d_5pt(6, 5)
        path = str(tmp_path / "m.bin")
        write_binary_triplets(path, prob.A)
        back = read_binary_triplets(path)
        np.testing.assert_allclose(back.to_dense(), prob.A.to_dense())

    def test_text_bin_roundtrip(self, tmp_path):
        prob = laplacian_2d_5pt(4)
        binp = str(tmp_path / "m.bin")
        txtp = str(tmp_path / "m.txt")
        write_binary_triplets(binp, prob.A)
        bin_to_text(binp, txtp)
        bin2 = text_to_bin(txtp, str(tmp_path / "m2.bin"))
        back = read_binary_triplets(bin2)
        np.testing.assert_allclose(back.to_dense(), prob.A.to_dense())

    def test_symmetrize(self, tmp_path):
        import scipy.sparse as sp

        from amg_tpu.sparse.csr import CSRMatrix

        # store only the lower triangle, read back symmetrized
        prob = laplacian_2d_5pt(5)
        low = CSRMatrix.from_scipy(sp.tril(prob.A.to_scipy()).tocsr())
        path = str(tmp_path / "low.bin")
        write_binary_triplets(path, low)
        back = read_binary_triplets(path, symmetrize=True)
        np.testing.assert_allclose(back.to_dense(), prob.A.to_dense())

    def test_remove_disconnected(self, tmp_path):
        import scipy.sparse as sp

        from amg_tpu.sparse.csr import CSRMatrix

        a = laplacian_2d_5pt(4).A.to_dense()
        n = a.shape[0]
        big = np.zeros((n + 2, n + 2))
        big[:n, :n] = a
        big[n, n] = 1.0  # diagonal-only decoupled point
        big[n + 1, n + 1] = 2.0
        path = str(tmp_path / "d.bin")
        write_binary_triplets(path, CSRMatrix.from_dense(big))
        back = read_binary_triplets(path, remove_disconnected=True)
        assert back.n_rows == n
        np.testing.assert_allclose(back.to_dense(), a)

    def test_rcm_preserves_spectrum(self):
        prob = laplacian_2d_5pt(5)
        perm_A, perm = rcm_reorder(prob.A)
        e1 = np.linalg.eigvalsh(prob.A.to_dense())
        e2 = np.linalg.eigvalsh(perm_A.to_dense())
        np.testing.assert_allclose(e1, e2, atol=1e-10)

    def test_problem_from_file_solvable(self, tmp_path):
        from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy
        from amg_tpu.smooth import SmootherType
        from amg_tpu.solve import CycleConfig, CycleType, solve

        prob = laplacian_2d_5pt(12)
        path = str(tmp_path / "lap.bin")
        write_binary_triplets(path, prob.A)
        fp = problem_from_file(path)
        params = HierarchyParams(smoother=SmootherType.L1_JACOBI)
        hh, hier = build_hierarchy(fp.A, params)
        b = jnp.asarray(np.random.default_rng(0).random(fp.A.n_rows))
        cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
        res = solve(hier, cfg, b, tol=1e-8, max_cycles=60)
        assert float(res.rel_resnorm) <= 1e-8


class TestGradedMesh:
    def test_spd_and_multiscale(self):
        from amg_tpu.problems.amr import laplacian_graded

        p = laplacian_graded(24, gamma=2.5)
        A = p.A.to_dense()
        np.testing.assert_allclose(A, A.T, atol=1e-12)
        assert np.linalg.eigvalsh(A).min() > 0
        d = p.A.diagonal()
        assert d.max() / d.min() > 20  # multiscale h (the AMR character)

    def test_amg_solves_graded(self):
        from amg_tpu.problems.amr import laplacian_graded
        from amg_tpu.setup.hierarchy import HierarchyParams, build_hierarchy
        from amg_tpu.smooth import SmootherType
        from amg_tpu.solve import CycleConfig, CycleType, solve

        p = laplacian_graded(24, gamma=2.5)
        hh, hier = build_hierarchy(
            p.A, HierarchyParams(smoother=SmootherType.L1_JACOBI)
        )
        b = jnp.asarray(np.random.default_rng(0).random(p.A.n_rows))
        cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
        res = solve(hier, cfg, b, tol=1e-8, max_cycles=100)
        assert float(res.rel_resnorm) <= 1e-8
        assert res.num_iters() <= 40
