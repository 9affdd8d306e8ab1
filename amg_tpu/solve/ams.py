"""Auxiliary-space (Hiptmair/AMS-style) preconditioner for curl-curl systems.

The reference feeds its MFEM Maxwell problem (src/Maxwell.cpp:50-208)
straight into BoomerAMG, which converges poorly: the curl-curl operator's
near-nullspace is the whole range of the discrete gradient G (C @ G = 0 by
the exact sequence), and nodal AMG cannot see it in the edge unknowns. The
standard cure (hypre's AMS / Hiptmair's hybrid smoother) corrects in the
potential space explicitly. This module implements the additive variant:

    M^-1 r  =  w S^-1 r  +  G · B_n( G^T r )

where w S^-1 is one (SPD) weighted Jacobi/L1 sweep on the edge operator and
B_n is one AMG V-cycle on the nodal operator A_n = G^T A G (for the lumped
lowest-order discretization A_n = sigma·vol·(node Laplacian) — the exact
sequence kills the curl term). M is SPD, so it drives PCG.

Everything device-side is jittable: G converts to the gather-amortized
device formats and the nodal cycle is the ordinary hierarchy apply — so the
preconditioner inherits sharding/BSR/async machinery for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from amg_tpu.setup.hierarchy import (
    Hierarchy,
    HierarchyParams,
    build_hierarchy,
)
from amg_tpu.solve.cycles import CycleConfig, CycleType, mult_vcycle
from amg_tpu.sparse.csr import CSRMatrix


class AMSData(NamedTuple):
    """Device-side preconditioner state (a pytree)."""

    G: object  # edges × nodes device matrix
    Gt: object  # nodes × edges
    inv_wscale: jnp.ndarray  # edge smoother w / scale
    node_hier: Hierarchy  # AMG hierarchy on G^T A G


def build_ams(
    A_edge: CSRMatrix,
    G: CSRMatrix,
    params: HierarchyParams | None = None,
    smoother_weight: float | None = None,
) -> tuple:
    """Set up the AMS preconditioner. Returns (AMSData, node CycleConfig).

    `G` is the discrete gradient (e.g. Problem.aux['G'] from
    amg_tpu.problems.maxwell)."""
    import scipy.sparse as sp

    from amg_tpu.setup.hierarchy import _format_converter
    from amg_tpu.setup.rap import estimate_rho_dinv_a

    if params is None:
        params = HierarchyParams(keep_stencil_fine=False)
    # nodal operator A_n = G^T A G (host SpGEMM, setup-time)
    As = A_edge.to_scipy().tocsr()
    Gs = G.to_scipy().tocsr()
    A_n = CSRMatrix.from_scipy((Gs.T @ (As @ Gs)).tocsr())
    _, node_hier = build_hierarchy(A_n, params)

    # SPD edge smoother term: w * scale^-1 with w = 1/rho(S^-1 A)
    scale = A_edge.l1_row_norms()
    scale = np.where(scale == 0.0, 1.0, scale)
    if smoother_weight is None:
        smoother_weight = 1.0 / max(
            estimate_rho_dinv_a(A_edge, seed=params.seed, scale=scale), 1e-12
        )
    convert = _format_converter(params)
    data = AMSData(
        G=convert(G, params.dtype),
        Gt=convert(G.transpose(), params.dtype),
        inv_wscale=jnp.asarray(smoother_weight / scale, dtype=params.dtype),
        node_hier=node_hier,
    )
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=params.smoother)
    return data, cfg


def ams_precondition(
    ams: AMSData, cfg: CycleConfig, r: jnp.ndarray
) -> jnp.ndarray:
    """Apply M^-1 r = w S^-1 r + G C(G^T r), where C is one cycle of the
    configured type on the nodal hierarchy (MULT V-cycle by default; any
    additive cycle — multadd/AFACx/BPX — via cfg.cycle, so the async
    additive machinery drives the node correction too). Jittable."""
    from amg_tpu.solve.cycles import cycle_step

    e_smooth = ams.inv_wscale * r
    r_n = ams.Gt @ r
    if cfg.cycle == CycleType.MULT:
        e_n = mult_vcycle(ams.node_hier, cfg, jnp.zeros_like(r_n), r_n)
    else:
        e_n = cycle_step(ams.node_hier, cfg, jnp.zeros_like(r_n), r_n)
    return e_smooth + ams.G @ e_n


def build_sharded_ams(
    A_edge: CSRMatrix,
    G: CSRMatrix,
    mesh,
    params: HierarchyParams | None = None,
    smoother_weight: float | None = None,
) -> tuple:
    """Row-sharded AMS over a device mesh with halo-segment comm — the
    distributed Maxwell path (BASELINE config 5: Maxwell + multi-device +
    DMEM-style comm; reference: src/Maxwell.cpp:50-208 solved through
    src/DMEM_Add.cpp/DMEM_Comm.cpp). The edge operator, the discrete
    gradient G and its transpose are HaloELL (boundary-segment exchange
    only — no all-gathers), and the nodal hierarchy is the halo-comm
    distributed hierarchy.

    Returns (A_halo, AMSData, node_cfg, pad_edge, pad_node): vectors pad
    via parallel.dist.pad_vector(b, pad_edge, mesh)."""
    from amg_tpu.parallel.dist import _pad_csr, build_dist_hierarchy, shard_vector
    from amg_tpu.parallel.spcomm import build_halo_ell
    from amg_tpu.setup.hierarchy import build_host_hierarchy
    from amg_tpu.setup.rap import estimate_rho_dinv_a

    if params is None:
        params = HierarchyParams(keep_stencil_fine=False, device_format="ell")
    D = int(mesh.devices.size)
    E = A_edge.n_rows
    # nodal operator A_n = G^T A G + halo-distributed hierarchy on it
    As = A_edge.to_scipy().tocsr()
    Gs = G.to_scipy().tocsr()
    A_n = CSRMatrix.from_scipy((Gs.T @ (As @ Gs)).tocsr())
    hh_n = build_host_hierarchy(A_n, params)
    node_hier, pad_node = build_dist_hierarchy(hh_n, params, mesh, comm="halo")
    N_pad = pad_node[1]
    unit = D if params.device_format == "ell" else 16 * D
    E_pad = -(-E // unit) * unit
    A_pad = _pad_csr(A_edge, E_pad, E_pad, unit_diag_from=E)
    G_pad = _pad_csr(G, E_pad, N_pad)  # zero pad block: pads decouple
    A_halo = build_halo_ell(A_pad, mesh, dtype=params.dtype)
    G_h = build_halo_ell(G_pad, mesh, dtype=params.dtype)
    Gt_h = build_halo_ell(G_pad.transpose(), mesh, dtype=params.dtype)

    scale = A_pad.l1_row_norms()  # pad rows: unit diag -> scale 1
    scale = np.where(scale == 0.0, 1.0, scale)
    if smoother_weight is None:
        smoother_weight = 1.0 / max(
            estimate_rho_dinv_a(
                A_edge, seed=params.seed, scale=scale[:E]
            ),
            1e-12,
        )
    data = AMSData(
        G=G_h,
        Gt=Gt_h,
        inv_wscale=shard_vector(
            jnp.asarray(smoother_weight / scale, dtype=params.dtype), mesh
        ),
        node_hier=node_hier,
    )
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=params.smoother)
    return A_halo, data, cfg, (E, E_pad), pad_node


def ams_async_additive_solve(
    A_dev,
    ams: AMSData,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    key=None,
    omega: float = 0.5,  # stable under bounded staleness (0.7 diverges
    fire_prob: float = 0.8,  # at sim_read_delay=2 on the n=8 testbed)
    sim_read_delay: int = 2,
    tol: float = 1e-6,
    max_cycles: int = 600,
):
    """ASYNCHRONOUS additive auxiliary-space Maxwell solve — the literal
    BASELINE config-5 composition (reference: src/Maxwell.cpp fed into
    the async additive engine, src/DMEM_Add.cpp:20-178): the edge
    smoother and each nodal level form independent correction groups that
    fire at their own rates against bounded-staleness iterates (the
    SEQ_Add_Vcycle_SimRand model, src/SEQ_AMG.cpp:531-793), corrections
    accumulated into x.

        group 0  : c = w S^-1 r            (edge Jacobi)
        group k+1: c = G · add_corr_k(G^T r)   (node level k, prolongated
                                                through the gradient)

    This mode trades convergence rate for asynchrony exactly as the
    reference's async additive does (rate ~0.97/cycle here vs the
    PCG-wrapped AMS's ~0.5); solve_ams_pcg / solve_sharded_ams_pcg are
    the production Maxwell routes. One jitted lax.while_loop.
    """
    import jax

    from amg_tpu.solve.cycles import CycleConfig, CycleType, additive_correction
    from amg_tpu.smooth import SmootherType

    if x0 is None:
        x0 = jnp.zeros_like(b)
    if key is None:
        key = jax.random.PRNGKey(0)
    nh = ams.node_hier
    Lg = 1 + nh.num_levels  # correction groups
    W = sim_read_delay + 1
    cfg_add = CycleConfig(
        cycle=CycleType.MULTADD, smoother=SmootherType.L1_JACOBI
    )

    def group_correction(g, r):
        if g == 0:
            return ams.inv_wscale * r
        rn = ams.Gt @ r
        return ams.G @ additive_correction(nh, cfg_add, rn, g - 1)

    def loop(A_, ams_, b_, x0_, key_):
        r0n = jnp.linalg.norm(b_ - A_ @ x0_)
        safe = jnp.where(r0n == 0.0, 1.0, r0n)
        ring0 = jnp.tile(x0_[None, :], (W, 1))
        hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=b_.dtype)
        hist0 = hist0.at[0].set(1.0)

        def body(st):
            x, ring, k, rel, hist, kk = st
            kk, kf, kr = jax.random.split(kk, 3)
            fire = jax.random.uniform(kf, (Lg,), b_.dtype) < fire_prob
            cols = jnp.round(
                jnp.maximum(k - sim_read_delay, 0)
                + jax.random.uniform(kr, (Lg,))
                * (k - jnp.maximum(k - sim_read_delay, 0))
            ).astype(jnp.int32)
            c = jnp.zeros_like(x)
            for g in range(Lg):
                x_stale = ring[cols[g] % W]
                r_g = b_ - A_ @ x_stale
                c = c + jnp.where(
                    fire[g], group_correction(g, r_g), jnp.zeros_like(c)
                )
            x = x + omega * c
            r = b_ - A_ @ x
            rel = jnp.linalg.norm(r) / safe
            hist = hist.at[k + 1].set(rel)
            ring = ring.at[(k + 1) % W].set(x)
            return (x, ring, k + 1, rel, hist, kk)

        def cond(st):
            _, _, k, rel, _, _ = st
            return (k < max_cycles) & (rel > tol) & (rel < 1e3)

        st = (
            x0_, ring0, jnp.asarray(0, jnp.int32),
            jnp.asarray(1.0, b_.dtype), hist0, key_,
        )
        x, _, it, rel, hist, _ = jax.lax.while_loop(cond, body, st)
        return x, it, rel, hist

    x, it, rel, hist = jax.jit(loop)(A_dev, ams, b, x0, key)
    from amg_tpu.solve.driver import SolveResult

    return SolveResult(x=x, iters=it, rel_resnorm=rel, history=hist)


def solve_sharded_ams_pcg(
    A_halo,
    ams: AMSData,
    cfg: CycleConfig,
    b: jnp.ndarray,
    mesh,
    pad_edge,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-8,
    max_iters: int = 200,
):
    """PCG on the sharded edge system (halo comm); b is the UNPADDED host
    RHS; the returned x is unpadded. Pad rows carry zero residual (unit
    diagonal, zero RHS) so norms and dots are exact."""
    import jax

    from amg_tpu.parallel.dist import pad_vector, unpad_vector
    from amg_tpu.solve.krylov import pcg

    b_pad = pad_vector(jnp.asarray(b), pad_edge, mesh)
    x0_pad = (
        jnp.zeros_like(b_pad)
        if x0 is None
        else pad_vector(jnp.asarray(x0), pad_edge, mesh)
    )
    res = jax.jit(
        lambda A_, ams_, b_, x0_: pcg(
            lambda v: A_ @ v,
            lambda r: ams_precondition(ams_, cfg, r),
            b_,
            x0_,
            tol=tol,
            max_iters=max_iters,
        )
    )(A_halo, ams, b_pad, x0_pad)
    return res._replace(x=unpad_vector(res.x, pad_edge))


def solve_ams_pcg(
    A_dev,
    ams: AMSData,
    cfg: CycleConfig,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    tol: float = 1e-8,
    max_iters: int = 200,
):
    """PCG on the edge system with the AMS preconditioner."""
    import jax

    from amg_tpu.solve.krylov import pcg

    if x0 is None:
        x0 = jnp.zeros_like(b)
    return jax.jit(
        lambda A_, ams_, b_, x0_: pcg(
            lambda v: A_ @ v,
            lambda r: ams_precondition(ams_, cfg, r),
            b_,
            x0_,
            tol=tol,
            max_iters=max_iters,
        )
    )(A_dev, ams, b, x0)
