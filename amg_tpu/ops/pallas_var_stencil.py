"""Fused Pallas VARIABLE-coefficient stencil kernels (DIA / generalized-
diagonal operators): the single-chip fast path for structured-mesh FEM
systems — elasticity in interleaved node ordering (99 generalized
diagonals), vardifconv/graded scalar problems (7 diagonals).

XLA lowers the DIA matvec (sum of shifted elementwise multiplies) to ~m
separate HBM passes over x plus m coefficient streams — measured 54 GB/s on
v5e for the 99-offset elasticity operator. This kernel makes one pass:
grid over z-slabs; each program DMAs its u slab (with per-axis halos) and
the slab's m coefficient planes into VMEM double-buffered, computes all m
taps from VMEM, and writes the slab. Taps are grouped by lane offset dx:
one lane roll per distinct dx, then each (dz, dy) tap in the group is a
FREE row-offset slice of the flattened ((rows)*Yr, Xr) view — (dz*Yr + dy)
rows — so the VPU work is ~2 ops/tap/element plus ~#dx rolls.

Traffic per matvec: coeffs once (the m planes ARE the matrix — this is the
irreducible stream), u once, y once. The stream bound must be computed on
the PADDED coefficient volume (c_pad bytes / 819 GB/s): for the 99-offset
beam operators that is 218 us at 157k dofs / 386 us at 362k dofs, of
which the kernel sustains 86-92% (round-4 measurement; the earlier
"~110 Gnnz/s" figure here ignored lane/sublane padding and understated
attained efficiency by ~3x). Benchmark chains of this operator MUST
normalize between applications — ||A|| ~ 1e3 overflows f32 after ~12
repeated applications and Inf/NaN chains time unreliably on the relay.

State layout: padded (Zr, Yr, Xr) with a zero shell of per-axis halo
widths (hz, hy, hx) = max |offset| per axis; interior at [hz:hz+Z,
hy:hy+Y, hx:hx+X]. Coefficients use the SAME layout per plane, stacked as
(m, Zr, Yr, Xr), zero outside the interior.

Replaces the reference's unstructured CSR row loops for its structured-mesh
FEM problems (reference: src/SMEM_MatVec.cpp:123-259, src/Elasticity.cpp).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def halos_of(offsets) -> Tuple[int, int, int]:
    """Per-axis halo widths (max |offset|) for an offset set."""
    o = np.asarray(offsets, dtype=np.int64)
    return tuple(int(v) for v in np.abs(o).max(axis=0))


def var_padded_shape(grid_shape, halos, slab: int = 4):
    Z, Y, X = grid_shape
    hz, hy, hx = halos
    return (
        _round_up(Z + 2 * hz, slab),
        _round_up(Y + 2 * hy, 8),
        _round_up(X + 2 * hx, LANE),
    )


def var_to_padded(x: jnp.ndarray, grid_shape, halos, slab: int = 4):
    Z, Y, X = grid_shape
    Zr, Yr, Xr = var_padded_shape(grid_shape, halos, slab)
    hz, hy, hx = halos
    g = x.reshape(Z, Y, X)
    return jnp.pad(
        g, ((hz, Zr - Z - hz), (hy, Yr - Y - hy), (hx, Xr - X - hx))
    )


def var_from_padded(p: jnp.ndarray, grid_shape, halos):
    Z, Y, X = grid_shape
    hz, hy, hx = halos
    return p[hz : hz + Z, hy : hy + Y, hx : hx + X].reshape(Z * Y * X)


def coeffs_to_padded(coeffs: jnp.ndarray, grid_shape, halos, slab: int = 4):
    """(m, *grid_shape) coefficient planes → (m, Zr, Yr, Xr) padded."""
    m = coeffs.shape[0]
    Z, Y, X = grid_shape
    Zr, Yr, Xr = var_padded_shape(grid_shape, halos, slab)
    hz, hy, hx = halos
    g = coeffs.reshape(m, Z, Y, X)
    return jnp.pad(
        g,
        ((0, 0), (hz, Zr - Z - hz), (hy, Yr - Y - hy), (hx, Xr - X - hx)),
    )


def _var_kernel(
    u_hbm, c_hbm, *rest, offsets, dims, halos, T, G, mode,
):
    """One z-slab of the fused variable-stencil kernel.

    mode: "spmv" y = A u | "residual" r = b - A u |
          "sweep" u + scale*(b - A u) (streamed per-point scale)
    """
    if mode == "sweep":
        b_ref, scale_ref, out_ref, ubufs, cbufs, acc_ref, sem = rest
        err_ref = comp_ref = None
    elif mode == "residual":
        b_ref, out_ref, ubufs, cbufs, acc_ref, sem = rest
        scale_ref = err_ref = comp_ref = None
    elif mode == "spmv_comp":
        out_ref, err_ref, ubufs, cbufs, acc_ref, comp_ref, sem = rest
        b_ref = scale_ref = None
    else:
        out_ref, ubufs, cbufs, acc_ref, sem = rest
        b_ref = scale_ref = err_ref = comp_ref = None
    g = pl.program_id(0)
    Z, Y, X = dims
    hz, hy, hx = halos
    Yr, Xr = out_ref.shape[1], out_ref.shape[2]
    m = c_hbm.shape[0]

    # u rows [gT - hz, gT + T + hz); coeff rows [gT, gT + T) for all m
    # planes. Edge slabs zero-fill the out-of-range u rows (zero shell).
    def dma_u(j, k):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T - hz, T + 2 * hz)],
            ubufs.at[k],
            sem.at[k, 0],
        )

    def dma_u_edge(j, k):
        lo = jnp.maximum(j * T - hz, 0)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(lo, T + hz)],
            ubufs.at[k, pl.ds(jnp.where(j == 0, hz, 0), T + hz)],
            sem.at[k, 0],
        )

    def dma_c(j, k):
        return pltpu.make_async_copy(
            c_hbm.at[:, pl.ds(j * T, T)],
            cbufs.at[k],
            sem.at[k, 1],
        )

    def dma_u_only(k):
        # G == 1: the whole array is the slab; both halo ends zero-filled
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(0, T)],
            ubufs.at[k, pl.ds(hz, T)],
            sem.at[k, 0],
        )

    def start_slab(j, k):
        dma_c(j, k).start()
        if G == 1:
            dma_u_only(k).start()
            ubufs[k, 0:hz, :, :] = jnp.zeros((hz, Yr, Xr), ubufs.dtype)
            ubufs[k, T + hz : T + 2 * hz, :, :] = jnp.zeros(
                (hz, Yr, Xr), ubufs.dtype
            )
            return
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            dma_u(j, k).start()

        @pl.when(~interior)
        def _():
            dma_u_edge(j, k).start()

            @pl.when(j == 0)
            def _():
                ubufs[k, 0:hz, :, :] = jnp.zeros((hz, Yr, Xr), ubufs.dtype)

            @pl.when(j == G - 1)
            def _():
                ubufs[k, T + hz : T + 2 * hz, :, :] = jnp.zeros(
                    (hz, Yr, Xr), ubufs.dtype
                )

    def wait_slab(j, k):
        dma_c(j, k).wait()
        if G == 1:
            dma_u_only(k).wait()
            return
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            dma_u(j, k).wait()

        @pl.when(~interior)
        def _():
            dma_u_edge(j, k).wait()

    @pl.when(g == 0)
    def _():
        start_slab(jnp.int32(0), jnp.int32(0))

    @pl.when(g + 1 < G)
    def _():
        start_slab(g + 1, (g + 1) % 2)

    k_cur = g % 2
    wait_slab(g, k_cur)

    # flat view: (dz, dy) tap = row-offset slice, only dx needs a lane
    # roll. An 8-row zero frame on both ends keeps every slice in-bounds
    # (ro = (hz+dz)*Yr + dy dips to -hy at dz=-hz; reads landing in the
    # frame belong to shell outputs, which are masked to zero below).
    rows = T + 2 * hz
    FR = 8
    flat = jnp.concatenate(
        [
            jnp.zeros((FR, Xr), ubufs.dtype),
            ubufs[k_cur].reshape(rows * Yr, Xr),
            jnp.zeros((FR, Xr), ubufs.dtype),
        ],
        axis=0,
    )

    groups = {}
    for t, (dz, dy, dx) in enumerate(offsets):
        groups.setdefault(int(dx), []).append((int(dz), int(dy), t))

    if mode == "spmv_comp":
        # double-single accumulation: Dekker TwoProd per tap + Knuth
        # TwoSum into acc, with every error term collected in comp — the
        # kernel realization of ops/ds.py::stencil_matvec_comp (y_hi +
        # y_err accurate to ~eps^2; the matvec of the DS Krylov path)
        # Dekker split factor: 2^ceil(mant/2) + 1 (f64 path = interpret
        # parity testing only)
        SPLIT = (
            jnp.float64(134217729.0)
            if ubufs.dtype == jnp.float64
            else jnp.float32(4097.0)
        )
        acc_ref[...] = jnp.zeros((T, Yr, Xr), ubufs.dtype)
        comp_ref[...] = jnp.zeros((T, Yr, Xr), ubufs.dtype)
        for dx, taps in sorted(groups.items()):
            shifted = (
                flat
                if dx == 0
                else pltpu.roll(flat, jnp.int32((-dx) % Xr), 1)
            )
            for dz, dy, t in taps:
                ro = FR + (hz + dz) * Yr + dy
                blk = shifted[ro : ro + T * Yr, :].reshape(T, Yr, Xr)
                c = cbufs[k_cur, t]
                p = c * blk
                cc = SPLIT * c
                c_hi = cc - (cc - c)
                c_lo = c - c_hi
                bb_ = SPLIT * blk
                b_hi = bb_ - (bb_ - blk)
                b_lo = blk - b_hi
                pe = (
                    (c_hi * b_hi - p) + c_hi * b_lo + c_lo * b_hi
                ) + c_lo * b_lo
                a = acc_ref[...]
                s = a + p
                bb = s - a
                e = (a - (s - bb)) + (p - bb)
                acc_ref[...] = s
                comp_ref[...] = comp_ref[...] + (e + pe)
    else:
        first = True
        for dx, taps in sorted(groups.items()):
            shifted = (
                flat
                if dx == 0
                else pltpu.roll(flat, jnp.int32((-dx) % Xr), 1)
            )
            partial = None
            for dz, dy, t in taps:
                ro = FR + (hz + dz) * Yr + dy
                blk = shifted[ro : ro + T * Yr, :].reshape(T, Yr, Xr)
                # coefficient planes may stream at a narrower dtype (bf16):
                # convert on the VPU, accumulate at the operand precision
                term = cbufs[k_cur, t].astype(ubufs.dtype) * blk
                partial = term if partial is None else partial + term
            # accumulate through acc_ref so at most ~2 slab temporaries are
            # live (Mosaic's scoped-VMEM accounting sums live temporaries)
            if first:
                acc_ref[...] = partial
                first = False
            else:
                acc_ref[...] = acc_ref[...] + partial

    acc = acc_ref[...]
    zi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 0) + g * T
    yi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 2)
    interior = (
        (zi >= hz) & (zi < hz + Z)
        & (yi >= hy) & (yi < hy + Y)
        & (xi >= hx) & (xi < hx + X)
    )
    if mode == "spmv":
        val = acc
    elif mode == "spmv_comp":
        out_ref[...] = jnp.where(interior, acc, 0.0)
        err_ref[...] = jnp.where(interior, comp_ref[...], 0.0)
        return
    elif mode == "residual":
        val = b_ref[...] - acc
    elif mode == "sweep":
        u_mid = ubufs[k_cur, hz : hz + T, :, :]
        val = u_mid + scale_ref[...] * (b_ref[...] - acc)
    else:
        raise ValueError(mode)
    out_ref[...] = jnp.where(interior, val, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "grid_shape", "slab", "mode"),
)
def _var_stencil_impl(
    u_pad, c_pad, b_pad, scale_pad,
    offsets: Tuple[Tuple[int, int, int], ...],
    grid_shape: Tuple[int, int, int],
    slab: int,
    mode: str,
):
    Z, Y, X = grid_shape
    Zr, Yr, Xr = u_pad.shape
    halos = halos_of(offsets)
    hz = halos[0]
    assert halos[1] <= 8, "y halo must fit the 8-row zero frame"
    assert hz <= slab, "z halo must not exceed the slab height"
    T = slab
    G = Zr // T
    m = len(offsets)
    kernel = functools.partial(
        _var_kernel, offsets=offsets, dims=(Z, Y, X), halos=halos,
        T=T, G=G, mode=mode,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    blk = lambda: pl.BlockSpec(
        (T, Yr, Xr), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [hbm, hbm]
    args = [u_pad, c_pad]
    if mode in ("residual", "sweep"):
        in_specs.append(blk())
        args.append(b_pad)
    if mode == "sweep":
        in_specs.append(blk())
        args.append(scale_pad)
    if mode == "spmv_comp":
        out_shape = (
            jax.ShapeDtypeStruct((Zr, Yr, Xr), u_pad.dtype),
            jax.ShapeDtypeStruct((Zr, Yr, Xr), u_pad.dtype),
        )
        out_specs = (blk(), blk())
        scratch = [
            pltpu.VMEM((2, T + 2 * hz, Yr, Xr), u_pad.dtype),
            pltpu.VMEM((2, m, T, Yr, Xr), c_pad.dtype),
            pltpu.VMEM((T, Yr, Xr), u_pad.dtype),
            pltpu.VMEM((T, Yr, Xr), u_pad.dtype),  # comp accumulator
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        out_shape = jax.ShapeDtypeStruct((Zr, Yr, Xr), u_pad.dtype)
        out_specs = blk()
        scratch = [
            pltpu.VMEM((2, T + 2 * hz, Yr, Xr), u_pad.dtype),
            pltpu.VMEM((2, m, T, Yr, Xr), c_pad.dtype),
            pltpu.VMEM((T, Yr, Xr), u_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )(*args)


def var_stencil_kernel_padded(
    u_pad, c_pad, offsets, grid_shape,
    b_pad=None, scale_pad=None, mode: str = "spmv", slab: int = 4,
):
    """Public entry (padded-layout operands). Traced with x64 disabled —
    Mosaic cannot legalize the i64 index types jax_enable_x64 injects."""
    offsets = tuple(tuple(int(v) for v in o) for o in offsets)
    if u_pad.dtype == jnp.float64:
        # f64 path exists for CPU/interpret parity testing only
        return _var_stencil_impl(
            u_pad, c_pad, b_pad, scale_pad, offsets, grid_shape, slab, mode
        )
    with jax.enable_x64(False):
        return _var_stencil_impl(
            u_pad, c_pad, b_pad, scale_pad, offsets, grid_shape, slab, mode
        )
