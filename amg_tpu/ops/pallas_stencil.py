"""Fused Pallas stencil kernels — the single-chip speed-of-light path.

XLA executes the 27-tap stencil as ~30 separate elementwise passes (one HBM
round-trip each), so the sweep runs at a fraction of bandwidth. This kernel
fuses the whole weighted-Jacobi sweep

    u_new = u + inv_w_diag * (b - A u)        (A = 27-pt stencil)

into ONE pass: grid over z-slabs, each program DMAs its slab plus one-row
halos into VMEM, computes all 27 taps from VMEM (z taps = static slab slices,
y taps = sublane slices, x taps = circular lane rolls that wrap through the
zero padding), masks the boundary shell, and writes the slab out.

State layout: grids are stored with an explicit zero boundary shell,
(Z, Y+2, Xp) with Xp = X+2 rounded up to the 128-lane width and Z = Z_interior
+2 rounded up to the slab size. The zero shell implements the homogeneous-
Dirichlet truncation of the assembled matrix (same convention as
amg_tpu.sparse.stencil) and is preserved by construction (boundary outputs
are masked to zero).

Replaces the reference's OpenMP stencil SpMV+Jacobi workhorse
(reference: src/SMEM_MatVec.cpp:123-259, src/SMEM_Smooth.cpp:6-49).
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


def padded_shape(grid_shape: Tuple[int, int, int], slab: int = 8):
    """(Zr, Yr, Xr) storage shape for interior grid_shape=(Z, Y, X)."""
    Z, Y, X = grid_shape
    # Y is the sublane dim of DMA slices — must be 8-aligned for Mosaic
    return (_round_up(Z + 2, slab), _round_up(Y + 2, 8), _round_up(X + 2, LANE))


def to_padded(x: jnp.ndarray, grid_shape, slab: int = 8) -> jnp.ndarray:
    """Embed a flat interior vector into the zero-shelled padded layout."""
    Z, Y, X = grid_shape
    Zr, Yr, Xr = padded_shape(grid_shape, slab)
    g = x.reshape(Z, Y, X)
    return jnp.pad(g, ((1, Zr - Z - 1), (1, Yr - Y - 1), (1, Xr - X - 1)))


def from_padded(p: jnp.ndarray, grid_shape) -> jnp.ndarray:
    Z, Y, X = grid_shape
    return p[1 : Z + 1, 1 : Y + 1, 1 : X + 1].reshape(Z * Y * X)


def _uniform_box_weights(taps):
    """(w_off, w_center) if taps form the full 3x3x3 box with one uniform
    off-center weight (the 27-pt Laplacian shape); else None."""
    if len(taps) != 27:
        return None
    offs = {(dz, dy, dx): w for dz, dy, dx, w in taps}
    if len(offs) != 27 or (0, 0, 0) not in offs:
        return None
    w_off = None
    for key, w in offs.items():
        if key == (0, 0, 0):
            continue
        if w_off is None:
            w_off = w
        elif w != w_off:
            return None
    return w_off, offs[(0, 0, 0)]


def _sweepk_kernel(
    u_hbm, b_hbm, *rest, box, dims, T, G, alpha, use_scale, nsweep,
):
    """`nsweep` fused weighted-Jacobi sweeps per launch (27-pt box stencils):

        u^{s+1} = u^s + scale * (b - A u^s)   s = 0 .. nsweep-1

    computed on a shrinking row window per stage (stage s writes rows
    [gT-(nsweep-1-s), gT+T+(nsweep-1-s)); the final stage writes exactly the
    slab). One launch streams u once, b (and scale when use_scale) once,
    writes u^{nsweep} once — HBM passes per sweep drop from 3 toward
    (2 + 2·(2·nsweep-1)/T)/nsweep as nsweep grows. The overlap rows of the
    intermediate sweeps are recomputed per slab (reach-`nsweep` input halo),
    so the result is bit-identical to `nsweep` single sweeps (tested in
    interpret mode). use_scale=False applies the scalar `alpha` weight
    instead of a streamed per-point scale (saves the third HBM stream).
    Intermediate iterates ping-pong through a 2-deep VMEM scratch.
    """
    K = nsweep
    if use_scale:
        (scale_hbm, out_ref, bufs, bbufs, sbufs, mid_ref, acc_ref,
         sem) = rest
    else:
        out_ref, bufs, bbufs, mid_ref, acc_ref, sem = rest
        scale_hbm = sbufs = None
    g = pl.program_id(0)
    Yr, Xr = out_ref.shape[1], out_ref.shape[2]
    Z, Y, X = dims
    w_off, w_c = box

    # manual DMAs: u rows [gT-K, gT+T+K), b/scale rows [gT-K+1, gT+T+K-1),
    # double-buffered across iterations; edge slabs zero-fill out-of-range
    # rows (they are zero-shell rows anyway)
    def dma(j, k, hbm, buf, halo, sem_slot):
        lo = j * T - halo
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, T + 2 * halo)],
            buf.at[k],
            sem.at[k, jnp.int32(sem_slot)],
        )

    streams = [(u_hbm, None, K, 0), (b_hbm, None, K - 1, 1)]
    if use_scale:
        streams.append((scale_hbm, None, K - 1, 2))

    def bufs_of(slot):
        return (bufs, bbufs, sbufs)[slot]

    def edge_fill(j, k):
        @pl.when(j == 0)
        def _():
            bufs[k, 0:K, :, :] = jnp.zeros((K, Yr, Xr), bufs.dtype)
            bbufs[k, 0 : K - 1, :, :] = jnp.zeros((K - 1, Yr, Xr), bbufs.dtype)
            if use_scale:
                sbufs[k, 0 : K - 1, :, :] = jnp.zeros(
                    (K - 1, Yr, Xr), sbufs.dtype
                )

        @pl.when(j == G - 1)
        def _():
            bufs[k, T + K : T + 2 * K, :, :] = jnp.zeros(
                (K, Yr, Xr), bufs.dtype
            )
            bbufs[k, T + K - 1 : T + 2 * K - 2, :, :] = jnp.zeros(
                (K - 1, Yr, Xr), bbufs.dtype
            )
            if use_scale:
                sbufs[k, T + K - 1 : T + 2 * K - 2, :, :] = jnp.zeros(
                    (K - 1, Yr, Xr), sbufs.dtype
                )

    def edge_copy(j, k, hbm, slot, halo):
        lo = jnp.maximum(j * T - halo, 0)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(lo, T + halo)],
            bufs_of(slot).at[k, pl.ds(jnp.where(j == 0, halo, 0), T + halo)],
            sem.at[k, jnp.int32(slot)],
        )

    def start_slab(j, k):
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            for hbm, _, halo, slot in streams:
                dma(j, k, hbm, bufs_of(slot), halo, slot).start()

        @pl.when(~interior)
        def _():
            # edge slabs: fetch the in-range window, zero-fill the rest
            # (out-of-range rows are zero-shell rows anyway)
            for hbm, _, halo, slot in streams:
                edge_copy(j, k, hbm, slot, halo).start()
            edge_fill(j, k)

    def wait_slab(j, k):
        for hbm, _, halo, slot in streams:
            dma(j, k, hbm, bufs_of(slot), halo, slot).wait()

    def wait_edge(j, k):
        for hbm, _, halo, slot in streams:
            edge_copy(j, k, hbm, slot, halo).wait()

    @pl.when(g == 0)
    def _():
        start_slab(jnp.int32(0), jnp.int32(0))

    @pl.when(g + 1 < G)
    def _():
        start_slab(g + 1, (g + 1) % 2)

    k_cur = g % 2
    interior_g = (g > 0) & (g < G - 1)

    @pl.when(interior_g)
    def _():
        wait_slab(g, k_cur)

    @pl.when(~interior_g)
    def _():
        wait_edge(g, k_cur)

    u = bufs.at[k_cur]

    def roll_y(a, dy):
        return pltpu.roll(a, jnp.int32((-dy) % Yr), 1)

    def roll_x(a, dx):
        return pltpu.roll(a, jnp.int32((-dx) % Xr), 2)

    def box_apply(src_ref, lo, rows):
        """(w_c - w_off)*center + w_off*boxsum over src rows [lo, lo+rows+2);
        returns `rows` output rows (for src rows [lo+1, lo+rows+1))."""
        t = (
            src_ref[lo : lo + rows, :, :]
            + src_ref[lo + 1 : lo + rows + 1, :, :]
            + src_ref[lo + 2 : lo + rows + 2, :, :]
        )
        t = t + roll_y(t, -1) + roll_y(t, 1)
        t = t + roll_x(t, -1) + roll_x(t, 1)
        return w_off * t + (w_c - w_off) * src_ref[
            lo + 1 : lo + rows + 1, :, :
        ]

    def interior_mask(rows, zbase):
        zi = jax.lax.broadcasted_iota(jnp.int32, (rows, Yr, Xr), 0) + zbase
        yi = jax.lax.broadcasted_iota(jnp.int32, (rows, Yr, Xr), 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (rows, Yr, Xr), 2)
        return (
            (zi >= 1) & (zi <= Z) & (yi >= 1) & (yi <= Y)
            & (xi >= 1) & (xi <= X)
        )

    # stage s: input = u^s on rows [gT-(K-s), gT+T+(K-s)) (relative row 0 of
    # its buffer), output = u^{s+1} on rows [gT-(K-1-s), gT+T+(K-1-s)).
    # b/scale buffers hold rows [gT-(K-1), gT+T+(K-1)): the output row at
    # global z = gT-(K-1-s)+r maps to b row r+s.
    src = u  # stage-0 source ref (row 0 = gT-K)
    src_lo = 0
    for s in range(K):
        rows = T + 2 * (K - 1 - s)
        zbase = g * T - (K - 1 - s)
        acc = box_apply(src, src_lo, rows)
        if use_scale:
            sc = sbufs[k_cur, s : s + rows, :, :]
        else:
            sc = alpha
        val = jnp.where(
            interior_mask(rows, zbase),
            src[src_lo + 1 : src_lo + 1 + rows, :, :]
            + sc * (bbufs[k_cur, s : s + rows, :, :] - acc),
            0.0,
        )
        if s == K - 1:
            out_ref[...] = val
        elif s == K - 2:
            # round-trip the last intermediate through acc_ref to bound the
            # number of live slab temporaries (Mosaic scoped-VMEM accounting)
            acc_ref[0:rows, :, :] = val
            src = acc_ref
            src_lo = 0
        else:
            mid_ref[s % 2, 0:rows, :, :] = val
            src = mid_ref.at[s % 2]
            src_lo = 0


def _sweep_kernel(
    u_hbm, b_ref, *rest,
    taps, dims, T, G, alpha, mode,
):
    """One z-slab of the fused stencil kernel.

    taps: tuple of (dz, dy, dx, weight). mode:
      "spmv"      y = A u                         (b ignored)
      "residual"  r = b - A u
      "sweep"     u + alpha*(b - A u)             (scalar alpha)
      "sweep_vec" u + scale*(b - A u)             (streamed scale input)
    """
    if mode == "sweep_vec_norm":
        scale_ref, out_ref, norm_ref, bufs, acc_ref, sem = rest
    elif mode == "sweep_vec":
        scale_ref, out_ref, bufs, acc_ref, sem = rest
        norm_ref = None
    else:
        out_ref, bufs, acc_ref, sem = rest
        scale_ref = None
        norm_ref = None
    g = pl.program_id(0)
    Yr, Xr = b_ref.shape[1], b_ref.shape[2]

    # Double-buffered cross-iteration prefetch of the u slab: at iteration g
    # the slab for g was started at g-1 (or at g==0 for itself), and the
    # slab for g+1 is started now — so the u DMA overlaps this iteration's
    # compute instead of serializing in front of it. bufs row s of buffer k
    # holds global z row j*T - 1 + s for the slab j with j%2 == k.
    def dma_mid(j, k):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T, T)],
            bufs.at[k, pl.ds(1, T)],
            sem.at[k, jnp.int32(0)],
        )

    def dma_top(j, k):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T - 1, 1)],
            bufs.at[k, pl.ds(0, 1)],
            sem.at[k, jnp.int32(1)],
        )

    def dma_bot(j, k):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T + T, 1)],
            bufs.at[k, pl.ds(T + 1, 1)],
            sem.at[k, jnp.int32(2)],
        )

    def dma_full(j, k):
        # interior slabs: ONE contiguous (T+2)-row copy fetches slab + both
        # halo rows — three small DMAs collapse into one large one (small
        # halo-row DMAs pay fixed per-transfer cost and serialize the wait)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T - 1, T + 2)],
            bufs.at[k],
            sem.at[k, jnp.int32(0)],
        )

    def start_slab(j, k):
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            dma_full(j, k).start()

        @pl.when(~interior)
        def _():
            dma_mid(j, k).start()

            @pl.when(j > 0)
            def _():
                dma_top(j, k).start()

            @pl.when(j == 0)
            def _():
                bufs[k, 0:1, :, :] = jnp.zeros((1, Yr, Xr), bufs.dtype)

            @pl.when(j < G - 1)
            def _():
                dma_bot(j, k).start()

            @pl.when(j == G - 1)
            def _():
                bufs[k, T + 1 : T + 2, :, :] = jnp.zeros(
                    (1, Yr, Xr), bufs.dtype
                )

    def wait_slab(j, k):
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            dma_full(j, k).wait()

        @pl.when(~interior)
        def _():
            dma_mid(j, k).wait()

            @pl.when(j > 0)
            def _():
                dma_top(j, k).wait()

            @pl.when(j < G - 1)
            def _():
                dma_bot(j, k).wait()

    @pl.when(g == 0)
    def _():
        start_slab(jnp.int32(0), jnp.int32(0))

    @pl.when(g + 1 < G)
    def _():
        start_slab(g + 1, (g + 1) % 2)

    k_cur = g % 2
    wait_slab(g, k_cur)
    scratch = bufs.at[k_cur]

    # Taps on the FLAT 2-D view: scratch flattened to ((T+2)*Yr, Xr) makes
    # every (dz, dy) shift a single row-offset read — shift s = (1+dz)*Yr+dy,
    # rows [s, s+T*Yr). Row-crossing artifacts land exclusively in zero
    # shell rows (the y shell is interior to every plane), so no edge fixup
    # is needed. x taps are lane rolls wrapping through the x shell.
    # Partial sums go through acc_ref (VMEM) so at most ~one slab-sized
    # temporary is live — Mosaic's scoped-VMEM accounting sums all live
    # temporaries and 27 of them blow the 16MB budget.
    Z, Y, X = dims

    def roll_y(a, dy):
        # ±1 sublane roll within each plane: the wrapped row is the plane's
        # own y shell (zeros) → exactly Dirichlet
        return pltpu.roll(a, jnp.int32((-dy) % Yr), 1)

    def roll_x(a, dx):
        # circular lane roll: the wrapped column lands in the zero padding
        # shell → contributes zeros (Dirichlet)
        return pltpu.roll(a, jnp.int32((-dx) % Xr), 2)

    box = _uniform_box_weights(taps)
    if box is not None:
        # separable fast path for the full 27-pt box with uniform off-center
        # weight: A u = (w_c - w_off) u + w_off * boxsum(u), and boxsum
        # factors into three 3-term axis sums — 8 slab adds instead of 27
        # tap temporaries (which blow Mosaic's scoped-VMEM accounting).
        # One acc_ref round-trip after the z sum bounds the number of live
        # slab temporaries; the y/x passes stay in registers.
        w_off, w_c = box
        acc_ref[...] = (
            scratch[0:T, :, :]
            + scratch[1 : T + 1, :, :]
            + scratch[2 : T + 2, :, :]
        )
        t = acc_ref[...]
        t = t + roll_y(t, -1) + roll_y(t, 1)
        t = t + roll_x(t, -1) + roll_x(t, 1)
        acc_ref[...] = w_off * t + (w_c - w_off) * scratch[1 : T + 1, :, :]
    else:
        groups = {}
        for dz, dy, dx, w in taps:
            groups.setdefault((dz, dy), []).append((dx, w))
        first = True
        for (dz, dy), xs in groups.items():
            block = scratch[1 + dz : 1 + dz + T, :, :]  # static z slice
            if dy != 0:
                block = roll_y(block, dy)
            shifted = block
            partial = None
            for dx, w in xs:
                term = w * (shifted if dx == 0 else roll_x(shifted, dx))
                partial = term if partial is None else partial + term
            if first:
                acc_ref[...] = partial
                first = False
            else:
                acc_ref[...] = acc_ref[...] + partial

    acc = acc_ref[...]
    # interior mask computed in-register: interior is [1,Z]x[1,Y]x[1,X]
    zi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 0) + g * T
    yi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 2)
    interior = (
        (zi >= 1) & (zi <= Z) & (yi >= 1) & (yi <= Y) & (xi >= 1) & (xi <= X)
    )
    if mode == "spmv":
        val = acc
    elif mode == "residual":
        val = b_ref[...] - acc  # r = b - A u
    elif mode == "sweep":
        val = scratch[1 : T + 1, :, :] + alpha * (b_ref[...] - acc)
    elif mode == "sweep_vec":
        # per-point scaling (L1-Jacobi etc.): scale streamed in padded layout
        val = scratch[1 : T + 1, :, :] + scale_ref[...] * (b_ref[...] - acc)
    elif mode == "sweep_vec_norm":
        # fused sweep + residual-norm partial: r = b - A u is the residual
        # of the INCOMING iterate — one kernel emits both the swept u and
        # this slab's sum(r^2), so the solve loop needs no separate residual
        # pass for convergence monitoring
        r = jnp.where(interior, b_ref[...] - acc, 0.0)
        val = scratch[1 : T + 1, :, :] + scale_ref[...] * r
        # (1, 8, LANE) block keeps TPU tiling legal; host sums everything
        norm_ref[...] = jnp.full(
            (1, 8, LANE), jnp.sum(r * r) / (8 * LANE), r.dtype
        )
    else:
        raise ValueError(mode)
    out_ref[...] = jnp.where(interior, val, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("weights", "grid_shape", "offsets", "slab", "alpha", "mode"),
)
def _stencil_kernel_impl(
    u_pad: jnp.ndarray,
    b_pad: jnp.ndarray,
    scale_pad,
    weights: Tuple[float, ...],
    grid_shape: Tuple[int, int, int],
    offsets: Tuple[Tuple[int, int, int], ...],
    alpha: float,
    slab: int,
    mode: str,
) -> jnp.ndarray:
    """Fused stencil kernel on padded-layout state (see _sweep_kernel modes).

    weights are passed as a static tuple via closure-free taps so the kernel
    unrolls all taps at trace time."""
    Z, Y, X = grid_shape
    Zr, Yr, Xr = u_pad.shape
    T = slab
    G = Zr // T
    taps = tuple(
        (int(o[0]), int(o[1]), int(o[2]), float(w))
        for o, w in zip(offsets, weights)
    )
    if mode.startswith("sweep2") or mode.startswith("sweep3") or (
        mode.startswith("sweep4")
    ):
        K = int(mode[5])
        use_scale = mode.endswith("_vec")
        box = _uniform_box_weights(taps)
        assert box is not None, "sweepK modes need the uniform 27-pt box"
        assert G >= 2, "sweepK modes need >= 2 z-slabs"
        assert T >= K, "sweepK modes need slab >= K (reach-K input halo)"
        kernelk = functools.partial(
            _sweepk_kernel, box=box, dims=(Z, Y, X), T=T, G=G, alpha=alpha,
            use_scale=use_scale, nsweep=K,
        )
        hbm = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch = [
            pltpu.VMEM((2, T + 2 * K, Yr, Xr), u_pad.dtype),       # u
            pltpu.VMEM((2, T + 2 * K - 2, Yr, Xr), u_pad.dtype),   # b
        ]
        if use_scale:
            scratch.append(
                pltpu.VMEM((2, T + 2 * K - 2, Yr, Xr), u_pad.dtype)
            )
        # mid ping-pong holds intermediate iterates for stages 0..K-3; the
        # K-2'th intermediate round-trips through acc_ref (K=2 needs no mid)
        if K >= 3:
            mid_shape = (2 if K >= 4 else 1, T + 2 * (K - 1), Yr, Xr)
        else:
            mid_shape = (1, 8, LANE)  # unused placeholder
        scratch += [
            pltpu.VMEM(mid_shape, u_pad.dtype),
            pltpu.VMEM((T + 2, Yr, Xr), u_pad.dtype),              # acc
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
        args = [u_pad, b_pad] + ([scale_pad] if use_scale else [])
        return pl.pallas_call(
            kernelk,
            out_shape=jax.ShapeDtypeStruct((Zr, Yr, Xr), u_pad.dtype),
            grid=(G,),
            in_specs=[hbm] * len(args),
            out_specs=pl.BlockSpec(
                (T, Yr, Xr), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
        )(*args)
    kernel = functools.partial(
        _sweep_kernel, taps=taps, dims=(Z, Y, X), T=T, G=G, alpha=alpha,
        mode=mode,
    )
    blk = lambda: pl.BlockSpec(
        (T, Yr, Xr), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM), blk()]
    args = [u_pad, b_pad]
    if mode in ("sweep_vec", "sweep_vec_norm"):
        in_specs.append(blk())
        args.append(scale_pad)
    out_shape = jax.ShapeDtypeStruct((Zr, Yr, Xr), u_pad.dtype)
    out_specs = blk()
    if mode == "sweep_vec_norm":
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((G, 8, LANE), u_pad.dtype),
        )
        out_specs = (
            out_specs,
            pl.BlockSpec(
                (1, 8, LANE), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
        )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, T + 2, Yr, Xr), u_pad.dtype),  # double-buffered u
            pltpu.VMEM((T, Yr, Xr), u_pad.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )(*args)


def stencil_kernel_padded(
    u_pad, b_pad, weights, grid_shape, offsets,
    alpha: float = 0.0, scale_pad=None, mode: str = "spmv", slab: int = 8,
):
    """Public entry: traces the kernel with x64 semantics disabled — Mosaic
    cannot legalize the i64 index types jax_enable_x64 injects (empirically:
    even a trivial DMA kernel fails to compile under x64 on this backend).
    The kernel's own arrays keep their dtype (f32 on TPU)."""
    if u_pad.dtype == jnp.float64:
        # f64 path only exists for CPU/interpret parity testing
        return _stencil_kernel_impl(
            u_pad, b_pad, scale_pad, weights, grid_shape, offsets, alpha,
            slab, mode,
        )
    with jax.enable_x64(False):
        return _stencil_kernel_impl(
            u_pad, b_pad, scale_pad, weights, grid_shape, offsets, alpha,
            slab, mode,
        )


def stencil_sweep_padded(
    u_pad, b_pad, weights, grid_shape, offsets, alpha, slab: int = 8
):
    mode = "spmv" if alpha == 0.0 else "sweep"
    return stencil_kernel_padded(
        u_pad, b_pad, weights, grid_shape, offsets, alpha, None, mode, slab
    )


def stencil_jacobi_sweep(
    u: jnp.ndarray,
    b: jnp.ndarray,
    stencil,
    inv_wdiag: float,
    slab: int = 8,
) -> jnp.ndarray:
    """Flat-vector convenience wrapper: one fused weighted-Jacobi sweep."""
    gs = stencil.grid_shape
    up = to_padded(u, gs, slab)
    bp = to_padded(b, gs, slab)
    weights = tuple(float(w) for w in np.asarray(stencil.weights))
    out = stencil_sweep_padded(
        up, bp, weights, gs, stencil.offsets, float(inv_wdiag), slab
    )
    return from_padded(out, gs)


def stencil_matvec_pallas(
    x: jnp.ndarray, stencil, slab: int = 8
) -> jnp.ndarray:
    """Flat-vector fused SpMV through the same kernel (alpha = 0)."""
    gs = stencil.grid_shape
    xp = to_padded(x, gs, slab)
    weights = tuple(float(w) for w in np.asarray(stencil.weights))
    out = stencil_sweep_padded(
        xp, jnp.zeros_like(xp), weights, gs, stencil.offsets, 0.0, slab
    )
    return from_padded(out, gs)
