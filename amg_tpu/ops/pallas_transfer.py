"""Fused Pallas transfer kernels: residual+restrict and prolong+add+sweep.

The round-5 per-phase budget (PERF_BUDGET.md) left the flagship V-cycle at
~1.5-1.8x its HBM traffic bound, with the residual gap living in the
level-0/1 transfer pair: the separable MXU-einsum transfers materialize a
per-axis intermediate (plus the full fine residual array) in HBM, ~0.067 ms
against ~0.02 ms of algorithmic traffic. These kernels remove the
intermediates entirely:

  residual_restrict_padded:  rc = R (b - A u)      in ONE kernel
      reads u and b once (windowed, ~1.2 passes), writes the COARSE rhs
      directly (1/8 pass) — the fine residual never touches HBM.
  prolong_sweep_padded:      u' = S(u + P ec, b)   in ONE kernel
      the first post-smoothing sweep interpolates and adds the coarse
      correction on the fly (ec stays VMEM-resident, ~2.6 MB at the
      flagship's 63^3), so prolongation + correction-add cost zero extra
      HBM passes over the sweep itself.

Both kernels keep the separable structure of the structured transfers
(amg_tpu/setup/structured.py::_axis_transfer_np): the z-axis contraction is
done with in-register {1/2, 1, 1/2} filters (static row slices — the
boundary clipping is realized by the zero shell), and the y/x axes contract
on the MXU against the padded 1-D transfer matrices, using 3-D dot_general
with the contraction on the middle axis twice so the axis swap cancels —
no in-kernel transposes, no strided lane/sublane slicing (which is
gather-speed on TPU, measured round 3).

Replaces the XLA composition residual -> _restrict_padded and
_prolong_padded -> add -> sweep in amg_tpu/solve/struct_cycle.py, with
semantics identical to that composition (tested in interpret mode).
Reference analog: the restrict/prolong halves of the reference V-cycle
(reference: src/SEQ_AMG.cpp:120-180, src/SMEM_MatVec.cpp:123-259) — here
fused into the neighboring fine-grid passes, which the reference's
CSR-based cycle cannot do.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amg_tpu.ops.pallas_stencil import LANE, padded_shape

# below this many bytes of manual-stream traffic, kernels copy the whole
# streams into VMEM at program 0 instead of running per-program windowed
# DMA (the window machinery's fixed cost dominates at small levels)
_RESIDENT_BYTES = 6 * 1024 * 1024

# y/x transfer contractions run on the MXU at HIGHEST precision: the tap
# weights are exact powers of two and the data side is fully carried, so
# the result matches the f32 einsum transfers (and is exact in f64
# interpret mode). FLOP cost is negligible (the matrices are ~128x128).
_DOT_PREC = jax.lax.Precision.HIGHEST


def coarse_shape_of(grid_shape: Tuple[int, int, int]) -> Tuple[int, int, int]:
    return tuple((s + 1) // 2 for s in grid_shape)


def _padded_axis_matrix(sf: int, sc: int, sp: int, scp: int) -> np.ndarray:
    """(sp x scp) 1-D transfer matrix between PADDED layouts: interior rows
    1..sf map to interior cols 1..sc with the generic linear-interpolation
    pattern (S[2c,c]=1, S[2c+-1,c]=1/2); shell/pad rows and cols are zero,
    which realizes the boundary clipping and keeps the coarse zero shell."""
    from amg_tpu.setup.structured import _axis_transfer_np

    S = _axis_transfer_np(sf, sc)
    M = np.zeros((sp, scp))
    M[1 : 1 + sf, 1 : 1 + sc] = S
    return M


def _axis_mat_reg(sf, sc, sp, scp, dtype, transpose=False):
    """The SAME padded transfer matrix built IN-REGISTER from iotas (the
    generic pattern is just d = f - 2c -> {1, 1/2, 0}), as a kernel-local
    value. Matrices passed as constant-index block INPUTS measured ~0.29
    ms of pipeline stall per kernel launch on this backend (the revisited
    block breaks the grid pipeline); the iota construction is ~free."""
    shape = (scp, sp) if transpose else (sp, scp)
    fi = jax.lax.broadcasted_iota(jnp.int32, shape, 1 if transpose else 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if transpose else 1)
    d = (fi - 1) - 2 * (ci - 1)
    val = jnp.where(
        d == 0,
        jnp.asarray(1.0, dtype),
        jnp.where(jnp.abs(d) == 1, jnp.asarray(0.5, dtype),
                  jnp.asarray(0.0, dtype)),
    )
    ok = (fi >= 1) & (fi <= sf) & (ci >= 1) & (ci <= sc)
    return jnp.where(ok, val, jnp.asarray(0.0, dtype))


def transfer_fuse_ok(
    grid_shape: Tuple[int, int, int],
    coarse_shape: Tuple[int, int, int],
    offsets,
    slab: int,
    vmem_budget_bytes: int = 12 * 1024 * 1024,
) -> bool:
    """True when the fused transfer kernels apply at this level: standard
    (s+1)//2 coarsening on every axis (the generic interpolation pattern —
    the graded-end even-axis variant has per-row z weights these kernels
    don't implement), reach-1 stencil, even slab, windows that fit the
    padded z extent, and a VMEM footprint inside the budget."""
    if tuple(coarse_shape) != coarse_shape_of(grid_shape):
        return False
    if any(
        max(abs(int(o[0])), abs(int(o[1])), abs(int(o[2]))) > 1
        for o in offsets
    ):
        return False
    if slab % 2 != 0:
        return False
    Zr, Yr, Xr = padded_shape(grid_shape, slab)
    cs = coarse_shape_of(grid_shape)
    Zc_r, Ycp, Xcp = padded_shape(cs, slab)
    W = 2 * slab + 3
    if Zr < W or Zc_r % slab != 0:
        return False
    if Zr // 2 + 2 > Zc_r:  # prolong ec-plane window must stay in range
        return False
    plane = Yr * Xr * 4
    # restrict kernel: 2 double-buffered W-row streams + r + rz scratch
    rr = (4 * W + W + slab) * plane + slab * Xr * Ycp * 4
    # prolong kernel: x bufs + u' + E + acc + resident ec + pipelined b/scale
    ps = (
        (2 * (slab + 2) + (slab + 2) + (slab // 2 + 2) + slab) * plane
        + Zc_r * Ycp * Xcp * 4
        + 6 * slab * plane
    )
    return max(rr, ps) <= vmem_budget_bytes


def _residual_window(u, b_ref, taps, W, Yr, Xr):
    """Residual r = b - A u on window rows 1..W-2 (u rows j-1..j+1), rows 0
    and W-1 returned as zero (they are shell/halo rows of the window).
    u: VMEM ref holding W rows; b_ref: same window of b. Returns (W,Yr,Xr)
    with NO interior masking (caller masks)."""
    from amg_tpu.ops.pallas_stencil import _uniform_box_weights

    R = W - 2

    def roll_y(a, dy):
        return pltpu.roll(a, jnp.int32((-dy) % Yr), 1)

    def roll_x(a, dx):
        return pltpu.roll(a, jnp.int32((-dx) % Xr), 2)

    box = _uniform_box_weights(taps)
    if box is not None:
        w_off, w_c = box
        t = u[0:R, :, :] + u[1 : R + 1, :, :] + u[2 : R + 2, :, :]
        t = t + roll_y(t, -1) + roll_y(t, 1)
        t = t + roll_x(t, -1) + roll_x(t, 1)
        acc = w_off * t + (w_c - w_off) * u[1 : R + 1, :, :]
    else:
        groups = {}
        for dz, dy, dx, w in taps:
            groups.setdefault((dz, dy), []).append((dx, w))
        acc = None
        for (dz, dy), xs in groups.items():
            block = u[1 + dz : 1 + dz + R, :, :]
            if dy != 0:
                block = roll_y(block, dy)
            partial = None
            for dx, w in xs:
                term = w * (block if dx == 0 else roll_x(block, dx))
                partial = term if partial is None else partial + term
            acc = partial if acc is None else acc + partial
    r_mid = b_ref[1 : R + 1, :, :] - acc
    zero = jnp.zeros((1, Yr, Xr), r_mid.dtype)
    return jnp.concatenate([zero, r_mid, zero], axis=0)


def _rr_kernel(
    *refs,
    taps, dims, Tc, G, Zr, zero_guess, alpha, resident,
):
    """One coarse z-slab of the fused residual+restrict kernel. Program g
    produces padded-coarse rows [g*Tc, (g+1)*Tc): each coarse interior row
    zc draws fine padded rows 2zc-2..2zc (the {1/2,1,1/2} filter; clipping
    via the zero shell), so the program fetches the clamped fine window
    lo(g) = clip(2*Tc*g - 3, 0, Zr - W) of W = 2*Tc+3 rows for BOTH
    streams (the extra rows buy fully-static in-window indexing), computes
    the masked residual in-window, z-contracts, and y/x-contracts on the
    MXU.

    zero_guess=False: streams (u, b), r = b - A u — the transfer half of a
    V-cycle visit whose pre-sweeps already ran.
    zero_guess=True: the whole ZERO-GUESS level entry in one kernel: the
    single pre-sweep from x=0 is x = scale*b (or alpha*b), so the streams
    are (b, scale) (or b alone) and r = b - A(scale*b) — one pass instead
    of sweep-kernel + residual-kernel + einsum chain (the reference's
    zero-guess smoother fast path, src/SEQ_Smooth.cpp:119-147, fused
    through the restriction)."""
    use_scale = zero_guess and alpha == 0.0
    if not zero_guess:
        u_hbm, b_hbm, out_ref, ubufs, bbufs, r_ref, sem = refs
        xw_ref = None
    elif use_scale:
        u_hbm, b_hbm, out_ref, ubufs, bbufs, xw_ref, r_ref, sem = refs
    else:  # zero-guess with scalar weight: b stream only
        u_hbm, out_ref, ubufs, xw_ref, r_ref, sem = refs
        b_hbm = bbufs = None
    g = pl.program_id(0)
    Z, Y, X = dims
    W = 2 * Tc + 3
    Yr, Xr = ubufs.shape[-2], ubufs.shape[-1]

    def lo_of(j):
        return jnp.clip(2 * Tc * j - 3, 0, Zr - W)

    if resident:
        # small level: copy the WHOLE streams into persistent scratch at
        # program 0 and slice windows from VMEM — per-program windowed DMA
        # machinery costs more than the whole array's traffic here
        @pl.when(g == 0)
        def _():
            cps = [pltpu.make_async_copy(u_hbm, ubufs, sem.at[0, 0])]
            if bbufs is not None:
                cps.append(
                    pltpu.make_async_copy(b_hbm, bbufs, sem.at[0, 1])
                )
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        lo = lo_of(g)
        uwin = ubufs[pl.ds(lo, W)]
        bwin = bbufs[pl.ds(lo, W)] if bbufs is not None else None
    else:
        def dma(j, k, hbm, buf, slot):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(lo_of(j), W)], buf.at[k],
                sem.at[k, jnp.int32(slot)],
            )

        def start(j, k):
            dma(j, k, u_hbm, ubufs, 0).start()
            if bbufs is not None:
                dma(j, k, b_hbm, bbufs, 1).start()

        def wait(j, k):
            dma(j, k, u_hbm, ubufs, 0).wait()
            if bbufs is not None:
                dma(j, k, b_hbm, bbufs, 1).wait()

        @pl.when(g == 0)
        def _():
            start(jnp.int32(0), jnp.int32(0))

        @pl.when(g + 1 < G)
        def _():
            start(g + 1, (g + 1) % 2)

        k_cur = g % 2
        wait(g, k_cur)
        lo = lo_of(g)
        uwin = ubufs.at[k_cur]
        bwin = bbufs.at[k_cur] if bbufs is not None else None

    if zero_guess:
        # streams: u = b, b = scale; x = scale*b (the zero-guess
        # pre-sweep), r = b - A x computed against the SAME b window
        if use_scale:
            xw_ref[...] = (
                (uwin[...] * bwin[...]) if not resident else uwin * bwin
            )
        else:
            xw_ref[...] = alpha * (uwin[...] if not resident else uwin)
        r = _residual_window(xw_ref, uwin, taps, W, Yr, Xr)
    else:
        r = _residual_window(uwin, bwin, taps, W, Yr, Xr)
    # mask to the fine interior: window row j is fine padded z = lo + j
    zi = jax.lax.broadcasted_iota(jnp.int32, (W, Yr, Xr), 0) + lo
    yi = jax.lax.broadcasted_iota(jnp.int32, (W, Yr, Xr), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (W, Yr, Xr), 2)
    interior = (
        (zi >= 1) & (zi <= Z) & (yi >= 1) & (yi <= Y) & (xi >= 1) & (xi <= X)
    )
    r_ref[...] = jnp.where(interior, r, 0.0)

    # z-contraction: coarse padded row zc = g*Tc + k reads window rows
    # m0 + 2k .. m0 + 2k + 2 (m0 dynamic from the clamp; out-of-range only
    # for rows masked invalid below, clipped to stay in the buffer)
    m0 = 2 * Tc * g - 2 - lo
    Zc = (Z + 1) // 2
    rows = []
    for k in range(Tc):
        j0 = jnp.clip(m0 + 2 * k, 0, W - 3)
        rk = (
            0.5 * r_ref[pl.ds(j0, 1)]
            + r_ref[pl.ds(j0 + 1, 1)]
            + 0.5 * r_ref[pl.ds(j0 + 2, 1)]
        )
        zc = g * Tc + k
        valid = (zc >= 1) & (zc <= Zc)
        rows.append(jnp.where(valid, rk, 0.0))
    rz = jnp.concatenate(rows, axis=0)  # (Tc, Yr, Xr)

    # y then x on the MXU; contracting the middle axis twice cancels the
    # axis swap: (Tc,Yr,Xr)x(Yr,Ycp)->(Tc,Xr,Ycp); x(Xr,Xcp)->(Tc,Ycp,Xcp)
    Ycp, Xcp = out_ref.shape[1], out_ref.shape[2]
    cs = ((Z + 1) // 2, (Y + 1) // 2, (X + 1) // 2)
    Sy = _axis_mat_reg(Y, cs[1], Yr, Ycp, rz.dtype)
    Sx = _axis_mat_reg(X, cs[2], Xr, Xcp, rz.dtype)
    s1 = jax.lax.dot_general(
        rz, Sy, (((1,), (0,)), ((), ())),
        preferred_element_type=rz.dtype, precision=_DOT_PREC,
    )
    out_ref[...] = jax.lax.dot_general(
        s1, Sx, (((1,), (0,)), ((), ())),
        preferred_element_type=rz.dtype, precision=_DOT_PREC,
    )


@functools.partial(
    jax.jit,
    static_argnames=("weights", "grid_shape", "offsets", "slab",
                     "zero_guess", "alpha"),
)
def _residual_restrict_impl(
    u_pad, b_pad, weights, grid_shape, offsets, slab, zero_guess, alpha
):
    Zr, Yr, Xr = u_pad.shape
    Z, Y, X = grid_shape
    cs = coarse_shape_of(grid_shape)
    Zc_r, Ycp, Xcp = padded_shape(cs, slab)
    Tc = slab
    G = Zc_r // Tc
    W = 2 * Tc + 3
    taps = tuple(
        (int(o[0]), int(o[1]), int(o[2]), float(w))
        for o, w in zip(offsets, weights)
    )
    two_streams = (not zero_guess) or alpha == 0.0
    # resident mode: small levels hold the whole streams in VMEM (copied
    # once at program 0) — per-program windowed DMA costs more than the
    # entire array's traffic there. Cutoff ~6 MB of stream bytes.
    plane = Yr * Xr * u_pad.dtype.itemsize
    resident = (1 + int(two_streams)) * Zr * plane <= _RESIDENT_BYTES
    kernel = functools.partial(
        _rr_kernel, taps=taps, dims=(Z, Y, X), Tc=Tc, G=G, Zr=Zr,
        zero_guess=zero_guess, alpha=alpha, resident=resident,
    )
    args = [u_pad] + ([b_pad] if two_streams else [])
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * len(args)
    sshape = (Zr, Yr, Xr) if resident else (2, W, Yr, Xr)
    scratch = [pltpu.VMEM(sshape, u_pad.dtype)]
    if two_streams:
        scratch.append(pltpu.VMEM(sshape, u_pad.dtype))
    if zero_guess:
        scratch.append(pltpu.VMEM((W, Yr, Xr), u_pad.dtype))  # x window
    scratch += [
        pltpu.VMEM((W, Yr, Xr), u_pad.dtype),  # r
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Zc_r, Ycp, Xcp), u_pad.dtype),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Tc, Ycp, Xcp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )(*args)


def residual_restrict_padded(
    u_pad, b_pad, weights, grid_shape, offsets, slab: int = 8,
    zero_guess: bool = False, scale_pad=None, alpha: float = 0.0,
):
    """rc_pad = R (b - A u) in one fused kernel: padded-fine u, b ->
    padded-COARSE rhs (layout padded_shape(coarse_shape, slab)), bitwise
    the zero-shelled restriction of the masked interior residual.

    zero_guess=True folds the single zero-guess pre-sweep in as well:
    rc_pad = R (b - A (scale b))  (or alpha b) — pass b_pad=b and
    scale_pad (u_pad is ignored and may be None)."""
    if zero_guess:
        lead, second = b_pad, scale_pad
    else:
        lead, second, alpha = u_pad, b_pad, 0.0
    if lead.dtype == jnp.float64:
        return _residual_restrict_impl(
            lead, second, weights, grid_shape, offsets, slab, zero_guess,
            alpha,
        )
    with jax.enable_x64(False):
        return _residual_restrict_impl(
            lead, second, weights, grid_shape, offsets, slab, zero_guess,
            alpha,
        )


def _ps_kernel(
    *refs,
    taps, dims, T, G, alpha, use_scale, Zc_r, zero_guess, resident,
):
    """One fine z-slab of the fused prolong+add+sweep kernel:

        u' = x + P ec        (interpolation built from VMEM-resident ec)
        out = u' + scale * (b - A u')

    x is fetched with its +-1 halo (the sweep needs A u' at the slab rows,
    and u' on halo rows needs P ec there too — recomputed from ec, zero
    extra HBM traffic). ec planes are expanded to fine y/x resolution on
    the MXU once per program (T//2 + 2 planes), then combined per fine row
    with the static-parity z-interpolation weights.

    zero_guess=True replaces the x stream with x = scale*b (or alpha*b) —
    the zero-guess-level post half in one kernel: u' = scale*b + P ec,
    with b (and scale) streamed with their +-1 halos instead of blocked."""
    if zero_guess:
        if use_scale:
            (b_hbm, scale_hbm, ec_hbm, out_ref, bbufs, sbufs, ec_ref,
             e_ref, up_ref, sem, sem_ec) = refs
        else:
            (b_hbm, ec_hbm, out_ref, bbufs, ec_ref, e_ref, up_ref, sem,
             sem_ec) = refs
            scale_hbm = sbufs = None
        streams = [(b_hbm, bbufs, 0)]
        if use_scale:
            streams.append((scale_hbm, sbufs, 3))
    else:
        if use_scale:
            (x_hbm, b_ref, scale_ref, ec_hbm, out_ref, xbufs, ec_ref,
             e_ref, up_ref, sem, sem_ec) = refs
        else:
            (x_hbm, b_ref, ec_hbm, out_ref, xbufs, ec_ref, e_ref, up_ref,
             sem, sem_ec) = refs
            scale_ref = None
        streams = [(x_hbm, xbufs, 0)]
    g = pl.program_id(0)
    Z, Y, X = dims
    Yr, Xr = out_ref.shape[1], out_ref.shape[2]
    NZ = T // 2 + 2

    # the coarse correction is fetched ONCE into persistent scratch at the
    # first program (grid programs run sequentially on the core) — passing
    # it as a constant-index block input measured ~0.29 ms of pipeline
    # stall per launch on this backend
    @pl.when(g == 0)
    def _():
        cp = pltpu.make_async_copy(ec_hbm, ec_ref, sem_ec.at[0])
        cp.start()
        cp.wait()

    if resident:
        # small level: whole streams copied into persistent scratch at
        # program 0; window rows are clamped VMEM slices (out-of-range
        # rows clamp onto shell/pad rows, which are zero)
        @pl.when(g == 0)
        def _():
            cps = [
                pltpu.make_async_copy(hbm, bufs, sem.at[0, jnp.int32(s0)])
                for hbm, bufs, s0 in streams
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        Zr_full = streams[0][1].shape[0]

        def stream_row(bufs, j):
            idx = jnp.clip(g * T - 1 + j, 0, Zr_full - 1)
            return bufs[pl.ds(idx, 1)]

        def stream_mid(bufs):
            return bufs[pl.ds(g * T, T)]
    else:
        def stream_row(bufs, j):
            return bufs[k_cur_holder[0], j : j + 1, :, :]

        def stream_mid(bufs):
            return bufs[k_cur_holder[0], 1 : T + 1, :, :]

    k_cur_holder = [None]

    # windowed streams [g*T - 1, g*T + T + 1): same edge-handled halo DMA
    # pattern as _sweep_kernel (amg_tpu/ops/pallas_stencil.py)
    def dma_mid(j, k, hbm, bufs, s0):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T, T)], bufs.at[k, pl.ds(1, T)],
            sem.at[k, jnp.int32(s0)],
        )

    def dma_top(j, k, hbm, bufs, s0):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T - 1, 1)], bufs.at[k, pl.ds(0, 1)],
            sem.at[k, jnp.int32(s0 + 1)],
        )

    def dma_bot(j, k, hbm, bufs, s0):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T + T, 1)], bufs.at[k, pl.ds(T + 1, 1)],
            sem.at[k, jnp.int32(s0 + 2)],
        )

    def dma_full(j, k, hbm, bufs, s0):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T - 1, T + 2)], bufs.at[k],
            sem.at[k, jnp.int32(s0)],
        )

    def start_slab(j, k):
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            for hbm, bufs, s0 in streams:
                dma_full(j, k, hbm, bufs, s0).start()

        @pl.when(~interior)
        def _():
            for hbm, bufs, s0 in streams:
                dma_mid(j, k, hbm, bufs, s0).start()

            @pl.when(j > 0)
            def _():
                for hbm, bufs, s0 in streams:
                    dma_top(j, k, hbm, bufs, s0).start()

            @pl.when(j == 0)
            def _():
                for _, bufs, _s in streams:
                    bufs[k, 0:1, :, :] = jnp.zeros((1, Yr, Xr), bufs.dtype)

            @pl.when(j < G - 1)
            def _():
                for hbm, bufs, s0 in streams:
                    dma_bot(j, k, hbm, bufs, s0).start()

            @pl.when(j == G - 1)
            def _():
                for _, bufs, _s in streams:
                    bufs[k, T + 1 : T + 2, :, :] = jnp.zeros(
                        (1, Yr, Xr), bufs.dtype
                    )

    def wait_slab(j, k):
        interior = (j > 0) & (j < G - 1)

        @pl.when(interior)
        def _():
            for hbm, bufs, s0 in streams:
                dma_full(j, k, hbm, bufs, s0).wait()

        @pl.when(~interior)
        def _():
            for hbm, bufs, s0 in streams:
                dma_mid(j, k, hbm, bufs, s0).wait()

            @pl.when(j > 0)
            def _():
                for hbm, bufs, s0 in streams:
                    dma_top(j, k, hbm, bufs, s0).wait()

            @pl.when(j < G - 1)
            def _():
                for hbm, bufs, s0 in streams:
                    dma_bot(j, k, hbm, bufs, s0).wait()

    if not resident:
        @pl.when(g == 0)
        def _():
            start_slab(jnp.int32(0), jnp.int32(0))

        @pl.when(g + 1 < G)
        def _():
            start_slab(g + 1, (g + 1) % 2)

        k_cur_holder[0] = g % 2
        wait_slab(g, k_cur_holder[0])

    # expand the NZ needed coarse planes (padded-coarse rows
    # [T//2*g, T//2*g + NZ)) to fine y/x resolution on the MXU
    s0 = jnp.minimum(T // 2 * g, Zc_r - NZ)
    ecs = ec_ref[pl.ds(s0, NZ)]  # (NZ, Ycp, Xcp)
    Ycp, Xcp = ec_ref.shape[1], ec_ref.shape[2]
    cs = ((Z + 1) // 2, (Y + 1) // 2, (X + 1) // 2)
    Syt = _axis_mat_reg(Y, cs[1], Yr, Ycp, ecs.dtype, transpose=True)
    Sxt = _axis_mat_reg(X, cs[2], Xr, Xcp, ecs.dtype, transpose=True)
    d1 = jax.lax.dot_general(
        ecs, Syt, (((1,), (0,)), ((), ())),
        preferred_element_type=ecs.dtype, precision=_DOT_PREC,
    )  # (NZ, Xcp, Yr)
    e_ref[...] = jax.lax.dot_general(
        d1, Sxt, (((1,), (0,)), ((), ())),
        preferred_element_type=ecs.dtype, precision=_DOT_PREC,
    )  # (NZ, Yr, Xr)

    # u' rows j = 0..T+1 <-> fine padded z = g*T - 1 + j; fine interior
    # f = z - 1 has STATIC parity (T even): even f reads one expanded
    # plane, odd f averages two. Plane index relative to s0 is static
    # (j//2 etc.) except the s0 end-clamp, folded in as a dynamic shift.
    sh = T // 2 * g - s0  # 0 except possibly at the last program

    def x_row(j):
        if not zero_guess:
            return stream_row(xbufs, j)
        if use_scale:
            return stream_row(sbufs, j) * stream_row(bbufs, j)
        return alpha * stream_row(bbufs, j)

    up_rows = []
    for j in range(T + 2):
        zf = g * T - 1 + j
        f_parity = (j - 2) % 2  # parity of f = g*T + j - 2 (T even)
        if f_parity == 0:
            rel = j // 2
            pec = e_ref[pl.ds(sh + rel, 1)]
        else:
            r1, r2 = (j - 1) // 2, (j + 1) // 2
            pec = 0.5 * (
                e_ref[pl.ds(sh + r1, 1)] + e_ref[pl.ds(sh + r2, 1)]
            )
        zok = (zf >= 1) & (zf <= Z)
        up_rows.append(x_row(j) + jnp.where(zok, pec, 0.0))
    up_ref[...] = jnp.concatenate(up_rows, axis=0)

    # standard fused sweep on u' (same tap code as _sweep_kernel)
    def roll_y(a, dy):
        return pltpu.roll(a, jnp.int32((-dy) % Yr), 1)

    def roll_x(a, dx):
        return pltpu.roll(a, jnp.int32((-dx) % Xr), 2)

    from amg_tpu.ops.pallas_stencil import _uniform_box_weights

    box = _uniform_box_weights(taps)
    if box is not None:
        w_off, w_c = box
        t = (
            up_ref[0:T, :, :]
            + up_ref[1 : T + 1, :, :]
            + up_ref[2 : T + 2, :, :]
        )
        t = t + roll_y(t, -1) + roll_y(t, 1)
        t = t + roll_x(t, -1) + roll_x(t, 1)
        acc = w_off * t + (w_c - w_off) * up_ref[1 : T + 1, :, :]
    else:
        groups = {}
        for dz, dy, dx, w in taps:
            groups.setdefault((dz, dy), []).append((dx, w))
        acc = None
        for (dz, dy), xs in groups.items():
            block = up_ref[1 + dz : 1 + dz + T, :, :]
            if dy != 0:
                block = roll_y(block, dy)
            partial = None
            for dx, w in xs:
                term = w * (block if dx == 0 else roll_x(block, dx))
                partial = term if partial is None else partial + term
            acc = partial if acc is None else acc + partial

    if zero_guess:
        bv = stream_mid(bbufs)
        sc = stream_mid(sbufs) if use_scale else alpha
    else:
        bv = b_ref[...]
        sc = scale_ref[...] if use_scale else alpha
    val = up_ref[1 : T + 1, :, :] + sc * (bv - acc)
    zi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 0) + g * T
    yi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (T, Yr, Xr), 2)
    interior = (
        (zi >= 1) & (zi <= Z) & (yi >= 1) & (yi <= Y) & (xi >= 1) & (xi <= X)
    )
    out_ref[...] = jnp.where(interior, val, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("weights", "grid_shape", "offsets", "slab", "alpha",
                     "zero_guess"),
)
def _prolong_sweep_impl(
    x_pad, b_pad, scale_pad, ec_pad, weights, grid_shape, offsets, alpha,
    slab, zero_guess,
):
    Z, Y, X = grid_shape
    Zr, Yr, Xr = b_pad.shape
    cs = coarse_shape_of(grid_shape)
    Zc_r, Ycp, Xcp = padded_shape(cs, slab)
    T = slab
    G = Zr // T
    use_scale = alpha == 0.0
    taps = tuple(
        (int(o[0]), int(o[1]), int(o[2]), float(w))
        for o, w in zip(offsets, weights)
    )
    n_wstreams = (1 + int(use_scale)) if zero_guess else 1
    plane = Yr * Xr * b_pad.dtype.itemsize
    resident = n_wstreams * Zr * plane <= _RESIDENT_BYTES
    kernel = functools.partial(
        _ps_kernel, taps=taps, dims=(Z, Y, X), T=T, G=G, alpha=alpha,
        use_scale=use_scale, Zc_r=Zc_r, zero_guess=zero_guess,
        resident=resident,
    )
    blk = lambda: pl.BlockSpec(
        (T, Yr, Xr), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    hbm = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
    if zero_guess:
        in_specs = [hbm()]
        args = [b_pad]
        if use_scale:
            in_specs.append(hbm())
            args.append(scale_pad)
    else:
        in_specs = [hbm(), blk()]
        args = [x_pad, b_pad]
        if use_scale:
            in_specs.append(blk())
            args.append(scale_pad)
    in_specs.append(hbm())
    args.append(ec_pad)
    NZ = T // 2 + 2
    wshape = (Zr, Yr, Xr) if resident else (2, T + 2, Yr, Xr)
    scratch = [
        pltpu.VMEM(wshape, b_pad.dtype) for _ in range(n_wstreams)
    ] + [
        pltpu.VMEM((Zc_r, Ycp, Xcp), b_pad.dtype),  # resident ec copy
        pltpu.VMEM((NZ, Yr, Xr), b_pad.dtype),
        pltpu.VMEM((T + 2, Yr, Xr), b_pad.dtype),
        pltpu.SemaphoreType.DMA((2, 6)),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Zr, Yr, Xr), b_pad.dtype),
        grid=(G,),
        in_specs=in_specs,
        out_specs=blk(),
        scratch_shapes=scratch,
    )(*args)


def prolong_sweep_padded(
    x_pad, b_pad, ec_pad, weights, grid_shape, offsets,
    alpha: float = 0.0, scale_pad=None, slab: int = 8,
    zero_guess: bool = False,
):
    """One fused (prolong + correction-add + smoother sweep) pass:

        u' = x + P ec;   out = u' + scale (b - A u')

    x_pad/b_pad in padded-fine layout, ec_pad in padded-COARSE layout
    (as produced by residual_restrict_padded / to_padded). alpha != 0
    selects the scalar-weight smoother (no scale stream).

    zero_guess=True substitutes x = scale*b (or alpha*b) — the post half
    of a zero-guess V-cycle level visit whose single pre-sweep was folded
    into residual_restrict_padded(zero_guess=True); x_pad is ignored."""
    if b_pad.dtype == jnp.float64:
        return _prolong_sweep_impl(
            x_pad, b_pad, scale_pad, ec_pad, weights, grid_shape, offsets,
            alpha, slab, zero_guess,
        )
    with jax.enable_x64(False):
        return _prolong_sweep_impl(
            x_pad, b_pad, scale_pad, ec_pad, weights, grid_shape, offsets,
            alpha, slab, zero_guess,
        )
