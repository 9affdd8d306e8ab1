"""Fully-fused structured V-cycle: fine-level state stays in padded layout.

The structured hierarchy's fine level dominates cycle cost; its smoothing
sweeps and residuals run through the fused Pallas kernel (one HBM pass each
instead of ~29 unfused XLA passes), with the level-0 state kept permanently
in the kernel's zero-shelled padded layout — layout conversions happen only
at the level-0/level-1 transfer boundary (one slice/pad pass each way).
Coarse levels run the ordinary flat-vector path (they are small).

This is the production single-chip solve path for stencil problems
(baseline configs 1-3); semantics are identical to mult_vcycle on the same
hierarchy (tested).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from amg_tpu.ops.pallas_stencil import (
    from_padded,
    padded_shape,
    stencil_kernel_padded,
    to_padded,
)
from amg_tpu.ops.pallas_transfer import (
    coarse_shape_of,
    prolong_sweep_padded,
    residual_restrict_padded,
    transfer_fuse_ok,
)
from amg_tpu.setup.hierarchy import Hierarchy
from amg_tpu.setup.structured import (
    StructuredRestrict,
    _axis_transfer_np,
    _transfer_axis,
)
from amg_tpu.solve.cycles import CycleConfig, mult_vcycle
from amg_tpu.sparse.stencil import StencilOperator


class StructKernelSpec(NamedTuple):
    """Static fine-level kernel data (host-built once per hierarchy)."""

    weights: tuple
    offsets: tuple
    grid_shape: tuple
    slab: int
    alpha: float  # constant smoother scale (0.0 = non-constant, use vec)
    scale_pad: jnp.ndarray  # inv_wscale in padded layout ("sweep_vec")


def make_struct_spec(
    hier: Hierarchy, slab: int = 8, lvl: int = 0
) -> StructKernelSpec:
    A0 = hier.levels[lvl].A
    assert isinstance(A0, StencilOperator), "level must be a constant stencil"
    inv_wscale = np.asarray(hier.levels[lvl].sm.inv_wscale)
    # constant-scale detection: wJacobi on a constant-diagonal stencil has a
    # single scalar weight (the reference's production DMEM smoother shape:
    # w = 1/lambda_max scalar, src/DMEM_Setup.cpp:77-87). The scalar fused
    # kernels skip the third HBM stream and admit deeper sweep fusion.
    alpha = (
        float(inv_wscale[0])
        if inv_wscale.size and np.all(inv_wscale == inv_wscale[0])
        else 0.0
    )
    return StructKernelSpec(
        weights=tuple(float(w) for w in np.asarray(A0.weights)),
        offsets=A0.offsets,
        grid_shape=A0.grid_shape,
        slab=slab,
        alpha=alpha,
        scale_pad=to_padded(
            jnp.asarray(hier.levels[lvl].sm.inv_wscale), A0.grid_shape, slab
        ),
    )


# fused kernels pay off down to this edge length; below it the flat XLA
# ops on a few-thousand-dof grid are already trivial
_DEEP_MIN_SIDE = 16


def make_coarse_specs(hier: Hierarchy, slab: int):
    """Per-level StructKernelSpecs for every COARSE level whose operator is
    a constant StencilOperator (the coarse_op='const' hierarchy): the deep
    fused cycle runs those levels through the same zero-coefficient-traffic
    Pallas kernels as level 0. Returns {lvl: spec} (possibly empty)."""
    specs = {}
    for lvl in range(1, hier.num_levels - 1):
        A = hier.levels[lvl].A
        if not isinstance(A, StencilOperator):
            continue
        if min(A.grid_shape) < _DEEP_MIN_SIDE:
            continue
        if not isinstance(hier.levels[lvl].R, StructuredRestrict):
            continue
        specs[lvl] = make_struct_spec(hier, slab, lvl)
    return specs


# fused transfer kernels pay off only where the fine state is large enough
# that the removed HBM intermediates dominate the added per-kernel fixed
# cost (windowed DMA amplification + the in-kernel MXU transfer dots):
# measured at 126^3, fusing the 63^3-and-below levels DOUBLED the coarse
# chain cost (0.030 -> 0.064 ms) while fusing level 0 saved ~0.03 ms
_FUSE_MIN_SIDE = 96


def _can_fuse(hier: Hierarchy, lvl: int, spec) -> bool:
    """True when level lvl's transfers can run through the fused Pallas
    residual+restrict / prolong+sweep kernels (ops/pallas_transfer.py):
    structured separable transfers with the standard (s+1)//2 coarsening
    on every axis, reach-1 stencil, kernel windows that fit, and a level
    large enough for the fusion to win (_FUSE_MIN_SIDE)."""
    R = hier.levels[lvl].R
    if not isinstance(R, StructuredRestrict):
        return False
    if min(spec.grid_shape) < _FUSE_MIN_SIDE:
        return False
    return transfer_fuse_ok(
        spec.grid_shape, R.coarse_shape, spec.offsets, spec.slab
    )


def _fused_correct_and_post(hier, cfg, specs, lvl, spec, x_pad, b_pad):
    """From the post-pre-sweep padded iterate x_pad at level lvl: fused
    residual+restrict (the fine residual never touches HBM), recursive
    coarse correction, fused prolong+first-post-sweep (the correction-add
    costs zero extra HBM passes), remaining post sweeps. Numerically the
    exact mult_vcycle ordering (tested in interpret mode)."""
    cs = coarse_shape_of(spec.grid_shape)
    rc_pad = residual_restrict_padded(
        x_pad, b_pad, spec.weights, spec.grid_shape, spec.offsets, spec.slab
    )
    nxt = specs.get(lvl + 1)
    ec_flat = ec_pad = None
    if (
        lvl + 1 < hier.num_levels - 1
        and nxt is not None
        and (
            _can_fuse(hier, lvl + 1, nxt)
            or _can_fuse_zg(hier, lvl + 1, nxt, cfg)
        )
    ):
        ec_pad = _deep_correct_fused(hier, cfg, specs, lvl + 1, rc_pad)
    else:
        ec_flat = _deep_correct(
            hier, cfg, specs, lvl + 1, from_padded(rc_pad, cs)
        )
    if cfg.num_post_sweeps >= 1:
        if ec_pad is None:
            ec_pad = to_padded(ec_flat, cs, spec.slab)
        x_pad = prolong_sweep_padded(
            x_pad, b_pad, ec_pad, spec.weights, spec.grid_shape,
            spec.offsets, alpha=spec.alpha,
            scale_pad=None if spec.alpha != 0.0 else spec.scale_pad,
            slab=spec.slab,
        )
        return _fine_sweeps(spec, x_pad, b_pad, cfg.num_post_sweeps - 1)
    if ec_flat is None:
        ec_flat = from_padded(ec_pad, cs)
    return x_pad + _prolong_padded(spec, ec_flat)


def _can_fuse_zg(hier: Hierarchy, lvl: int, spec, cfg: CycleConfig) -> bool:
    """True when a COARSE level's whole V(1,1) visit can run as two fused
    zero-guess kernels: rc2 = R(b - A(s b)) and x' = S(s b + P ec, b) —
    the dominant win on the 63^3/32^3 levels, where the generic visit's
    sweep kernels + einsum transfers are pure HBM re-streaming of 1-3 MB
    arrays. Needs the single-pre-sweep shape (the zero-guess pre-sweep is
    exactly x = s b) and at least one post sweep."""
    if cfg.num_pre_sweeps != 1 or cfg.num_post_sweeps < 1:
        return False
    R = hier.levels[lvl].R
    if not isinstance(R, StructuredRestrict):
        return False
    return transfer_fuse_ok(
        spec.grid_shape, R.coarse_shape, spec.offsets, spec.slab
    )


def _deep_correct_fused(hier, cfg, specs, lvl, rc_pad):
    """Coarse-grid correction with PADDED rhs in, PADDED correction out —
    the all-fused chain (caller guarantees specs[lvl] and _can_fuse /
    _can_fuse_zg)."""
    spec = specs[lvl]
    if _can_fuse_zg(hier, lvl, spec, cfg):
        # zero-guess level visit in two kernels: the pre-sweep from zero
        # is x = s*b, folded into both transfer kernels
        cs = coarse_shape_of(spec.grid_shape)
        sp = None if spec.alpha != 0.0 else spec.scale_pad
        rc2_pad = residual_restrict_padded(
            None, rc_pad, spec.weights, spec.grid_shape, spec.offsets,
            spec.slab, zero_guess=True, scale_pad=sp, alpha=spec.alpha,
        )
        nxt = specs.get(lvl + 1)
        if (
            lvl + 1 < hier.num_levels - 1
            and nxt is not None
            and (
                _can_fuse(hier, lvl + 1, nxt)
                or _can_fuse_zg(hier, lvl + 1, nxt, cfg)
            )
        ):
            ec_pad = _deep_correct_fused(hier, cfg, specs, lvl + 1, rc2_pad)
        else:
            ec = _deep_correct(
                hier, cfg, specs, lvl + 1, from_padded(rc2_pad, cs)
            )
            ec_pad = to_padded(ec, cs, spec.slab)
        x_pad = prolong_sweep_padded(
            None, rc_pad, ec_pad, spec.weights, spec.grid_shape,
            spec.offsets, alpha=spec.alpha, scale_pad=sp, slab=spec.slab,
            zero_guess=True,
        )
        return _fine_sweeps(spec, x_pad, rc_pad, cfg.num_post_sweeps - 1)
    x_pad = _fine_sweeps(
        spec, jnp.zeros_like(rc_pad), rc_pad, cfg.num_pre_sweeps
    )
    return _fused_correct_and_post(hier, cfg, specs, lvl, spec, x_pad, rc_pad)


def _deep_correct(hier: Hierarchy, cfg: CycleConfig, specs, lvl, rc):
    """Coarse-grid correction for flat rhs rc at level lvl >= 1, running
    constant-stencil levels through the fused padded kernels (zero-guess
    pre-sweeps, residual, recursive correction, prolong-add, post-sweeps —
    the exact mult_vcycle ordering) and falling back to the generic
    mult_vcycle below _DEEP_MIN_SIDE or on non-constant levels."""
    L = hier.num_levels
    if lvl == L - 1:
        return hier.coarse_Ainv @ rc
    spec = specs.get(lvl)
    if spec is None:
        sub = Hierarchy(
            levels=hier.levels[lvl:], coarse_Ainv=hier.coarse_Ainv
        )
        return mult_vcycle(sub, cfg, jnp.zeros_like(rc), rc)
    if _can_fuse(hier, lvl, spec) or _can_fuse_zg(hier, lvl, spec, cfg):
        rc_pad = to_padded(rc, spec.grid_shape, spec.slab)
        return from_padded(
            _deep_correct_fused(hier, cfg, specs, lvl, rc_pad),
            spec.grid_shape,
        )
    b_pad = to_padded(rc, spec.grid_shape, spec.slab)
    x_pad = _fine_sweeps(
        spec, jnp.zeros_like(b_pad), b_pad, cfg.num_pre_sweeps
    )
    r_pad = _fine(spec, "residual", x_pad, b_pad)
    rc2 = _restrict_padded(spec, r_pad)
    ec = _deep_correct(hier, cfg, specs, lvl + 1, rc2)
    x_pad = x_pad + _prolong_padded(spec, ec)
    x_pad = _fine_sweeps(spec, x_pad, b_pad, cfg.num_post_sweeps)
    return from_padded(x_pad, spec.grid_shape)


# fused k-sweep configs known to fit VMEM on current TPUs (measured): the
# scalar kernels compile up to (k=3, slab=6); the vec kernels (third HBM
# stream) only up to (k<=3, slab=4). Single sweeps compile at any slab.
_FUSED_SCALAR = {(2, 4), (2, 6), (3, 4), (3, 6), (4, 4)}
_FUSED_VEC = {(2, 4), (3, 4)}


def pick_struct_slab(cfg: CycleConfig, scalar_scale: bool) -> int:
    """Slab for the struct path: 8 for single-sweep cycles (least halo
    amplification); 6/4 when multi-sweep fusion is available and wanted."""
    ns = max(cfg.num_pre_sweeps, cfg.num_post_sweeps)
    if ns <= 1:
        return 8
    return 6 if scalar_scale else 4


def _is_box27(spec) -> bool:
    return len(spec.offsets) == 27


def _fine(spec, mode, u_pad, b_pad):
    return stencil_kernel_padded(
        u_pad, b_pad, spec.weights, spec.grid_shape, spec.offsets,
        alpha=0.0, scale_pad=(spec.scale_pad if mode == "sweep_vec" else None),
        mode=mode, slab=spec.slab,
    )


def _fine_sweeps(spec, u_pad, b_pad, n: int):
    """n fused smoother sweeps on the fine level: greedily chains the
    deepest compiling fused k-sweep kernel (identical numerics to n single
    sweeps — reach-k halo recompute, tested bit-exact)."""
    scalar = spec.alpha != 0.0
    table = _FUSED_SCALAR if scalar else _FUSED_VEC
    left = n
    while left > 0:
        k = 1
        if _is_box27(spec):
            for cand in (4, 3, 2):
                if cand <= left and (cand, spec.slab) in table:
                    k = cand
                    break
        if k == 1:
            u_pad = (
                stencil_kernel_padded(
                    u_pad, b_pad, spec.weights, spec.grid_shape,
                    spec.offsets, alpha=spec.alpha, scale_pad=None,
                    mode="sweep", slab=spec.slab,
                )
                if scalar
                else _fine(spec, "sweep_vec", u_pad, b_pad)
            )
        else:
            u_pad = stencil_kernel_padded(
                u_pad, b_pad, spec.weights, spec.grid_shape, spec.offsets,
                alpha=spec.alpha,
                scale_pad=(None if scalar else spec.scale_pad),
                mode=f"sweep{k}" + ("" if scalar else "_vec"),
                slab=spec.slab,
            )
        left -= k
    return u_pad


def _padded_transfer_mats(grid_shape, slab):
    """Per-axis 1-D transfer matrices mapping the PADDED fine layout
    directly to the flat coarse grid (interior starts at padded row 1; the
    zero-shell/pad rows get all-zero matrix rows). Lets the level-0/1
    transfers run straight off the kernel's padded state — no
    from_padded/to_padded passes and no strided lane slicing."""
    cshape = tuple((s + 1) // 2 for s in grid_shape)
    pshape = padded_shape(grid_shape, slab)
    mats = []
    for sf, sc, sp in zip(grid_shape, cshape, pshape):
        S = np.zeros((sp, sc))
        S[1 : 1 + sf] = _axis_transfer_np(sf, sc)
        mats.append(S)
    return cshape, tuple(mats)


def _restrict_padded(spec, r_pad):
    """Full-weighting restriction padded-fine → flat-coarse (MXU einsums)."""
    _, mats = _padded_transfer_mats(spec.grid_shape, spec.slab)
    g = r_pad
    for d in range(g.ndim):
        g = _transfer_axis(g, mats[d], d, to_coarse=True)
    return g.reshape(-1)


def _prolong_padded(spec, ec):
    """Trilinear prolongation flat-coarse → padded-fine; the zero shell is
    produced by the all-zero pad rows of the transfer matrices."""
    cshape, mats = _padded_transfer_mats(spec.grid_shape, spec.slab)
    g = ec.reshape(cshape)
    for d in range(g.ndim):
        g = _transfer_axis(g, mats[d], d, to_coarse=False)
    return g


def _struct_transfers(hier):
    """True when level-0 transfers are the structured separable pair, i.e.
    the padded-direct matmul transfers are exactly lv0.R / lv0.P."""
    return isinstance(hier.levels[0].R, StructuredRestrict)


def struct_vcycle(
    hier: Hierarchy, cfg: CycleConfig, spec: StructKernelSpec,
    x_pad: jnp.ndarray, b_pad: jnp.ndarray, coarse_specs=None,
) -> jnp.ndarray:
    """One V-cycle with fused fine-level ops; x/b in padded layout.
    coarse_specs (make_coarse_specs) routes constant-stencil coarse levels
    through the fused kernels too (the coarse_op='const' production
    path)."""
    lv0 = hier.levels[0]
    padded_xfer = _struct_transfers(hier)
    x_pad = _fine_sweeps(spec, x_pad, b_pad, cfg.num_pre_sweeps)
    if padded_xfer and _can_fuse(hier, 0, spec):
        return _fused_correct_and_post(
            hier, cfg, coarse_specs or {}, 0, spec, x_pad, b_pad
        )
    r_pad = _fine(spec, "residual", x_pad, b_pad)
    rc = (
        _restrict_padded(spec, r_pad)
        if padded_xfer
        else lv0.R @ from_padded(r_pad, spec.grid_shape)
    )
    ec = _deep_correct(hier, cfg, coarse_specs or {}, 1, rc)
    e_pad = (
        _prolong_padded(spec, ec)
        if padded_xfer
        else to_padded(lv0.P @ ec, spec.grid_shape, spec.slab)
    )
    x_pad = x_pad + e_pad
    x_pad = _fine_sweeps(spec, x_pad, b_pad, cfg.num_post_sweeps)
    return x_pad


def _split_specs(specs):
    """{lvl: spec} -> (hashable static tuple, traced scale_pads tuple)."""
    items = sorted(specs.items())
    static = tuple(
        (lvl, s.weights, s.offsets, s.grid_shape, s.slab, s.alpha)
        for lvl, s in items
    )
    pads = tuple(s.scale_pad for _, s in items)
    return static, pads


def _join_specs(static, pads):
    return {
        lvl: StructKernelSpec(
            weights=w, offsets=o, grid_shape=g, slab=sl, alpha=a,
            scale_pad=p,
        )
        for (lvl, w, o, g, sl, a), p in zip(static, pads)
    }


class StructSolveResult(NamedTuple):
    x: jnp.ndarray  # flat interior vector
    iters: jnp.ndarray
    rel_resnorm: jnp.ndarray
    history: jnp.ndarray

    def num_iters(self) -> int:
        return int(self.iters)

    def history_list(self):
        h = np.asarray(self.history)
        return h[~np.isnan(h)].tolist()


def struct_solve(
    hier: Hierarchy,
    cfg: CycleConfig,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    max_cycles: int = 100,
    slab: Optional[int] = None,
) -> StructSolveResult:
    """Full solve through the fused structured cycle (one jitted while_loop).

    slab=None picks the layout automatically: 8 for single-sweep cycles,
    6/4 when multi-sweep fusion applies (see pick_struct_slab)."""
    if slab is None:
        probe = np.asarray(hier.levels[0].sm.inv_wscale)
        scalar = bool(probe.size) and bool(np.all(probe == probe[0]))
        slab = pick_struct_slab(cfg, scalar)
    spec = make_struct_spec(hier, slab)
    cs_static, cs_pads = _split_specs(make_coarse_specs(hier, slab))
    if x0 is None:
        x0 = jnp.zeros_like(b)
    fn = jax.jit(
        _loop,
        static_argnames=("cfg", "spec_static", "cs_static", "tol",
                         "max_cycles"),
    )
    # split spec into static metadata + the device array
    spec_static = (
        spec.weights, spec.offsets, spec.grid_shape, spec.slab, spec.alpha,
    )
    return fn(
        hier, cfg, spec_static, spec.scale_pad, cs_static, cs_pads, b, x0,
        tol, max_cycles,
    )


def struct_timed_cycles(
    hier: Hierarchy,
    cfg: CycleConfig,
    b: jnp.ndarray,
    num_cycles: int,
    slab: Optional[int] = None,
) -> jnp.ndarray:
    """Exactly num_cycles fused struct V-cycles with NO residual-norm
    monitoring, as one jitted fori_loop — the benchmark's per-cycle cost
    program (the reference's -no_resnorm timing mode). Two launches with
    different num_cycles give the marginal cycle cost by slope, with the
    launch/dispatch overhead subtracted out."""
    if slab is None:
        probe = np.asarray(hier.levels[0].sm.inv_wscale)
        scalar = bool(probe.size) and bool(np.all(probe == probe[0]))
        slab = pick_struct_slab(cfg, scalar)
    spec = make_struct_spec(hier, slab)
    cs_static, cs_pads = _split_specs(make_coarse_specs(hier, slab))
    spec_static = (
        spec.weights, spec.offsets, spec.grid_shape, spec.slab, spec.alpha,
    )
    fn = jax.jit(
        _timed_loop,
        static_argnames=("cfg", "spec_static", "cs_static", "num_cycles"),
    )
    return fn(
        hier, cfg, spec_static, spec.scale_pad, cs_static, cs_pads, b,
        num_cycles,
    )


def _timed_loop(hier, cfg, spec_static, scale_pad, cs_static, cs_pads, b,
                num_cycles):
    weights, offsets, grid_shape, slab, alpha = spec_static
    spec = StructKernelSpec(
        weights=weights, offsets=offsets, grid_shape=grid_shape, slab=slab,
        alpha=alpha, scale_pad=scale_pad,
    )
    cspecs = _join_specs(cs_static, cs_pads)
    b_pad = to_padded(b, grid_shape, slab)
    x0 = jnp.zeros_like(b_pad)
    x_pad = jax.lax.fori_loop(
        0, num_cycles,
        lambda _, x: struct_vcycle(hier, cfg, spec, x, b_pad, cspecs),
        x0,
    )
    return from_padded(x_pad, grid_shape)


def _presweep_norm(spec, cfg, x_pad, b_pad):
    """Pre-sweeps with the FIRST sweep fused to the incoming iterate's
    residual-norm partials (mode sweep_vec_norm) — the convergence monitor
    comes free with the sweep, no dedicated residual pass.

    With num_pre_sweeps == 0 there is no sweep to fuse into: the norm comes
    from a plain residual pass and the iterate is returned untouched (the
    mult_vcycle equivalence must hold for every sweep count)."""
    if cfg.num_pre_sweeps == 0:
        r_pad = _fine(spec, "residual", x_pad, b_pad)
        r = from_padded(r_pad, spec.grid_shape)
        return x_pad, jnp.sqrt(jnp.sum(r * r))
    y_pad, parts = stencil_kernel_padded(
        x_pad, b_pad, spec.weights, spec.grid_shape, spec.offsets,
        alpha=0.0, scale_pad=spec.scale_pad, mode="sweep_vec_norm",
        slab=spec.slab,
    )
    y_pad = _fine_sweeps(spec, y_pad, b_pad, cfg.num_pre_sweeps - 1)
    return y_pad, jnp.sqrt(jnp.sum(parts))


def _loop(hier, cfg, spec_static, scale_pad, cs_static, cs_pads, b, x0,
          tol, max_cycles):
    """Pipelined cycle loop: each body completes cycle k (residual →
    coarse correct → post sweeps) and then runs cycle k+1's pre-sweeps,
    whose fused norm IS ||r(x_k)|| — one fewer fine-grid pass per cycle
    than monitoring with a separate residual, with iterates identical to
    mult_vcycle (the discarded trailing pre-sweep never enters x)."""
    weights, offsets, grid_shape, slab, alpha = spec_static
    spec = StructKernelSpec(
        weights=weights, offsets=offsets, grid_shape=grid_shape, slab=slab,
        alpha=alpha, scale_pad=scale_pad,
    )
    cspecs = _join_specs(cs_static, cs_pads)
    lv0 = hier.levels[0]
    b_pad = to_padded(b, grid_shape, slab)
    x_pad0 = to_padded(x0, grid_shape, slab)
    y0, r0n = _presweep_norm(spec, cfg, x_pad0, b_pad)
    safe_r0 = jnp.where(r0n == 0.0, 1.0, r0n)
    hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=b.dtype)
    hist0 = hist0.at[0].set(1.0)

    padded_xfer = _struct_transfers(hier)

    fuse0 = padded_xfer and _can_fuse(hier, 0, spec)

    def finish_cycle(y_pad):
        """residual → restrict → coarse solve → prolong → post sweeps."""
        if fuse0:
            return _fused_correct_and_post(
                hier, cfg, cspecs, 0, spec, y_pad, b_pad
            )
        r_pad = _fine(spec, "residual", y_pad, b_pad)
        rc = (
            _restrict_padded(spec, r_pad)
            if padded_xfer
            else lv0.R @ from_padded(r_pad, grid_shape)
        )
        ec = _deep_correct(hier, cfg, cspecs, 1, rc)
        y_pad = y_pad + (
            _prolong_padded(spec, ec)
            if padded_xfer
            else to_padded(lv0.P @ ec, grid_shape, slab)
        )
        return _fine_sweeps(spec, y_pad, b_pad, cfg.num_post_sweeps)

    def body(state):
        x_cyc, y_pad, k, relnorm, hist = state
        x_new = finish_cycle(y_pad)  # completes cycle k+1 → x_{k+1}
        y_new, rn = _presweep_norm(spec, cfg, x_new, b_pad)  # starts k+2
        rel = rn / safe_r0  # = ||r(x_{k+1})|| / ||r0||
        hist = hist.at[k + 1].set(rel)
        return (x_new, y_new, k + 1, rel, hist)

    def cond(state):
        _, _, k, relnorm, hist = state
        # stagnation guard: in f32 the achievable relative residual floors
        # around ~1e-5 at ~1e6 dofs — stop when a cycle no longer reduces
        # the residual by >1% instead of spinning to max_cycles (tighter
        # tolerances route through amg_tpu.solve.mixed double-single
        # refinement)
        prev = jnp.where(k >= 1, hist[jnp.maximum(k - 1, 0)], jnp.inf)
        stalled = (k >= 2) & (relnorm > 0.99 * prev)
        return (k < max_cycles) & (relnorm > tol) & ~stalled

    state = (
        x_pad0, y0, jnp.asarray(0, jnp.int32),
        jnp.asarray(jnp.inf, b.dtype), hist0,
    )
    x_pad, _, it, relnorm, hist = jax.lax.while_loop(cond, body, state)
    return StructSolveResult(
        x=from_padded(x_pad, grid_shape), iters=it, rel_resnorm=relnorm,
        history=hist,
    )
