"""Mixed-precision iterative refinement: f32 cycles under an f64 outer loop.

Pure-f32 V-cycles stagnate near relative residual ~1e-5/1e-6 (roundoff
floor), but the reference's convergence targets are 1e-8 in double
(everything in the reference is C++ double). The TPU-native resolution is
iterative refinement — the standard mixed-precision MG construction:

    x (f64);  repeat:  r = b - A x   (f64 fine-grid residual)
                       e = V_32(r)   (one f32 V-cycle from zero guess)
                       x += e        (f64 accumulation)

The contraction rate is the f32 cycle's rate until the f64 floor, while all
per-cycle heavy lifting runs at f32 speed (f64 on TPU appears only in one
residual + axpy per cycle).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from amg_tpu.solve.cycles import CycleConfig, cycle_step


class MixedSolveResult(NamedTuple):
    x: jnp.ndarray  # f64 (CPU) or f32 hi part (TPU double-single)
    iters: jnp.ndarray
    rel_resnorm: jnp.ndarray
    history: jnp.ndarray
    x_lo: Optional[jnp.ndarray] = None  # double-single low part (TPU)

    def num_iters(self) -> int:
        return int(self.iters)

    def history_list(self):
        import numpy as np

        h = np.asarray(self.history)
        return h[~np.isnan(h)].tolist()


def mixed_solve(
    hier32,
    A64,
    cfg: CycleConfig,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-8,
    max_cycles: int = 200,
) -> MixedSolveResult:
    """Solve A x = b to ~f64 accuracy with f32 cycles.

    hier32: hierarchy built with dtype=float32; A64: fine operator with
    f64 weights — used directly where f64 compiles (CPU), or converted to
    the double-single compensated path on TPU (where f64 does not)."""
    import numpy as np

    b = jnp.asarray(b)
    if jax.default_backend() == "cpu":
        b = b.astype(jnp.float64)
        if x0 is None:
            x0 = jnp.zeros_like(b)
        fn = jax.jit(_loop_f64, static_argnames=("cfg", "tol", "max_cycles"))
        return fn(hier32, A64, cfg, b, x0, tol, max_cycles)
    # TPU: double-single state + compensated residual (ops/ds.py)
    b64 = np.asarray(b, dtype=np.float64)
    b_hi = b64.astype(np.float32)
    b_lo = (b64 - b_hi).astype(np.float32)
    from amg_tpu.ops.ds import DS

    b_ds = DS(hi=jnp.asarray(b_hi), lo=jnp.asarray(b_lo))
    A32 = hier32.levels[0].A
    if x0 is None:
        x0_ds = DS(hi=jnp.zeros_like(b_ds.hi), lo=jnp.zeros_like(b_ds.hi))
    else:
        x64 = np.asarray(x0, dtype=np.float64)
        xh = x64.astype(np.float32)
        x0_ds = DS(hi=jnp.asarray(xh), lo=jnp.asarray((x64 - xh).astype(np.float32)))
    fn = jax.jit(_loop_ds, static_argnames=("cfg", "tol", "max_cycles"))
    return fn(hier32, A32, cfg, b_ds, x0_ds, tol, max_cycles)


def _loop_f64(hier32, A64, cfg, b, x0, tol, max_cycles):
    r0 = b - A64 @ x0
    r0n = jnp.linalg.norm(r0)
    safe_r0 = jnp.where(r0n == 0.0, 1.0, r0n)
    hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=jnp.float64)
    hist0 = hist0.at[0].set(1.0)

    def body(state):
        x, k, relnorm, hist = state
        r = b - A64 @ x
        r32 = r.astype(jnp.float32)
        e32 = cycle_step(hier32, cfg, jnp.zeros_like(r32), r32)
        x = x + e32.astype(jnp.float64)
        r_new = b - A64 @ x
        relnorm = jnp.linalg.norm(r_new) / safe_r0
        hist = hist.at[k + 1].set(relnorm)
        return (x, k + 1, relnorm, hist)

    def cond(state):
        _, k, relnorm, _ = state
        return (k < max_cycles) & (relnorm > tol)

    state = (x0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, jnp.float64), hist0)
    x, it, relnorm, hist = jax.lax.while_loop(cond, body, state)
    return MixedSolveResult(x=x, iters=it, rel_resnorm=relnorm, history=hist)


def _loop_ds(hier32, A32, cfg, b_ds, x0_ds, tol, max_cycles):
    from amg_tpu.ops.ds import ds_add_float, ds_residual, ds_to_float

    r0 = ds_residual(A32, b_ds, x0_ds)
    r0n = jnp.linalg.norm(ds_to_float(r0))
    safe_r0 = jnp.where(r0n == 0.0, jnp.float32(1.0), r0n)
    hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=jnp.float32)
    hist0 = hist0.at[0].set(1.0)

    def body(state):
        x, k, relnorm, hist = state
        r = ds_residual(A32, b_ds, x)
        e32 = cycle_step(hier32, cfg, jnp.zeros_like(r.hi), ds_to_float(r))
        x = ds_add_float(x, e32)
        r_new = ds_residual(A32, b_ds, x)
        # norm of a DS vector in f32 (its magnitude is far above f32 tiny)
        relnorm = jnp.linalg.norm(ds_to_float(r_new)) / safe_r0
        hist = hist.at[k + 1].set(relnorm)
        return (x, k + 1, relnorm, hist)

    def cond(state):
        _, k, relnorm, _ = state
        return (k < max_cycles) & (relnorm > tol)

    state = (
        x0_ds, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, jnp.float32),
        hist0,
    )
    x, it, relnorm, hist = jax.lax.while_loop(cond, body, state)
    return MixedSolveResult(
        x=x.hi, iters=it, rel_resnorm=relnorm, history=hist, x_lo=x.lo
    )
