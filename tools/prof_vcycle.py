"""Per-phase budget of the flagship structured V-cycle at 2M dofs (TPU).

Round-4 verdict item 1: vcycle_ms 0.351 vs traffic_bound_ms 0.127 — find
where the 0.22 ms lives. Every phase is timed by the chained-dependent-
launch slope (the bench methodology): t(k1 chained apps) - t(k0) over
(k1-k0), result materialized.

Usage: python tools/prof_vcycle.py  (on the TPU machine)
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from amg_tpu.problems import laplacian_3d_27pt
from amg_tpu.setup.structured import build_structured_hierarchy
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType
from amg_tpu.setup.hierarchy import Hierarchy
from amg_tpu.solve.cycles import mult_vcycle
import amg_tpu.ops.pallas_stencil as ps
from amg_tpu.solve.struct_cycle import (
    StructKernelSpec, make_struct_spec, pick_struct_slab, _fine, _fine_sweeps,
    _restrict_padded, _prolong_padded, struct_vcycle,
)


def slope(f, x0, k0=5, k1=55, reps=2):
    """DEVICE-only per-application cost: iterate f inside one jitted
    fori_loop (a single launch per measurement — no per-launch enqueue in
    the marginal), slope between two fixed iteration counts."""
    # dynamic trip count: ONE compile per phase (lowered to while_loop;
    # loop overhead is negligible against these kernel sizes)
    loop = jax.jit(
        lambda u, k: jax.lax.fori_loop(0, k, lambda _, v: f(v), u)
    )

    def run(k):
        t0 = time.perf_counter()
        out = loop(x0, k)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        return time.perf_counter() - t0

    run(k0)  # compile once
    ta = min(run(k0) for _ in range(reps))
    tb = min(run(k1) for _ in range(reps))
    return max(tb - ta, 1e-12) / (k1 - k0)


def main():
    dtype = jnp.float32
    n_side = 126
    prob = laplacian_3d_27pt(n_side)
    _, hier = build_structured_hierarchy(
        prob.stencil, smoother=SmootherType.L1_JACOBI, dtype=dtype
    )
    cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
    probe = np.asarray(hier.levels[0].sm.inv_wscale)
    scalar = bool(probe.size) and bool(np.all(probe == probe[0]))
    slab = pick_struct_slab(cfg, scalar)
    spec = make_struct_spec(hier, slab)
    print("slab:", slab, "alpha:", spec.alpha, "levels:", hier.num_levels)
    print("level sizes:", [lv.A.shape[0] if hasattr(lv.A, 'shape') else np.prod(lv.A.grid_shape) for lv in hier.levels])
    pshape = ps.padded_shape(prob.stencil.grid_shape, slab)
    state_mb = int(np.prod(pshape)) * 4 / 1e6
    print("padded shape:", pshape, f"state {state_mb:.1f} MB")

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(prob.n), dtype)
    b_pad = ps.to_padded(b, prob.stencil.grid_shape, slab)
    x_pad = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), prob.stencil.grid_shape, slab)

    out = {}
    # fine sweeps (pre = post = 1 each by default)
    f_sweep = jax.jit(lambda u: _fine_sweeps(spec, u, b_pad, 1))
    out["fine_sweep_1"] = slope(f_sweep, x_pad)
    f_res = jax.jit(lambda u: _fine(spec, "residual", u, b_pad))
    out["fine_residual"] = slope(f_res, x_pad)
    # restrict + prolong (padded <-> coarse roundtrip to keep shapes fixed)
    f_rp = jax.jit(lambda u: _prolong_padded(spec, _restrict_padded(spec, u)))
    out["restrict_plus_prolong"] = slope(f_rp, x_pad)

    # coarse solve: the full sub-hierarchy V-cycle on level-1 rhs
    rc = _restrict_padded(spec, x_pad)
    sub = Hierarchy(levels=hier.levels[1:], coarse_Ainv=hier.coarse_Ainv)
    f_coarse = jax.jit(lambda r: mult_vcycle(sub, cfg, jnp.zeros_like(r), r))
    out["coarse_vcycle_all_levels"] = slope(f_coarse, rc)

    # level-1 only pieces: one smoother sweep + residual at 63^3
    lv1 = hier.levels[1]
    from amg_tpu.solve.cycles import residual as res_fn
    from amg_tpu.smooth.smoothers import smooth
    f_l1s = jax.jit(lambda u: smooth(lv1.A, lv1.sm, cfg.smoother, u, rc, num_sweeps=1, zero_guess=False))
    out["level1_smooth_1"] = slope(f_l1s, rc)
    f_l1r = jax.jit(lambda u: res_fn(lv1.A, u, rc))
    out["level1_residual"] = slope(f_l1r, rc)

    # 2-level-only cycle (coarse solve replaced by nothing) vs full
    f_full = jax.jit(lambda u: struct_vcycle(hier, cfg, spec, u, b_pad))
    out["full_struct_vcycle"] = slope(f_full, x_pad)

    for k, v in out.items():
        print(f"{k:28s} {v*1e3:8.4f} ms")
    known = 2 * out["fine_sweep_1"] + out["fine_residual"] + out["restrict_plus_prolong"] + out["coarse_vcycle_all_levels"]
    print(f"{'sum(fine+transfers+coarse)':28s} {known*1e3:8.4f} ms vs full {out['full_struct_vcycle']*1e3:.4f} ms")
    print(json.dumps({k: v * 1e3 for k, v in out.items()}))


if __name__ == "__main__":
    main()
