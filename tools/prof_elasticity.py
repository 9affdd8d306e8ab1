"""Per-phase budget of the elasticity DIA V(2,2)-JGS cycle at 157k dofs
(PERF_BUDGET.md section; fori-slope methodology of tools/prof_vcycle.py,
operands passed as jit ARGUMENTS — the 99-plane operators exceed the relay
backend's request-size limit as closure constants)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from amg_tpu.problems.elasticity import elasticity_beam
from amg_tpu.setup.structured import build_dia_structured_hierarchy
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType
from amg_tpu.solve.cycles import cycle_step, residual as res_fn
from amg_tpu.smooth.smoothers import smooth
from amg_tpu.setup.hierarchy import Hierarchy
from amg_tpu.solve.cycles import mult_vcycle

dtype = jnp.float32
nx, ny, nz = 144, 18, 18
prob = elasticity_beam(nx=nx, ny=ny, nz=nz, bc="identity")
_, hier = build_dia_structured_hierarchy(prob.A, (nx+1, ny+1, nz+1), num_functions=3, dtype=dtype, smoother=SmootherType.HYBRID_JGS)
cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.HYBRID_JGS, num_pre_sweeps=2, num_post_sweeps=2)
b = jnp.asarray(np.asarray(prob.rhs)/np.linalg.norm(prob.rhs), dtype)

def slope(f, op, x0, k0=5, k1=55, reps=2):
    # operands as jit ARGS (closure constants exceed the relay's request
    # size limit for the 99-plane operators)
    loop = jax.jit(lambda o, u, k: jax.lax.fori_loop(0, k, lambda _, v: f(o, v), u))
    def run(k):
        t0=time.perf_counter(); out=loop(op, x0, jnp.asarray(k, jnp.int32)); float(jnp.sum(jax.tree_util.tree_leaves(out)[0])); return time.perf_counter()-t0
    run(k0)
    ta=min(run(k0) for _ in range(reps)); tb=min(run(k1) for _ in range(reps))
    return max(tb-ta,1e-12)/(k1-k0)

lv0 = hier.levels[0]
t_sm = slope(lambda o, u: smooth(o[0].A, o[0].sm, cfg.smoother, u, o[1], num_sweeps=1, zero_guess=False), (lv0, b), b)
print(f"fine JGS sweep: {t_sm*1e3:.4f} ms (x4={4*t_sm*1e3:.3f})", flush=True)
t_res = slope(lambda o, u: res_fn(o[0].A, u, o[1]), (lv0, b), b)
print(f"fine residual : {t_res*1e3:.4f} ms", flush=True)
rc = lv0.R @ b
t_rp = slope(lambda o, u: o[0].P @ (o[0].R @ u), (lv0,), b)
print(f"R then P      : {t_rp*1e3:.4f} ms", flush=True)
sub = Hierarchy(levels=hier.levels[1:], coarse_Ainv=hier.coarse_Ainv)
t_co = slope(lambda o, r: mult_vcycle(o[0], cfg, jnp.zeros_like(r), r), (sub,), rc)
print(f"coarse V-chain: {t_co*1e3:.4f} ms", flush=True)
t_cyc = slope(lambda o, u: cycle_step(o[0], cfg, u, o[1]), (hier, b), b)
print(f"full cycle    : {t_cyc*1e3:.4f} ms", flush=True)
