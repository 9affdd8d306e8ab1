import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from amg_tpu.problems import laplacian_3d_27pt
from amg_tpu.setup.structured import build_structured_hierarchy, DiaKernelOperator, VarStencilOperator
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType
from amg_tpu.setup.hierarchy import Hierarchy
from amg_tpu.solve.cycles import mult_vcycle
from amg_tpu.solve.struct_cycle import make_struct_spec, pick_struct_slab, _restrict_padded, struct_vcycle, struct_solve
import amg_tpu.ops.pallas_stencil as ps

dtype = jnp.float32
prob = laplacian_3d_27pt(126)
cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)

def slope(f, x0, k0=5, k1=55, reps=2):
    loop = jax.jit(lambda u, k: jax.lax.fori_loop(0, k, lambda _, v: f(v), u))
    def run(k):
        t0 = time.perf_counter()
        out = loop(x0, k)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0
    run(k0)
    ta = min(run(k0) for _ in range(reps)); tb = min(run(k1) for _ in range(reps))
    return max(tb - ta, 1e-12) / (k1 - k0)

rng = np.random.default_rng(0)
b = jnp.asarray(rng.random(prob.n), dtype)
t0=time.time()
_, hier0 = build_structured_hierarchy(prob.stencil, smoother=SmootherType.L1_JACOBI, dtype=dtype)
print(f"hierarchy built {time.time()-t0:.0f}s", flush=True)

levels = [hier0.levels[0]]
for lv in hier0.levels[1:]:
    A = lv.A
    if isinstance(A, VarStencilOperator):
        A = DiaKernelOperator.try_from_var_stencil(A) or A
    levels.append(lv._replace(A=A))
hier1 = Hierarchy(levels=tuple(levels), coarse_Ainv=hier0.coarse_Ainv)
print("wrapped types:", [type(l.A).__name__ for l in hier1.levels], flush=True)

slab = pick_struct_slab(cfg, False)
spec = make_struct_spec(hier0, slab)
b_pad = ps.to_padded(b, prob.stencil.grid_shape, slab)
x_pad = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), prob.stencil.grid_shape, slab)
rc = _restrict_padded(spec, x_pad)
for name, h in (("base", hier0), ("diawrap", hier1)):
    sub = Hierarchy(levels=h.levels[1:], coarse_Ainv=h.coarse_Ainv)
    t_coarse = slope(jax.jit(lambda r, sub=sub: mult_vcycle(sub, cfg, jnp.zeros_like(r), r)), rc)
    t_full = slope(jax.jit(lambda u, h=h: struct_vcycle(h, cfg, spec, u, b_pad)), x_pad)
    res = struct_solve(h, cfg, b, tol=1e-5, max_cycles=40)
    print(f"{name}: coarse={t_coarse*1e3:.4f} ms full={t_full*1e3:.4f} ms cycles={int(res.iters)} rel={float(res.rel_resnorm):.2e}", flush=True)
