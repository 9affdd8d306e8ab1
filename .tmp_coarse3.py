import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from amg_tpu.problems import laplacian_3d_27pt
from amg_tpu.setup.structured import build_structured_hierarchy, DiaKernelOperator, VarStencilOperator
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType
from amg_tpu.setup.hierarchy import Hierarchy
from amg_tpu.solve.struct_cycle import struct_timed_cycles
import amg_tpu.ops.pallas_stencil as ps

dtype = jnp.float32
prob = laplacian_3d_27pt(126)
cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.random(prob.n), dtype)
_, hier0 = build_structured_hierarchy(prob.stencil, smoother=SmootherType.L1_JACOBI, dtype=dtype)
levels = [hier0.levels[0]]
for lv in hier0.levels[1:]:
    A = lv.A
    if isinstance(A, VarStencilOperator):
        A = DiaKernelOperator.try_from_var_stencil(A) or A
    levels.append(lv._replace(A=A))
hier1 = Hierarchy(levels=tuple(levels), coarse_Ainv=hier0.coarse_Ainv)

def vcycle_ms(h):
    k0, k1 = 10, 210
    def run_fixed(k):
        out = struct_timed_cycles(h, cfg, b, k)
        float(jnp.sum(out))
    run_fixed(k0); run_fixed(k1)
    def best(k, reps=3):
        t = 1e9
        for _ in range(reps):
            t0 = time.perf_counter(); run_fixed(k); t = min(t, time.perf_counter()-t0)
        return t
    return (best(k1)-best(k0))/(k1-k0)*1e3

for trial in range(3):
    print(f"trial {trial}: base={vcycle_ms(hier0):.4f} ms  diawrap={vcycle_ms(hier1):.4f} ms", flush=True)
