import time
import numpy as np, jax, jax.numpy as jnp
from amg_tpu.parallel import make_row_mesh
from amg_tpu.parallel.dist import shard_structured_hierarchy
from amg_tpu.problems import laplacian_3d_27pt
from amg_tpu.setup.structured import build_structured_hierarchy
from amg_tpu.smooth import SmootherType
from amg_tpu.solve import CycleConfig, CycleType, solve
mesh = make_row_mesh(8)
prob = laplacian_3d_27pt(102)
_, hier = build_structured_hierarchy(prob.stencil, smoother=SmootherType.L1_JACOBI)
hier = shard_structured_hierarchy(hier, mesh)
cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
b = jnp.asarray(np.random.default_rng(0).random(prob.n))
res = solve(hier, cfg, b, tol=1e-8, max_cycles=40)
print("struct_27pt (const-coarse):", int(res.iters), float(res.rel_resnorm))
