import time
import numpy as np
import jax, jax.numpy as jnp
import amg_tpu
import amg_tpu.ops.pallas_stencil as ps
from amg_tpu.problems import laplacian_3d_27pt

def bench(fn, up, k0=1, k1=101, reps=2):
    z = fn(up); jax.block_until_ready(z)
    def chained(k):
        zz = up
        t0 = time.perf_counter()
        for _ in range(k): zz = fn(zz)
        jax.block_until_ready(zz)
        return time.perf_counter() - t0
    t0 = min(chained(k0) for _ in range(reps))
    t1 = min(chained(k1) for _ in range(reps))
    return (t1-t0)/(k1-k0)

rng = np.random.default_rng(0)
dtype = jnp.float32
for n_side, slab in ((254, 4), (190, 4)):
    prob = laplacian_3d_27pt(n_side)
    gs = prob.stencil.grid_shape
    nnz = prob.stencil.nnz_exact()
    up = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), gs, slab)
    bp = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), gs, slab)
    weights = tuple(float(w) for w in np.asarray(prob.stencil.weights))
    alpha = float((2.0/3.0)/26.0)
    offsets = prob.stencil.offsets
    fn = lambda u: ps.stencil_sweep_padded(u, bp, weights, gs, offsets, alpha, slab)
    per = bench(fn, up)
    state = int(np.prod(ps.padded_shape(gs, slab))) * 4
    print(f"n={n_side} slab={slab} padded={ps.padded_shape(gs, slab)}: {per*1e6:.1f} us/sweep "
          f"{nnz/per/1e9:.1f} Gnnz/s BW={3*state/per/1e9:.0f} GB/s frac={(3*state/per)/819e9:.3f}", flush=True)
