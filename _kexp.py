import time, functools
import numpy as np
import jax, jax.numpy as jnp
import amg_tpu
import amg_tpu.ops.pallas_stencil as ps
from amg_tpu.problems import laplacian_3d_27pt

rng = np.random.default_rng(0)
dtype = jnp.float32
for n_side, slab in ((126, 8), (190, 8), (254, 4)):
    prob = laplacian_3d_27pt(n_side)
    gs = prob.stencil.grid_shape
    nnz = prob.stencil.nnz_exact()
    up = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), gs, slab)
    bp = ps.to_padded(jnp.asarray(rng.random(prob.n), dtype), gs, slab)
    weights = tuple(float(w) for w in np.asarray(prob.stencil.weights))
    alpha = float((2.0/3.0)/26.0)
    offsets = prob.stencil.offsets

    @functools.partial(jax.jit, static_argnames=("k",))
    def multi(u, k):
        def body(i, uu):
            return ps.stencil_sweep_padded(uu, bp, weights, gs, offsets, alpha, slab)
        return jax.lax.fori_loop(0, k, body, u)

    def t(k, reps=3):
        z = multi(up, k); jax.block_until_ready(z)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(multi(up, k))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = t(10), t(110)
    per = (t2 - t1) / 100
    state = int(np.prod(ps.padded_shape(gs, slab))) * 4
    print(f"n={n_side} slab={slab}: {per*1e6:.1f} us/sweep {nnz/per/1e9:.1f} Gnnz/s "
          f"BW={3*state/per/1e9:.0f} GB/s frac={(3*state/per)/819e9:.3f}", flush=True)
