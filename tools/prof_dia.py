"""Profile the DIA (generalized-diagonal) elasticity matvec vs BSR on TPU.

The operator must be a jit ARGUMENT, not a closure — closed-over device
arrays are embedded as HLO constants (the 99 coefficient planes would ship
as a multi-MB literal through the remote-compile path and stall the build).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from amg_tpu.problems.elasticity import elasticity_beam
from amg_tpu.setup.structured import csr_to_dia_stencil
from amg_tpu.sparse.bsr import bsr_from_csr, choose_bsr_shape


def marginal(fn, op, x0, k0=5, k1=55, reps=3):
    z = fn(op, x0)
    jax.block_until_ready(z)

    def chained(k):
        zz = x0
        t0 = time.perf_counter()
        for _ in range(k):
            zz = fn(op, zz)
        jax.block_until_ready(zz)
        return time.perf_counter() - t0

    t0 = min(chained(k0) for _ in range(reps))
    t1 = min(chained(k1) for _ in range(reps))
    return (t1 - t0) / (k1 - k0)


@jax.jit
def mv(op, v):
    return op @ v


def main():
    for dims in [(48, 12, 12), (192, 24, 24)]:
        prob = elasticity_beam(
            nx=dims[0], ny=dims[1], nz=dims[2], bc="identity"
        )
        vs = csr_to_dia_stencil(prob.A, prob.grid_shape, jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(0).random(prob.A.n_rows), jnp.float32
        )
        t = marginal(mv, vs, x)
        print(
            f"beam {dims}: n={prob.A.n_rows} nnz={prob.A.nnz} "
            f"offsets={len(vs.offsets)} dia {prob.A.nnz/t/1e9:.1f} Gnnz/s "
            f"({t*1e6:.1f} us)"
        )
        shape, _ = choose_bsr_shape(prob.A)
        bm, bn = shape if shape else (8, 8)
        B = bsr_from_csr(prob.A, bm=bm, bn=bn, dtype=jnp.float32)
        tb = marginal(mv, B, x)
        print(f"  bsr({bm},{bn}) {prob.A.nnz/tb/1e9:.1f} Gnnz/s ({tb*1e6:.1f} us)")


if __name__ == "__main__":
    main()
