"""Benchmark: SpMV+smoother nnz/s per chip on the 3D 27-pt Laplacian.

The north-star metric of BASELINE.md: sustained nnz/s for the fused
SpMV+smoother kernel (one weighted-Jacobi sweep = residual SpMV + scaled
update), on the stencil fast path. vs_baseline reports the fraction of the
HBM-bandwidth roofline achieved (the reference publishes no numbers —
BASELINE.json "published": {} — so speed-of-light is the yardstick).

Prints ONE JSON line. Runs on whatever backend jax selects (the real TPU
chip under the driver; set AMG_BENCH_SMOKE=1 for a tiny CPU smoke run).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amg_tpu.problems import laplacian_3d_27pt
    from amg_tpu.smooth import SmootherType, make_smoother_data, smooth

    smoke = os.environ.get("AMG_BENCH_SMOKE") == "1"
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    n_side = 16 if smoke else (160 if on_tpu else 48)

    prob = laplacian_3d_27pt(n_side)
    A = prob.stencil
    # dtype-cast the stencil weights
    from amg_tpu.sparse.stencil import StencilOperator

    A = StencilOperator(
        weights=jnp.asarray(np.asarray(A.weights), dtype=dtype),
        offsets=A.offsets,
        grid_shape=A.grid_shape,
    )
    n = A.n_rows
    nnz = A.nnz_exact()
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(n), dtype=dtype)
    diag = A.diagonal()
    inv_wdiag = (dtype(2.0) / dtype(3.0)) / diag

    @jax.jit
    def sweep(u, b):
        # fused SpMV + weighted-Jacobi update (the workhorse kernel,
        # reference: SMEM_SpGEMV src/SMEM_MatVec.cpp:123-259 +
        # Jacobi src/SMEM_Smooth.cpp:6-49)
        return u + inv_wdiag * (b - A @ u)

    u = jnp.zeros(n, dtype=dtype)
    # warmup + compile
    u = sweep(u, b)
    u.block_until_ready()

    iters = 3 if smoke else 50
    reps = 1 if smoke else 3
    best = float("inf")
    for _ in range(reps):
        uu = u
        t0 = time.perf_counter()
        for _ in range(iters):
            uu = sweep(uu, b)
        uu.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    nnz_per_s = nnz * iters / best

    # HBM roofline: per sweep the kernel streams u (read), b (read), u (write)
    # => 3 * n * sizeof(dtype) bytes minimum; nnz/s_roofline = nnz / t_roofline
    bw = {"tpu": 819e9, "axon": 819e9}.get(backend, 50e9)  # v5e HBM ~819 GB/s
    bytes_per_sweep = 3 * n * np.dtype(np.float32 if on_tpu else np.float64).itemsize
    roofline_nnz_per_s = nnz / (bytes_per_sweep / bw)
    print(
        json.dumps(
            {
                "metric": "spmv_smoother_nnz_per_s",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / roofline_nnz_per_s,
            }
        )
    )


if __name__ == "__main__":
    main()
