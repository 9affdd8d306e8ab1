"""Benchmark: SpMV+smoother nnz/s per chip on the 3D 27-pt Laplacian.

The north-star metric of BASELINE.md: sustained nnz/s for the fused
SpMV+smoother kernel (one weighted-Jacobi sweep), using the Pallas fused
stencil kernel on TPU (amg_tpu/ops/pallas_stencil.py) and the XLA shifted-
slice path on CPU. vs_baseline reports the fraction of the HBM-bandwidth
roofline achieved (the reference publishes no numbers — BASELINE.json
"published": {} — so speed-of-light is the yardstick).

Timing is the marginal cost per sweep ((t[N1] - t[N0]) / (N1 - N0) over
chained dependent sweeps, result materialized) — immune to async-dispatch
and host-relay overhead artifacts.

Prints ONE JSON line. Set AMG_BENCH_SMOKE=1 for a tiny CPU smoke run.
"""

import json
import os
import time

import numpy as np


def _roofline_bytes_per_sweep(n_padded_bytes):
    # per sweep the kernel must stream u (read + halo overlap), b (read),
    # u_new (write): >= 3 passes over the padded state
    return 3 * n_padded_bytes


def main():
    import jax
    import jax.numpy as jnp

    from amg_tpu.problems import laplacian_3d_27pt

    smoke = os.environ.get("AMG_BENCH_SMOKE") == "1"
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    # 190: Y+2=192 is sublane-tight and X+2=192 packs the 256-lane rows at
    # 75% (vs 63% at 160) — the padded layout's bandwidth waste is the
    # denominator of the roofline fraction
    n_side = 16 if smoke else (190 if on_tpu else 48)

    prob = laplacian_3d_27pt(n_side)
    nnz = prob.stencil.nnz_exact()
    rng = np.random.default_rng(0)
    n = prob.n

    if on_tpu:
        import amg_tpu.ops.pallas_stencil as ps

        slab = 8
        gs = prob.stencil.grid_shape
        up = ps.to_padded(jnp.asarray(rng.random(n), dtype), gs, slab)
        bp = ps.to_padded(jnp.asarray(rng.random(n), dtype), gs, slab)
        weights = tuple(float(w) for w in np.asarray(prob.stencil.weights))
        alpha = float((2.0 / 3.0) / 26.0)
        offsets = prob.stencil.offsets

        def sweep(u):
            return ps.stencil_sweep_padded(
                u, bp, weights, gs, offsets, alpha, slab
            )

        state_bytes = int(np.prod(ps.padded_shape(gs, slab))) * up.dtype.itemsize
    else:
        from amg_tpu.sparse.stencil import StencilOperator

        A = StencilOperator(
            weights=jnp.asarray(np.asarray(prob.stencil.weights), dtype=dtype),
            offsets=prob.stencil.offsets,
            grid_shape=prob.stencil.grid_shape,
        )
        b = jnp.asarray(rng.random(n), dtype=dtype)
        inv_wdiag = (2.0 / 3.0) / A.diagonal()
        sweep_j = jax.jit(lambda u: u + inv_wdiag * (b - A @ u))
        sweep = sweep_j
        up = jnp.zeros(n, dtype=dtype)
        state_bytes = n * up.dtype.itemsize

    # warm + compile
    z = sweep(up)
    jax.block_until_ready(z)

    def chained(k):
        zz = up
        t0 = time.perf_counter()
        for _ in range(k):
            zz = sweep(zz)
        jax.block_until_ready(zz)
        float(jnp.sum(zz))
        return time.perf_counter() - t0

    k0, k1 = (1, 201) if smoke else (1, 301)
    reps = 1 if smoke else 5
    t0 = min(chained(k0) for _ in range(reps))
    t1 = min(chained(k1) for _ in range(reps))
    per_sweep = (t1 - t0) / (k1 - k0)
    if per_sweep <= 0:  # timing noise on tiny smoke problems
        per_sweep = t1 / k1
    nnz_per_s = nnz / per_sweep

    bw = {"cpu": 50e9}.get(backend, 819e9)  # v5e HBM ~819 GB/s
    roofline_nnz_per_s = nnz / (_roofline_bytes_per_sweep(state_bytes) / bw)
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
