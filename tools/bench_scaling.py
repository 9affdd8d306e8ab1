import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    # virtual CPU mesh requested: sitecustomize force-sets jax_platforms to
    # "axon,cpu", so re-override AFTER importing jax (same trick as
    # tests/conftest.py)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
"""Weak-scaling harness: nnz/s for the distributed V-cycle at 1..N devices.

Run on a TPU slice (or the virtual CPU mesh for plumbing checks):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/bench_scaling.py --devices 1 2 4 8 --base-n 24

Weak scaling: the per-device problem size is constant (n^3 rows per device,
grown along z), reporting nnz/s and parallel efficiency vs 1 device
(BASELINE.md target: >= 70% at N >= 2 hosts).
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--base-n", type=int, default=24)
    ap.add_argument("--cycles", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from amg_tpu.parallel import make_row_mesh
    from amg_tpu.parallel.dist import build_dist_hierarchy, pad_vector
    from amg_tpu.problems import laplacian_3d_27pt
    from amg_tpu.setup.hierarchy import HierarchyParams, build_host_hierarchy
    from amg_tpu.smooth import SmootherType
    from amg_tpu.solve import CycleConfig, CycleType
    from amg_tpu.solve.cycles import mult_vcycle

    results = []
    base = None
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"# skipping {nd} devices (have {len(jax.devices())})")
            continue
        n = args.base_n
        prob = laplacian_3d_27pt(n, n, n * nd)  # grow along z per device
        params = HierarchyParams(
            smoother=SmootherType.L1_JACOBI, keep_stencil_fine=False
        )
        hh = build_host_hierarchy(prob.A, params)
        mesh = make_row_mesh(nd)
        hier, pad_info = build_dist_hierarchy(hh, params, mesh)
        b = pad_vector(
            jnp.asarray(np.random.default_rng(0).random(prob.n)), pad_info, mesh
        )
        cfg = CycleConfig(cycle=CycleType.MULT, smoother=SmootherType.L1_JACOBI)
        vc = jax.jit(lambda h, x, b: mult_vcycle(h, cfg, x, b))
        x = jnp.zeros_like(b)
        z = vc(hier, x, b)
        jax.block_until_ready(z)
        # marginal cost over chained cycles
        def run(k):
            zz = x
            t0 = time.perf_counter()
            for _ in range(k):
                zz = vc(hier, zz, b)
            jax.block_until_ready(zz)
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(2))
        tk = min(run(args.cycles + 1) for _ in range(2))
        per = (tk - t1) / args.cycles
        nnz = sum(hh.stats()["nnz"])
        rate = nnz / per
        if base is None:
            base = rate / nd if nd else rate
            base = rate / nd
        eff = rate / (nd * base)
        results.append(
            {"devices": nd, "rows": prob.n, "nnz_per_s": rate,
             "ms_per_cycle": per * 1e3, "weak_efficiency": eff}
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
