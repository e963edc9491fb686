"""Mixed-precision solve in the VMEM-RESIDENT regime (N <= ~1800).

Round 4 established `solver.solve_mixed` as the fastest large-N path
(N >= 4096, where Qd streams from HBM — MIXED_BENCH_r4.json).  This
sweep asks the routing question for the RESIDENT regime the round-2/3
whole-solve kernels own: does the bf16 bulk phase also win when the
splits fit VMEM?  Answer (committed as MIXED_RESIDENT_r4.json): yes —
the resident matvec is MXU-bound and bf16 doubles MXU throughput, so
mixed XLA beats BOTH the f32 XLA path and the f32 whole-solve kernel
at N >= 512 (measured 2.5-2.7x at N=1024), at ~5% more iterations,
with identical certification (the f32 check on the true problem).

Run: ``python benchmarks/bench_mixed_resident.py [--sizes 512,1024]``
One JSON line per size, appended to stdout; commit the output file.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024,1536")
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--max-iters", type=int, default=20000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from conformance import build
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched, solve_mixed
    from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    dev = str(jax.devices()[0])
    fence = jax.jit(lambda u: jnp.sum(u))

    def timed(f, p, d):
        r = f(p, d)
        float(fence(r.U))
        t0 = time.perf_counter()
        r = f(p, d)
        float(fence(r.U))
        return time.perf_counter() - t0, r

    for N in [int(s) for s in args.sizes.split(",")]:
        M = max(8, N // 3)
        primal, dual = build(N, M, args.b, seed=N)
        cfg = SolverConfig(max_iters=args.max_iters, check_every=16,
                           strict_weak_duality=False,
                           gap_from_complementarity=True)
        cfg_k = dataclasses.replace(cfg, use_pallas=True)
        t_x, rx = timed(jax.jit(lambda p, d: solve_batched(p, d, cfg=cfg)),
                        primal, dual)
        try:
            t_f, rf = timed(
                jax.jit(lambda p, d: solve_fused(p, d, cfg=cfg_k)),
                primal, dual)
        except ValueError:
            t_f, rf = None, None     # past the resident VMEM budget
        t_m, rm = timed(jax.jit(lambda p, d: solve_mixed(p, d, cfg=cfg)),
                        primal, dual)
        row = {
            "bench": "mixed_resident", "device": dev, "N": N, "M": M,
            "B": args.b, "check_every": 16, "mode": "complementarity",
            "f32_xla_s": round(t_x, 4),
            "f32_xla_conv": int(np.asarray(rx.converged).sum()),
            "f32_kernel_s": None if t_f is None else round(t_f, 4),
            "f32_kernel_conv": None if rf is None
            else int(np.asarray(rf.converged).sum()),
            "mixed_s": round(t_m, 4),
            "mixed_conv": int(np.asarray(rm.converged).sum()),
            "mixed_iters_frac": round(
                float(np.asarray(rm.iters).mean()
                      / np.asarray(rx.iters).mean()), 3),
            "speedup_vs_f32": round(t_x / t_m, 2),
            "speedup_vs_kernel": None if t_f is None
            else round(t_f / t_m, 2),
        }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
