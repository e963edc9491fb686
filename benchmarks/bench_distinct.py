"""Distinct-geometry batch benchmark: one-launch Pallas kernel vs the
XLA einsum path.

Workload: B fully distinct instances (one random geometry each — the
shape of the reference's generator benchmark,
testing/test_generator.c:997-998) at M=100, N=400, solved to
convergence.  Both paths run identical trajectories (verified bit-equal
iteration counts at precision=highest), so wall-time is directly
comparable; the kernel additionally exits each instance early instead
of streaming every converged lane's matrices until the slowest lane
finishes.

Usage:  python benchmarks/bench_distinct.py [B] [N] [M]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_instances(B, M, N, seed=0):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    # well-conditioned SPD Qp per instance (the reference generator's
    # diagonal Qp is a special case; dense is the harder workload)
    L = rng.standard_normal((B, M, M)).astype(np.float32) / np.sqrt(M)
    Qp = np.einsum("bij,bkj->bik", L, L) + 2.0 * np.eye(M, dtype=np.float32)
    Qp_inv = np.linalg.inv(Qp).astype(np.float32)
    Gp = rng.integers(-1, 2, (B, N, M)).astype(np.float32)
    Fp = (rng.standard_normal((M, B)) * 3).astype(np.float32)
    Mp = rng.standard_normal(B).astype(np.float32)
    Kp = rng.uniform(1.0, 8.0, (N, B)).astype(np.float32)
    return PrimalQP(Qp=jnp.asarray(Qp), Qp_inv=jnp.asarray(Qp_inv),
                    Fp=jnp.asarray(Fp), Mp=jnp.asarray(Mp),
                    Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.dual import dualize_distinct
    from pqp_for_mpc_tpu.ops.distinct_kernel import solve_fused_distinct
    from pqp_for_mpc_tpu.solver import solve_batched

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    M = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    primal = make_instances(B, M, N)
    # feasibility slack is the binding tolerance on this workload: the
    # reference's 1e-6 absolute slack is below float32 dot-product noise
    # at N=400 / Kp~1..8, so every lane spins forever; 1e-4 (MPC_CONFIG
    # scale) converges 100% in a few hundred iterations
    cfg = SolverConfig(max_iters=20_000, check_every=8, y0=1.0,
                       erc=1e-4, eac=1e-4, eaj=1e-3, erj=1e-4,
                       strict_weak_duality=False)
    dual = dualize_distinct(primal, theta_floor=cfg.theta_floor)
    fence = jax.jit(lambda u: jnp.sum(u))

    def timed(fn):
        res = fn()                      # compile + warm-up
        float(fence(res.U))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn()
            float(fence(r.U))
            times.append(time.perf_counter() - t0)
        return res, min(times)

    res_e, dt_e = timed(lambda: solve_batched(primal, dual, cfg=cfg))
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        res_k, dt_k = timed(
            lambda: solve_fused_distinct(primal, dual, cfg=cfg))
    else:
        res_k, dt_k = timed(
            lambda: solve_fused_distinct(primal, dual, cfg=cfg,
                                         interpret=True))

    it_e = np.asarray(res_e.iters)
    it_k = np.asarray(res_k.iters)
    print(json.dumps({
        "metric": "distinct_geometry_solves_per_s",
        "value": round(B / dt_k, 1),
        "unit": "solves/s",
        "vs_baseline": round(dt_e / dt_k, 3),   # speedup over einsum path
        "batch": B, "N": N, "M": M,
        "einsum_s": round(dt_e, 4), "kernel_s": round(dt_k, 4),
        "einsum_iters_mean": round(float(it_e.mean()), 1),
        "kernel_iters_mean": round(float(it_k.mean()), 1),
        "iters_max": int(it_e.max()),
        "conv_einsum": round(float(np.asarray(res_e.converged).mean()), 4),
        "conv_kernel": round(float(np.asarray(res_k.converged).mean()), 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
