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


def make_instances(B, M, N, seed=0, gaussian_gp=False):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    # well-conditioned SPD Qp per instance (the reference generator's
    # diagonal Qp is a special case; dense is the harder workload)
    L = rng.standard_normal((B, M, M)).astype(np.float32) / np.sqrt(M)
    Qp = np.einsum("bij,bkj->bik", L, L) + 2.0 * np.eye(M, dtype=np.float32)
    if gaussian_gp:
        # the large-N streamed workload: {-1,0,1} Gp rowsums at N=4096
        # drive theta ~10x up and the accel-free multiplicative update
        # needs >80k iterations (measured); gaussian Gp with a strongly
        # regularized Qp (bench_tiled_solve's family) converges in ~19k
        Qp = Qp + (M - 2.0) * np.eye(M, dtype=np.float32)
        Qp_inv = np.linalg.inv(Qp).astype(np.float32)
        Gp = rng.standard_normal((B, N, M)).astype(np.float32)
        Fp = (rng.standard_normal((M, B)) * 3).astype(np.float32)
        Mp = np.zeros(B, np.float32)
        Kp = rng.uniform(1.0, 10.0, (N, B)).astype(np.float32)
        return PrimalQP(Qp=jnp.asarray(Qp), Qp_inv=jnp.asarray(Qp_inv),
                        Fp=jnp.asarray(Fp), Mp=jnp.asarray(Mp),
                        Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
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

    args = [a for a in sys.argv[1:] if a != "--streamed"]
    streamed = "--streamed" in sys.argv[1:]
    B = int(args[0]) if len(args) > 0 else (8 if streamed else 1024)
    N = int(args[1]) if len(args) > 1 else (4096 if streamed else 400)
    M = int(args[2]) if len(args) > 2 else (1024 if streamed else 100)

    primal = make_instances(B, M, N, gaussian_gp=streamed)
    # feasibility slack is the binding tolerance on this workload: the
    # reference's 1e-6 absolute slack is below float32 dot-product noise
    # at N=400 / Kp~1..8, so every lane spins forever; 1e-4 (MPC_CONFIG
    # scale) converges 100% in a few hundred iterations
    cfg = SolverConfig(max_iters=20_000, check_every=8, y0=1.0,
                       erc=1e-4, eac=1e-4, eaj=1e-3, erj=1e-4,
                       strict_weak_duality=False)
    if streamed:
        # beyond the VMEM-resident budget: the streamed kernel takes the
        # UNSPLIT dual; the einsum comparator still needs the splits
        from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import \
            solve_fused_distinct_tiled
        import dataclasses as _dc
        # N=4096 with {-1,0,1} Gp: theta ~ rowsum(Qd^-) scales ~10x the
        # N=400 workload's, so convergence needs ~40k multiplicative
        # iterations and f32 feasibility floors near 1e-3 at Kp ~ 1..8
        # max_iters capped so one launch stays under the tunnel
        # watchdog (~60 s launches crash the worker); erc=1e-3 sits
        # above the f32 feasibility floor at this size (1e-4 does not)
        # reference-grade 1e-6 tolerances; max_iters capped so one
        # launch stays under the tunnel watchdog (~60 s launches crash
        # the worker) — the chained warm starts below cover the tail
        # accel at the check cadence (in-kernel since round 3) cuts
        # this workload's iterations ~20x on both paths
        cfg = _dc.replace(cfg, accel_every=16, check_every=16,
                          gap_from_complementarity=True,
                          erc=1e-6, eac=1e-6, eaj=1e-6, erj=1e-6,
                          y0=1000.0, max_iters=20_000)
        dual = dualize_distinct(primal, theta_floor=cfg.theta_floor,
                                materialize_splits=False)
        dual_full = dualize_distinct(primal, theta_floor=cfg.theta_floor)
    else:
        dual = dual_full = dualize_distinct(primal,
                                            theta_floor=cfg.theta_floor)
    fence = jax.jit(lambda u: jnp.sum(u))

    reps = 1 if streamed else 3   # streamed runs chain ~1 min of launches
    def timed(fn):
        res = fn()                      # compile + warm-up
        float(fence(res.U))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            float(fence(r.U))
            times.append(time.perf_counter() - t0)
        return res, min(times)

    on_tpu = jax.devices()[0].platform == "tpu"
    kern = solve_fused_distinct_tiled if streamed else solve_fused_distinct
    interp = {} if on_tpu else {"interpret": True}

    if streamed:
        # these instances converge in ~40-60k iterations, but a single
        # 60k-iteration launch (~60-90 s) trips the tunnel watchdog, so
        # both paths CHAIN warm-started launches of max_iters each until
        # every instance certifies — identical work on both paths, and
        # it exercises the warm-start path on hardware
        def chained(solve):
            def run():
                class R:  # accumulate iters across chained launches
                    pass
                res = solve(None)
                total = np.asarray(res.iters).astype(np.int64)
                for _ in range(3):
                    if bool(np.asarray(res.converged).all()):
                        break
                    prev = np.asarray(res.converged)
                    res = solve(res.Y)
                    total = total + np.where(
                        prev, 0, np.asarray(res.iters))
                out = R()
                out.U, out.Y, out.converged = res.U, res.Y, res.converged
                out.iters = total
                return out
            return run

        res_e, dt_e = timed(chained(
            lambda y0: solve_batched(primal, dual_full, Y0=y0, cfg=cfg)))
        res_k, dt_k = timed(chained(
            lambda y0: kern(primal, dual, Y0=y0, cfg=cfg, **interp)))
    else:
        res_e, dt_e = timed(
            lambda: solve_batched(primal, dual_full, cfg=cfg))
        res_k, dt_k = timed(lambda: kern(primal, dual, cfg=cfg, **interp))

    it_e = np.asarray(res_e.iters)
    it_k = np.asarray(res_k.iters)
    print(json.dumps({
        "metric": ("distinct_geometry_streamed_solves_per_s" if streamed
                   else "distinct_geometry_solves_per_s"),
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
