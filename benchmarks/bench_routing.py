"""Routing validation: solve_auto must pick the measured-best engine.

For one config per regime in the committed artifacts (resident small-N,
resident large-N, streamed, distinct) this times solve_auto against
EVERY applicable manual engine on the real chip and records the ratio
``auto_s / best_manual_s`` — the VERDICT r4 item-2 bar is <= 1.05 on
every row (auto may also BEAT the best manual row: it forces the bf16
kernel flag the manual "mixed" row may omit).

Writes benchmarks/ROUTING_BENCH_r5.json via --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _shared_problem(N, M, B, seed=0):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.normal(0, 1, (N, M)).astype(np.float32)
    Fp = rng.normal(0, 3, (M, B)).astype(np.float32)
    Kp = rng.uniform(1, 10, (N,)).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp),
                      Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
                      Fp=jnp.asarray(Fp), Mp=jnp.zeros((B,), jnp.float32),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return primal, dualize(primal)


def _distinct_problem(N, M, B):
    from bench_distinct import make_instances
    from pqp_for_mpc_tpu.dual import dualize_distinct
    primal = make_instances(B, M, N, seed=0, gaussian_gp=True)
    return primal, dualize_distinct(primal, theta_floor=5.0)


def main():
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp

    from pqp_for_mpc_tpu import SolverConfig, route_solve, solve_auto
    from pqp_for_mpc_tpu.solver import solve_batched, solve_mixed

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    fence = jax.jit(lambda u: jnp.sum(u))

    def timed(fn, primal, dual, reps):
        r = fn(primal, dual)
        float(fence(r.U))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(primal, dual)
            float(fence(r.U))
            best = min(best, time.perf_counter() - t0)
        return best, int(np.asarray(r.converged).sum())

    cfg = SolverConfig(max_iters=20_000, check_every=16, accel_every=16,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    rows, ok_all = [], True
    configs = [
        # regime, problem builder, applicable manual engines
        ("resident_small", lambda: _shared_problem(256, 85, 128),
         ["xla", "fused", "mixed"]),
        ("resident_large", lambda: _shared_problem(1024, 341, 128),
         ["xla", "fused", "mixed"]),
        ("streamed", lambda: _shared_problem(4096, 1024, 128),
         ["xla", "mixed"]),
        ("distinct_streamed", lambda: _distinct_problem(2048, 512, 8),
         ["xla", "mixed", "fused_distinct_tiled"]),
    ]
    for regime, build_fn, engines in configs:
        primal, dual = build_fn()
        distinct = dual.Qd.ndim == 3
        N = dual.n_con
        B = dual.Qd.shape[0] if distinct else np.asarray(dual.Fd).shape[1]
        picked = route_solve(N, B, distinct, cfg,
                             m_dim=primal.Gp.shape[-1])
        times = {}
        conv = {}
        for eng in engines:
            fn = jax.jit(partial(solve_auto, cfg=cfg, engine=eng))
            try:
                times[eng], conv[eng] = timed(fn, primal, dual, args.reps)
            except Exception as e:  # engine inapplicable at this shape
                times[eng] = None
                conv[eng] = f"error: {str(e)[:80]}"
        auto_fn = jax.jit(partial(solve_auto, cfg=cfg))
        t_auto, c_auto = timed(auto_fn, primal, dual, args.reps)
        manual = {k: v for k, v in times.items() if v is not None}
        best_eng = min(manual, key=manual.get)
        ratio = t_auto / manual[best_eng]
        row = {"bench": "routing_validation", "regime": regime,
               "device": str(jax.devices()[0]),
               "N": N, "B": int(B), "distinct": distinct,
               "routed_engine": picked,
               "auto_s": round(t_auto, 4), "auto_converged": c_auto,
               "manual_s": {k: (round(v, 4) if v is not None else None)
                            for k, v in times.items()},
               "best_manual": best_eng,
               "auto_over_best": round(ratio, 3),
               "within_5pct": bool(ratio <= 1.05)}
        ok_all = ok_all and row["within_5pct"]
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print(f"wrote {args.out}")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
