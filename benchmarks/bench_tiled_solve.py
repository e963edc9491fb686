"""Hardware bench: single-launch HBM-tiled WHOLE solve vs the XLA
orchestration at N=4096 (VERDICT r2 task 5).

Round 2's large-N structure ran the tiled UPDATE kernel inside an XLA
``while_loop`` whose check phases were XLA relaunches re-reading Qd and
Gp from HBM; ``ops/tiled_solve_kernel.py`` moves the whole
convergence-checked solve (checks, early exit, primal recovery) into
ONE launch with hand-streamed slabs.  This bench runs full convergence
at N=4096/M=1024 (2.7× the reference's largest fixture,
``testing/sample test/test1.txt`` N=1500) and compares:

* ``xla``         — solve_batched, pure XLA (2 splits streamed/update);
* ``xla+tiledup`` — solve_batched(use_pallas=True): tiled update kernel
                    between XLA check phases (round 2's best);
* ``tiled_solve`` — the single-launch whole solve.

Timing uses a device-side scalar fence (``float(jnp.sum(U))``) — over
the tunneled chip ``block_until_ready`` returns before execution
completes.  Certification runs in the production complementarity mode
(the explicit-gap mode's razor-edge verdicts make converged-set
comparisons noisy; see benchmarks/CONFORMANCE_r3.json).

Run: ``python benchmarks/bench_tiled_solve.py [--n 4096]``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build(N, M, B, seed=0):
    import jax
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
    return primal, jax.block_until_ready(dualize(primal))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--max-iters", type=int, default=20000)
    ap.add_argument("--check-every", type=int, default=16)
    ap.add_argument("--accel", action="store_true",
                    help="accel_every = check_every on BOTH paths")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.tiled_solve_kernel import solve_fused_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    fence = jax.jit(lambda u: jnp.sum(u))
    dev = str(jax.devices()[0])
    N, M, B = args.n, args.m, args.b
    primal, dual = build(N, M, B)
    k = args.check_every
    ae = k if args.accel else 0
    cfg = SolverConfig(max_iters=args.max_iters, check_every=k,
                       accel_every=ae, strict_weak_duality=False,
                       gap_from_complementarity=True)
    cfg_up = SolverConfig(max_iters=args.max_iters, check_every=k,
                          accel_every=ae, strict_weak_duality=False,
                          gap_from_complementarity=True, use_pallas=True)

    paths = {
        "xla": lambda: solve_batched(primal, dual, cfg=cfg),
        "xla+tiledup": lambda: solve_batched(primal, dual, cfg=cfg_up),
        "tiled_solve": lambda: solve_fused_tiled(primal, dual, cfg=cfg),
    }
    results = {}
    times = {}
    for name, fn in paths.items():
        r = fn()
        float(fence(r.U))                     # compile + first run
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn()
            float(fence(r.U))                 # scalar fence
            best = min(best, time.perf_counter() - t0)
        results[name] = r
        times[name] = best

    rx = results["xla"]
    row = {"bench": "tiled_whole_solve", "device": dev,
           "N": N, "M": M, "B": B, "max_iters": args.max_iters,
           "check_every": args.check_every, "accel": args.accel,
           "mode": "complementarity"}
    for name in paths:
        r = results[name]
        row[f"{name}_s"] = round(times[name], 4)
        row[f"{name}_converged"] = int(np.asarray(r.converged).sum())
        row[f"{name}_iters_mean"] = round(
            float(np.asarray(r.iters).mean()), 1)
    both = np.asarray(results["tiled_solve"].converged) \
        & np.asarray(rx.converged)
    row["max_dU_vs_xla"] = float(np.max(
        np.abs(np.asarray(results["tiled_solve"].U)
               - np.asarray(rx.U))[:, both], initial=0.0))
    row["speedup_vs_xla"] = round(times["xla"] / times["tiled_solve"], 2)
    row["speedup_vs_tiledup"] = round(
        times["xla+tiledup"] / times["tiled_solve"], 2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
