"""Mixed-precision solving of large constraint systems (solve_mixed).

The reference's largest fixture is N=1500 (testing/sample test/
test1.txt) and its GPU fusion ceiling is one update's two matvecs per
launch (PQP_Fusion.cu:772-846).  Beyond VMEM residency the solve is
HBM-bandwidth-bound, and this framework's fastest large-N path runs the
BULK of the iterations against a consistently-rounded bfloat16 copy of
the dual Hessian — half the bytes per sweep (a quarter through the bf16
streamed kernel, ``SolverConfig(use_pallas=True)``) — then refines and
CERTIFIES in float32 on the true problem.  Measured on one v5e chip at
N=4096/B=128: 7.34 s (f32) -> 1.79 s (mixed + bf16 kernel), identical
certified solutions (benchmarks/MIXED_BENCH_r4.json).

This example runs a small instance so it executes anywhere (the CPU
backend emulates bf16); point --n at 4096 on a TPU to see the real
effect, or run ``python benchmarks/bench_mixed.py``.

    python examples/large_n_mixed.py [--n 384] [--b 8]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import argparse
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu import SolverConfig, solve_batched, solve_mixed
from pqp_for_mpc_tpu.dual import dualize
from pqp_for_mpc_tpu.problem import PrimalQP


def build(N, M, B, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    primal = PrimalQP(
        Qp=jnp.asarray(Qp),
        Qp_inv=jnp.asarray(np.linalg.inv(Qp).astype(np.float32)),
        Fp=jnp.asarray(rng.normal(0, 3, (M, B)).astype(np.float32)),
        Mp=jnp.zeros((B,), jnp.float32),
        Gp=jnp.asarray(rng.normal(0, 1, (N, M)).astype(np.float32)),
        Kp=jnp.asarray(rng.uniform(1, 10, N).astype(np.float32)))
    # split-free geometry (round 5): this example only runs the XLA and
    # mixed engines, which never need the materialized Qd+-theta
    # matrices — skipping them halves the dual's memory at large N
    return primal, dualize(primal, materialize_splits=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=384)
    ap.add_argument("--b", type=int, default=8)
    args = ap.parse_args()
    N, M, B = args.n, args.n // 4, args.b

    primal, dual = build(N, M, B)
    cfg = SolverConfig(max_iters=30000, check_every=16, accel_every=16,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    fence = jax.jit(lambda u: jnp.sum(u))

    # ALWAYS jit solve_mixed and pass (primal, dual) as arguments —
    # closed over, the bf16 geometry re-materializes per call
    runs = {"f32      ": jax.jit(partial(solve_batched, cfg=cfg)),
            "mixed    ": jax.jit(partial(solve_mixed, cfg=cfg))}
    out = {}
    for name, fn in runs.items():
        r = fn(primal, dual)
        float(fence(r.U))                      # compile + warm-up
        t0 = time.perf_counter()
        r = fn(primal, dual)
        float(fence(r.U))                      # device-side fence
        out[name] = (time.perf_counter() - t0, r)
        print(f"{name}: {out[name][0]*1e3:8.1f} ms   "
              f"certified {int(np.asarray(r.converged).sum())}/{B}   "
              f"iters {float(np.asarray(r.iters).mean()):.0f}")

    (t32, r32), (tmx, rmx) = out.values()
    both = np.asarray(r32.converged) & np.asarray(rmx.converged)
    dU = float(np.abs(np.asarray(r32.U) - np.asarray(rmx.U))[:, both].max())
    print(f"speedup {t32/tmx:.2f}x   max |dU| {dU:.3g} "
          f"(certification is float32 on the TRUE problem either way)")
    assert bool(np.asarray(rmx.converged).all())
    assert dU < 1e-3


if __name__ == "__main__":
    main()
