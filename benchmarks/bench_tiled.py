"""Hardware bench: HBM-tiled update kernel vs the XLA path at large N.

Beyond VMEM residency (N > ~1800) every PQP iteration must stream the
dual Hessian from HBM.  The XLA path streams BOTH materialized splits
(2·N²·4 bytes/iter); the tiled Pallas kernel streams the single combined
``Qd + diag(θ)`` and reconstructs the splits on the VPU (N²·4 bytes/iter)
— see ops/tiled_kernel.py.  This bench measures both at fixed iteration
count (the reference's N=1000/M=500/100-iter harness methodology,
testing/CPU version/PQP_CPU_test.c:717,984 — extended to N=4096, 2.7x
the reference's largest fixture testing/sample test/test1.txt N=1500).

Run on a real TPU: ``python benchmarks/bench_tiled.py [--n 4096]``.
Emits one JSON line per config.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_dual(N, M, seed=0, B=256):
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.normal(0, 1, (N, M)).astype(np.float32)
    Fp = rng.normal(0, 10, (M, B)).astype(np.float32)
    Kp = rng.uniform(1, 10, (N,)).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp),
                      Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
                      Fp=jnp.asarray(Fp), Mp=jnp.zeros((B,), jnp.float32),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return jax.block_until_ready(dualize(primal))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pqp_for_mpc_tpu.ops.tiled_kernel import (fused_pqp_iterations_tiled,
                                                  pick_tiled_blocks)
    from pqp_for_mpc_tpu.solver import _as2d, pqp_update

    N, M, B, T = args.n, args.m, args.b, args.iters
    dev = jax.devices()[0]
    dual = build_dual(N, M, B=B)
    Y0 = jnp.full((N, B), 1000.0, jnp.float32)
    Fdn = jnp.broadcast_to(_as2d(dual.Fdn), (N, B))
    Fdp = jnp.broadcast_to(_as2d(dual.Fdp), (N, B))

    prec = (lax.Precision.HIGHEST if args.precision == "highest" else None)

    @jax.jit
    def xla_path(Y):
        return lax.fori_loop(0, T, lambda _, y: pqp_update(dual, y, prec), Y)

    tiled = lambda Y: fused_pqp_iterations_tiled(
        dual.Qd, dual.theta, Fdn, Fdp, Y, num_iters=T,
        precision=args.precision)

    # correctness first: 100-iteration trajectories must agree
    yx = jax.block_until_ready(xla_path(Y0))
    yt = jax.block_until_ready(tiled(Y0))
    err = float(jnp.max(jnp.abs(yx - yt) / (jnp.abs(yx) + 1e-6)))

    def bench(fn):
        jax.block_until_ready(fn(Y0))          # warm/compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(Y0))
            best = min(best, time.perf_counter() - t0)
        return best

    t_xla = bench(xla_path)
    t_tiled = bench(tiled)
    bn, bb = pick_tiled_blocks(N, B)
    flops = 4.0 * N * N * B * T
    out = {
        "bench": "tiled_large_n_update",
        "device": str(dev), "N": N, "M": M, "B": B, "iters": T,
        "precision": args.precision, "block_n": bn, "block_b": bb,
        "max_rel_err_vs_xla": err,
        "xla_s": round(t_xla, 4), "tiled_s": round(t_tiled, 4),
        "speedup": round(t_xla / t_tiled, 3),
        "tiled_tflops": round(flops / t_tiled / 1e12, 3),
        "xla_tflops": round(flops / t_xla / 1e12, 3),
        "tiled_hbm_gbps": round(N * N * 4.0 * T / t_tiled / 1e9, 1),
        "xla_hbm_gbps": round(2 * N * N * 4.0 * T / t_xla / 1e9, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
