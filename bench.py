"""Headline benchmark: example-sized QP solves/s on one chip.

BASELINE config 2: the reference ``example/`` MPC problem, a batch of
initial states solved to full convergence (reference tolerances 1e-6,
reference cold start Y0=1000 so the per-solve iteration workload matches
the reference's ~313 iterations).  North-star: >= 1000 solves/s/chip
(BASELINE.json); ``vs_baseline`` is measured solves/s divided by that.

Prints ONE JSON line:
  {"metric": "example_qp_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N/1000}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.ops.kernels import fits_vmem
    from pqp_for_mpc_tpu.solver import solve_batched

    on_tpu = jax.devices()[0].platform == "tpu"
    # Large batch amortizes the ~26 ms tunnel round-trip (measured r2:
    # 262k -> 4.82M, 1M -> 7.19M, 2M -> 7.99M, 4M -> 8.41M solves/s).
    # Round 5 re-swept the kernel's batch block on the current design
    # (ops/solve_kernel.MAX_SOLVE_BLOCK_B: 1024 -> 16384, monotone
    # 8.71M -> 11.67M across the sweep) and the batch (8.4M amortizes
    # the fixed cost further): 11.62M solves/s official, mean 313
    # iters, 100% converged (DESIGN.md §3 roofline note).
    # CPU (no whole-solve kernel) keeps the smaller batch.
    B = 8388608 if on_tpu else 262144
    data = load_example_dir("/root/reference/example")
    rng = np.random.default_rng(0)
    x = np.asarray(data.x, np.float32)[:, None] + rng.normal(
        0, 0.5, (data.x.shape[0], B)).astype(np.float32)
    primal = data.assemble(x=jnp.asarray(x), Qp=jnp.linalg.inv(data.Qp_inv))

    cfg = SolverConfig(max_iters=5000, check_every=8, y0=1000.0,
                       use_pallas=on_tpu and fits_vmem(28),
                       precision="default" if on_tpu else "highest")
    dual = dualize(primal, theta_floor=cfg.theta_floor)

    # Scalar fence: block_until_ready on a tunneled device is not a true
    # completion barrier, and reading the whole U panel back would time
    # the tunnel's D2H bandwidth instead of the solve; a device-side
    # reduction with a 4-byte readback is the honest fence.
    fence = jax.jit(lambda u: jnp.sum(u))

    if on_tpu:
        # whole-solve Pallas kernel: updates + checks + early exit in one
        # launch per batch block
        from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused

        def run():
            res = solve_fused(primal, dual, cfg=cfg)
            float(fence(res.U))
            return res
    else:
        def run():
            res = solve_batched(primal, dual, cfg=cfg)
            float(fence(res.U))
            return res

    res = run()                      # compile + warm-up
    conv = float(np.asarray(res.converged).mean())
    iters = float(np.asarray(res.iters).mean())

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    solves_per_s = B / dt

    print(json.dumps({
        "metric": "example_qp_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
        "batch": B,
        "mean_iters": round(iters, 1),
        "converged_frac": round(conv, 4),
        "seconds_per_batch": round(dt, 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
