"""Run all five BASELINE.json benchmark configurations and emit one JSON
record per line.  Honest timing: device-side scalar fence + minimum over
repeats (see utils.profiling / the axon notes in ops/kernels.py).

    python benchmarks/run_all.py [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable from any cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fence_timer(fn, fence, repeats):
    fence(fn())                           # compile/warm, fully drained
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqp_for_mpc_tpu import SolverConfig, dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.models import (MPCSpec, MPCController, condense,
                                        random_stable, double_integrator)
    from pqp_for_mpc_tpu.solver import solve_batched
    from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if on_tpu:
        from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
        solver = solve_fused
    else:
        solver = solve_batched
    fsum = jax.jit(lambda u: jnp.sum(u))
    fence = lambda res: float(fsum(res.U))
    emit = lambda **kw: print(json.dumps(dict(platform=platform, **kw)))

    data = load_example_dir("/root/reference/example")
    Qp = jnp.linalg.inv(data.Qp_inv)
    rng = np.random.default_rng(0)

    # ---- config 1: single example QP to convergence (parity + fast) ----
    primal1 = data.assemble(Qp=Qp)
    for tag, cfg in [
        ("parity", SolverConfig(max_iters=5000, check_every=1)),
        ("fast", SolverConfig(max_iters=5000, check_every=4,
                              accel_every=4, y0=1.0)),
    ]:
        dual = dualize(primal1)
        res = solve_batched(primal1, dual, cfg=cfg)
        dt = _fence_timer(lambda: solve_batched(primal1, dual, cfg=cfg),
                          fence, args.repeats)
        emit(config=1, mode=tag, iters=int(np.asarray(res.iters)[0]),
             converged=bool(np.asarray(res.converged).all()),
             seconds=round(dt, 5))

    # ---- config 2: example QP, batch 1024 initial states, 1 chip ----
    B = 1024
    x = np.asarray(data.x, np.float32)[:, None] + rng.normal(
        0, 0.5, (29, B)).astype(np.float32)
    primal2 = data.assemble(x=jnp.asarray(x), Qp=Qp)
    dual2 = dualize(primal2)
    cfg2 = SolverConfig(max_iters=5000, check_every=8)
    res = solver(primal2, dual2, cfg=cfg2)
    dt = _fence_timer(lambda: solver(primal2, dual2, cfg=cfg2),
                      fence, args.repeats)
    emit(config=2, batch=B, seconds=round(dt, 5),
         solves_per_s=round(B / dt, 1),
         converged=int(np.asarray(res.converged).sum()))

    # ---- config 3: horizon-50, 12-state/4-input condensed MPC ----
    plant = random_stable(12, 4, seed=7)
    spec3 = MPCSpec(
        plant=plant, horizon=50,
        Qy=np.eye(plant.n_output, dtype=np.float32),
        R=0.1 * np.eye(4, dtype=np.float32),
        r=np.zeros(plant.n_output, np.float32),
        u_min=-2 * np.ones(4, np.float32), u_max=2 * np.ones(4, np.float32),
        du_max=np.ones(4, np.float32))
    d3 = condense(spec3)
    B3 = 256
    x3 = rng.uniform(-0.5, 0.5, (12, B3)).astype(np.float32)
    primal3 = d3.assemble(x=jnp.asarray(x3), Qp=jnp.linalg.inv(d3.Qp_inv))
    cfg3 = SolverConfig(erc=1e-4, eac=1e-4, eaj=1e-3, erj=1e-3, y0=0.01,
                        check_every=8, accel_every=4,
                        strict_weak_duality=False, max_iters=50_000)
    dual3 = dualize(primal3, theta_floor=cfg3.theta_floor)
    res = solve_batched(primal3, dual3, cfg=cfg3)
    dt = _fence_timer(lambda: solve_batched(primal3, dual3, cfg=cfg3),
                      fence, args.repeats)
    emit(config=3, M=d3.n_var, N=d3.n_con, batch=B3, seconds=round(dt, 5),
         solves_per_s=round(B3 / dt, 1),
         iters_mean=round(float(np.asarray(res.iters).mean()), 1),
         converged=int(np.asarray(res.converged).sum()))

    # ---- config 4: 1000-step warm-started receding-horizon rollout ----
    spec4 = MPCSpec(
        plant=double_integrator(), horizon=16,
        Qy=np.eye(1, dtype=np.float32), R=0.05 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32), u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32))
    ctrl = MPCController(spec4)
    ctrl.rollout_jit(np.array([2.0, 0.0], np.float32), steps=1000)  # compile
    t0 = time.perf_counter()
    out = ctrl.rollout_jit(np.array([2.0, 0.0], np.float32), steps=1000)
    dt = time.perf_counter() - t0
    emit(config=4, steps=1000, seconds=round(dt, 3),
         steps_per_s=round(1000 / dt, 1),
         converged=bool(out["converged"].all()),
         final_state_norm=round(float(np.linalg.norm(out["x"][-1])), 5))

    # ---- config 5: 65k-scenario batch (single chip; multi-host via
    #      parallel/distributed on a pod) ----
    B5 = 65536
    x5 = np.asarray(data.x, np.float32)[:, None] + rng.normal(
        0, 0.5, (29, B5)).astype(np.float32)
    primal5 = data.assemble(x=jnp.asarray(x5), Qp=Qp)
    dual5 = dualize(primal5)
    res = solver(primal5, dual5, cfg=cfg2)
    dt = _fence_timer(lambda: solver(primal5, dual5, cfg=cfg2),
                      fence, args.repeats)
    emit(config=5, batch=B5, seconds=round(dt, 5),
         solves_per_s=round(B5 / dt, 1),
         converged=int(np.asarray(res.converged).sum()))


if __name__ == "__main__":
    main()
