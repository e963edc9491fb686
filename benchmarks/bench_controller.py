"""Closed-loop controller throughput: condensed vs stage-wise backend.

Receding-horizon rollouts (MPCController.rollout_jit — the whole loop,
solve included, in one lax.scan) on the double integrator across
horizons.  This is the end-to-end number an MPC user sees, and the
crossover evidence for the stage-wise backend: the condensed dual is
(4*H*nu)^2 dense, so its per-iteration cost grows O(H^2) while the
matrix-free path grows O(H log H) (pscan) with O(H) memory.

Each backend runs at ITS OWN float32 certification floor (see
``backend_config`` — since round 3 the stage-wise floors are 10-20x
tighter than the condensed path's).  At H=512 the condensed backend is
skipped by default: its (2048)^2 dual takes minutes to converge per
cold solve (the point of the stage-wise path).

Writes benchmarks/CONTROLLER_BENCH_r{round}.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def backend_config(H: int, backend: str):
    """Each backend runs at ITS OWN float32 certification floor.

    The stage-wise floors (config.stagewise_mpc_config) tightened 10-20x
    in round 3 thanks to the operator-consistent split recovery
    (stagewise.recover).  Round 5 ported the same telescoping identity
    to the condensed path (SolverConfig.feas_from_dual_gradient, on in
    MPC_CONFIG): the condensed rows now run MPC_CONFIG's erc=1e-4 floor
    at EVERY horizon — 40-51x tighter than the round-2-era slack
    ~4e-5*H they needed before (measured: H=128 went from 30% certified
    at 14k iters/step under the old program to 100% at 41 iters/step)."""
    import dataclasses
    from pqp_for_mpc_tpu.config import MPC_CONFIG, stagewise_mpc_config
    if backend == "stagewise":
        return stagewise_mpc_config(H)
    if H <= 32:
        return MPC_CONFIG
    return dataclasses.replace(MPC_CONFIG, max_iters=20_000)


def bench_backend(H: int, backend: str, steps: int) -> dict:
    from pqp_for_mpc_tpu.models import MPCController, MPCSpec
    from pqp_for_mpc_tpu.models import double_integrator

    spec = MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32))
    cfg = backend_config(H, backend)
    # Round 3: every horizon runs warm-shift + in-graph cold retry —
    # the single-call-site retry graph compiles at any horizon
    # (solver.retry_cold_solve) and the r3 fix bundle (banded-exact
    # split, momentum accel, operator-consistent recovery) certifies
    # H=512 fully at tolerances 10x tighter than round 2's.
    ctrl = MPCController(spec, cfg=cfg, backend=backend,
                         warm_start="shift", retry_cold=True)
    x0 = np.array([2.0, 0.0], np.float32)
    build_t0 = time.perf_counter()
    out = ctrl.rollout_jit(x0, steps=steps)      # compile + first run
    build_s = time.perf_counter() - build_t0
    t0 = time.perf_counter()
    out = ctrl.rollout_jit(x0, steps=steps)
    dt = time.perf_counter() - t0
    return {
        "horizon": H, "backend": backend, "steps": steps,
        "steps_per_s": round(steps / dt, 2),
        "wall_s": round(dt, 4),
        "compile_plus_first_run_s": round(build_s, 2),
        "iters_mean": round(float(out["iters"].mean()), 1),
        "converged_frac": round(float(out["converged"].mean()), 3),
        "final_state_norm": round(float(np.linalg.norm(out["x"][-1])), 4),
    }


def bench_robust_longhorizon(H: int, steps: int) -> dict:
    """Robust tube MPC at long horizon on the stage-wise backend
    (round 5: (H, ny) output-bound schedules went matrix-free): the
    worst-case admissible disturbance pushes UP every step and the
    ORIGINAL output bound must hold for the whole compiled rollout."""
    from pqp_for_mpc_tpu.config import stagewise_mpc_config
    from pqp_for_mpc_tpu.models import (MPCController, MPCSpec,
                                        double_integrator, robust_spec)

    w_box = np.array([0.005, 0.02])
    spec = MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.array([0.95], np.float32),
        u_min=np.array([-2.0], np.float32),
        u_max=np.array([2.0], np.float32),
        du_max=np.array([2.0], np.float32),
        y_max=np.array([1.0], np.float32))
    # margins also absorb the QP certification slack (robust_spec's
    # ``slack``): the loop rides the tightened bound and the solver
    # certifies feasibility only to eac, so without it the realized
    # peak lands at original_bound + O(eac) (measured +1.3e-4 at H=256)
    tight = robust_spec(spec, w_box,
                        slack=stagewise_mpc_config(H).eac)
    ctrl = MPCController(tight, backend="stagewise",
                         warm_start="shift", retry_cold=True)
    w_seq = np.broadcast_to(w_box.astype(np.float32), (steps, 2)).copy()
    x0 = np.zeros(2, np.float32)
    t0 = time.perf_counter()
    out = ctrl.rollout_jit(x0, steps=steps, w_seq=w_seq)
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = ctrl.rollout_jit(x0, steps=steps, w_seq=w_seq)
    dt = time.perf_counter() - t0
    return {
        "horizon": H, "backend": "stagewise", "steps": steps,
        "robust": True, "w_box": w_box.tolist(),
        "steps_per_s": round(steps / dt, 2),
        "wall_s": round(dt, 4),
        "compile_plus_first_run_s": round(build_s, 2),
        "iters_mean": round(float(out["iters"].mean()), 1),
        "converged_frac": round(float(out["converged"].mean()), 3),
        "max_y": round(float(out["x"][:, 0].max()), 4),
        "original_bound": 1.0,
        "bound_held": bool(out["x"][:, 0].max() <= 1.0 + 1e-4),
        "tracking_tail": round(float(out["x"][-5:, 0].mean()), 4),
    }


def main() -> None:
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument("--condensed-512", action="store_true",
                    help="also run the condensed backend at H=512 "
                         "(slow: dense (2048)^2 dual)")
    args = ap.parse_args()

    rows = []
    for H in (32, 128, 256, 512):
        backends = ["stagewise"]
        if H < 512 or args.condensed_512:
            backends.insert(0, "condensed")
        for backend in backends:
            row = bench_backend(H, backend, args.steps)
            print(json.dumps(row))
            rows.append(row)
    row = bench_robust_longhorizon(256, args.steps)
    print(json.dumps(row))
    rows.append(row)

    result = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]), "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
