"""Offset-free output-feedback MPC under an unmeasured disturbance.

A constant unmodeled input disturbance pushes a nominal MPC loop off
its setpoint — the controller plans for a plant that is not the one
being actuated.  The offset-free loop (models/offset_free.py) estimates
the disturbance jointly with the state, recomputes the steady-state
target each step, and solves the QP in deviation coordinates; the whole
closed loop (estimate -> targets -> solve -> actuate -> measure) runs
in ONE ``lax.scan`` dispatch.

    python examples/offset_free_mpc.py [steps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import sys
import time

import numpy as np

from pqp_for_mpc_tpu.models import (MPCSpec, OffsetFreeController,
                                    double_integrator)
from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    plant = double_integrator()
    spec = MPCSpec(
        plant=plant, horizon=20,
        Qy=np.eye(1, dtype=np.float32),
        R=0.1 * np.eye(1, dtype=np.float32),
        r=np.array([1.0], np.float32),        # track position 1.0
        u_min=np.array([-2.0], np.float32),
        u_max=np.array([2.0], np.float32),
        du_max=np.array([1.0], np.float32))
    d_true = np.array([0.3], np.float32)      # unmeasured actuator bias

    ofc = OffsetFreeController(spec, kind="input")
    ofc.rollout_jit(np.zeros(2, np.float32), steps, d_true)   # compile
    t0 = time.perf_counter()
    out = ofc.rollout_jit(np.zeros(2, np.float32), steps, d_true)
    dt = time.perf_counter() - t0

    y_err = abs(float(out["y"][-1, 0]) - 1.0)
    print(f"{steps} output-feedback steps in {dt:.3f} s "
          f"({steps/dt:,.0f} steps/s)")
    print(f"final |y - r| = {y_err:.2e} (offset-free) ; "
          f"d_hat = {float(out['d_hat'][-1, 0]):+.4f} "
          f"(true {float(d_true[0]):+.4f})")
    print(f"solver iters mean {out['iters'].mean():.0f} "
          f"max {out['iters'].max()}; all converged: "
          f"{bool(out['converged'].all())}")


if __name__ == "__main__":
    main()
