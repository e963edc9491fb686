"""Output-constrained MPC through the matrix-free stage-wise backend.

The reference's constraint surface is input-only (box + slew,
N = 4*pHorizon*nInput rows, PQP_CPU.c:941).  This example adds hard
OUTPUT (state) bounds — ``|y_k| <= y_max`` over the whole horizon — and
runs them matrix-free at a long horizon: the y-rows' ``G_y = C Su``
applies as a zero-state rollout, its adjoint as one backward scan, and
their instance-dependent bounds ride the forcing build's free response
(models/stagewise.py).  The setpoint is placed ABOVE the bound, so the
optimal trajectory must ride the constraint instead of settling at the
reference — the classic constrained-servo scenario.

Usage: python examples/constrained_outputs_mpc.py [horizon] [steps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import sys
import time

import numpy as np


def main() -> None:
    from pqp_for_mpc_tpu.models import MPCController, MPCSpec
    from pqp_for_mpc_tpu.models import double_integrator

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    y_max = 1.9

    spec = MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.full(1, 2.5, np.float32),          # setpoint ABOVE the bound
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32),
        y_min=np.array([-y_max], np.float32),
        y_max=np.array([y_max], np.float32))

    ctrl = MPCController(spec, backend="stagewise", warm_start="shift",
                         retry_cold=True)
    assert ctrl.data is None          # the condensed blocks never exist

    x0 = np.array([0.0, 0.0], np.float32)
    ctrl.rollout_jit(x0, steps=steps)             # compile
    t0 = time.perf_counter()
    out = ctrl.rollout_jit(x0, steps=steps)
    dt = time.perf_counter() - t0

    y = out["x"][:, 0]
    print(f"H={H}, |y| <= {y_max}, setpoint 2.5: {steps} steps in "
          f"{dt:.3f}s ({steps / dt:.1f} steps/s), "
          f"certified {100 * out['converged'].mean():.0f}%, "
          f"y peak {y.max():.4f} (bound honored: {y.max() <= y_max + 1e-3}), "
          f"y final {y[-1]:.3f} (riding the active bound)")


if __name__ == "__main__":
    main()
