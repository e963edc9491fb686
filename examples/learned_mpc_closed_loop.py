"""End-to-end differentiable MPC: tune the controller's input weight by
gradient descent through a FULL closed-loop rollout (lax.scan over
steps, implicit-diff QP solve inside every step).

The gradient flows: closed-loop cost <- scan <- U*(QP) <- implicit KKT
differentiation <- cost weight.  No reference counterpart exists or
could exist (the reference is a C executable).

    python examples/learned_mpc_closed_loop.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pqp_for_mpc_tpu import SolverConfig, solve_qp_implicit
from pqp_for_mpc_tpu.models import MPCSpec, condense, double_integrator


def main():
    plant = double_integrator()
    H = 8
    steps = 25
    spec = MPCSpec(
        plant=plant, horizon=H,
        Qy=np.eye(1, dtype=np.float32), R=np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=-np.ones(1, np.float32), u_max=np.ones(1, np.float32),
        du_max=np.ones(1, np.float32))
    data = condense(spec)
    Qp0 = jnp.linalg.inv(data.Qp_inv)
    A = jnp.asarray(plant.A)
    Bm = jnp.asarray(plant.B)
    cfg = SolverConfig(max_iters=50_000, check_every=4, accel_every=4,
                       y0=0.1, strict_weak_duality=False,
                       eaj=1e-5, erj=1e-6)

    def closed_loop_cost(log_r):
        r_w = jnp.exp(log_r)
        Qp = Qp0 + 2.0 * (r_w - 1.0) * jnp.eye(H, dtype=jnp.float32)

        def step(x, _):
            primal = data.assemble(x=x, D=jnp.zeros(H, jnp.float32), Qp=Qp)
            U = solve_qp_implicit(Qp, primal.Fp, primal.Gp, primal.Kp, cfg)
            u0 = U[:1]
            xn = A @ x + Bm @ u0
            # true plant cost: position error + ACTUAL actuation price
            c = xn[0] ** 2 + 0.4 * u0[0] ** 2
            return xn, c

        x0 = jnp.asarray([1.5, 0.0], jnp.float32)
        _, cs = jax.lax.scan(step, x0, None, length=steps)
        return jnp.sum(cs)

    g = jax.grad(closed_loop_cost)
    log_r = jnp.asarray(jnp.log(0.05))     # start far from the truth
    hist = []
    for it in range(40):
        val = float(closed_loop_cost(log_r))
        hist.append(val)
        # clipped step: the landscape has sharp curvature near R=1
        log_r = log_r - 0.2 * jnp.clip(g(log_r), -2.0, 2.0)
    final = float(closed_loop_cost(log_r))
    print(f"closed-loop cost {hist[0]:.4f} -> {final:.4f} "
          f"(tuned R = {float(jnp.exp(log_r)):.3f}; the true actuation "
          f"price in the rollout cost is 0.4)")
    assert final < hist[0] - 0.5


if __name__ == "__main__":
    main()
