"""Learning-based MPC: tune the input-weight R by gradient descent
THROUGH the QP solver (implicit differentiation of the KKT system).

Capability with no reference counterpart — possible only because the
solver is a JAX function.  We tune a scalar input weight so the one-step
optimal input matches a target input.

    python examples/differentiable_mpc.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from pqp_for_mpc_tpu import SolverConfig, solve_qp_implicit
from pqp_for_mpc_tpu.models import MPCSpec, condense, double_integrator


def main():
    plant = double_integrator()
    H = 8
    x0 = jnp.asarray([1.5, 0.0], jnp.float32)
    cfg = SolverConfig(max_iters=100_000, check_every=4, accel_every=4,
                       y0=0.1, strict_weak_duality=False,
                       eaj=1e-5, erj=1e-6)
    u_target = -0.6

    spec = MPCSpec(
        plant=plant, horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=np.eye(1, dtype=np.float32),   # placeholder, replaced below
        r=np.zeros(1, np.float32),
        u_min=-np.ones(1, np.float32), u_max=np.ones(1, np.float32),
        du_max=np.ones(1, np.float32))
    data = condense(spec)                # hoisted: independent of log_r
    Qp0 = jnp.linalg.inv(data.Qp_inv)

    def first_input(log_r):
        # Qp = 2(S'QS + R I): adjust the R part differentiably
        r_w = jnp.exp(log_r)
        Qp = Qp0 + 2.0 * (r_w - 1.0) * jnp.eye(H, dtype=jnp.float32)
        primal = data.assemble(x=x0, D=jnp.zeros(H, jnp.float32), Qp=Qp)
        U = solve_qp_implicit(Qp, primal.Fp, primal.Gp, primal.Kp, cfg)
        return U[0]

    loss = lambda lr_: (first_input(lr_) - u_target) ** 2
    g = jax.grad(loss)
    log_r = jnp.asarray(0.0)
    for step in range(30):
        log_r = log_r - 0.5 * g(log_r)
    u = float(first_input(log_r))
    print(f"tuned R = {float(jnp.exp(log_r)):.4f}; "
          f"first input {u:+.4f} (target {u_target:+.1f})")
    assert abs(u - u_target) < 0.05


if __name__ == "__main__":
    main()
