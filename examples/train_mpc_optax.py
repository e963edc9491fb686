"""Batched learning-based MPC: optax training through the QP solver.

Scales examples/learned_mpc_closed_loop.py to a SCENARIO BATCH: the loss
is the mean closed-loop cost over a batch of initial states, each
rollout a ``lax.scan`` whose every step differentiates through the PQP
solve (``solve_qp_implicit``'s one-linear-solve implicit backward), and
the whole (batch, steps, solve, grad) pipeline is ONE jitted function
driven by ``optax.adam``.

Learned parameters: the log actuation weight AND a per-stage log
tracking-weight profile (horizon weights) — 1 + H parameters, trained
jointly.  The plant's "true" actuation price differs from the
controller's initial guess, so the optimum moves both.

No reference counterpart exists or could exist (the reference is a C
executable; SURVEY.md §5 lists no learning subsystem).

    python examples/train_mpc_optax.py [batch] [steps]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pqp_for_mpc_tpu import SolverConfig, solve_qp_implicit
from pqp_for_mpc_tpu.models import MPCSpec, condense, double_integrator


def main(batch=16, train_steps=25):
    plant = double_integrator()
    H = 8
    rollout_len = 15
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

    rng = np.random.default_rng(0)
    X0 = jnp.asarray(
        np.stack([rng.uniform(0.8, 2.0, batch),
                  rng.uniform(-0.5, 0.5, batch)], axis=1), jnp.float32)

    def rollout_cost(params, x0):
        # controller Hessian: the condensed Qp's R-contribution is the
        # +2I diagonal block; swapping it for learned per-stage weights
        # 2*r_w*stage_i keeps Qp PD for ANY positive weights
        # (Qp0 - 2I = 2*Gamma'Q Gamma is PSD)
        r_w = jnp.exp(params["log_r"])
        stage = jnp.exp(params["log_stage"])            # (H,)
        Qp = Qp0 + jnp.diag(2.0 * (r_w * stage - 1.0))

        def step(x, _):
            primal = data.assemble(x=x, D=jnp.zeros(H, jnp.float32), Qp=Qp)
            U = solve_qp_implicit(Qp, primal.Fp, primal.Gp, primal.Kp, cfg)
            u0 = U[:1]
            xn = A @ x + Bm @ u0
            # TRUE plant economics: position error + actual actuation price
            return xn, xn[0] ** 2 + 0.4 * u0[0] ** 2

        _, cs = jax.lax.scan(step, x0, None, length=rollout_len)
        return jnp.sum(cs)

    def loss(params):
        return jnp.mean(jax.vmap(lambda x0: rollout_cost(params, x0))(X0))

    params = {"log_r": jnp.asarray(jnp.log(0.05)),
              "log_stage": jnp.zeros(H, jnp.float32)}
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(0.1))
    state = opt.init(params)

    @jax.jit
    def train_step(params, state):
        val, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, val

    hist = []
    for it in range(train_steps):
        params, state, val = train_step(params, state)
        hist.append(float(val))
        if it % 5 == 0:
            print(f"step {it:3d}  loss {hist[-1]:.5f}  "
                  f"R={float(jnp.exp(params['log_r'])):.3f}")
    print(f"loss {hist[0]:.5f} -> {hist[-1]:.5f} over {batch} scenarios "
          f"({train_steps} adam steps)")
    assert hist[-1] < hist[0], "training loss must decrease"
    return hist


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
