"""Nonlinear MPC by real-time iteration (successive linearization).

The reference solves one precondensed LTI QP (PQP_CPU.c:757-930).  This
example shows the framework surface that goes beyond it: a NONLINEAR
plant controlled by relinearizing along a nominal trajectory every
control step.

Default mode runs :class:`~pqp_for_mpc_tpu.models.rti.RTIController`
.rollout — the ENTIRE closed loop (per-stage Jacobians, time-varying
Riccati refactorization via ``relinearize``, the matrix-free PQP solve,
and the true nonlinear plant propagation) compiled into ONE ``lax.scan``
dispatch.  ``--eager`` runs the same algorithm spelled out by hand with
eager ``stagewise_dual`` rebuilds — readable, but it pays ~0.5 s of
Python dispatch per control step; the compiled path is the production
pattern.

Plant: torque-limited pendulum measured from the UPRIGHT equilibrium
(gravity destabilizing), swung from 2.5 rad to balance.  A fixed-LTI
controller linearized at upright fails from this far out; the
successively-linearized loop stabilizes it.

    python examples/nonlinear_mpc.py [steps] [--eager]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu import SolverConfig
from pqp_for_mpc_tpu.models import LTVPlant, MPCSpec, RTIController
from pqp_for_mpc_tpu.models.stagewise import solve_stagewise, stagewise_dual
from pqp_for_mpc_tpu.utils.cache import enable_persistent_cache

DT = 0.05
G_OVER_L = 10.0
DAMPING = 0.1

H, NS, NU = 20, 2, 1


def f_cont(x, u):
    """Pendulum about the upright: theta'' = (g/l) sin(theta) - b w + u."""
    th, w = x[0], x[1]
    return jnp.stack([w, G_OVER_L * jnp.sin(th) - DAMPING * w + u[0]])


def f_disc(x, u):
    """One RK4 step of the continuous dynamics."""
    k1 = f_cont(x, u)
    k2 = f_cont(x + 0.5 * DT * k1, u)
    k3 = f_cont(x + 0.5 * DT * k2, u)
    k4 = f_cont(x + DT * k3, u)
    return x + (DT / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def make_spec(x_lin, u_lin):
    """The QP shape; the plant matrices carry the FIRST linearization
    (here: at (x_lin, u_lin)), later steps relinearize in-graph."""
    A = np.asarray(jax.jacobian(f_disc, argnums=0)(x_lin, u_lin))
    B = np.asarray(jax.jacobian(f_disc, argnums=1)(x_lin, u_lin))
    C = np.tile(np.array([[[1.0, 0.0]]], np.float32), (H, 1, 1))
    E = np.tile(np.eye(NS, dtype=np.float32)[None], (H, 1, 1))
    plant = LTVPlant(A=np.tile(A[None], (H, 1, 1)),
                     B=np.tile(B[None], (H, 1, 1)),
                     E=E, C=C, name="pendulum_ltv")
    return MPCSpec(
        plant=plant, horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.02 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-12.0], np.float32),
        u_max=np.array([12.0], np.float32),
        du_max=np.array([6.0], np.float32))


def solver_config():
    return SolverConfig(max_iters=20_000, check_every=8, accel_every=4,
                        y0=0.01, eaj=1e-3, erj=1e-4, erc=1e-4, eac=1e-4,
                        strict_weak_duality=False)


def run_compiled(x0, steps):
    """The production path: RTIController.rollout — one compiled graph
    for the whole closed loop (Jacobians + relinearize + solve + plant)."""
    ctrl = RTIController(f_disc, make_spec(jnp.zeros(NS), jnp.zeros(NU)),
                         cfg=solver_config(), sqp_iters=2)
    t0 = time.perf_counter()
    out = ctrl.rollout(x0, steps)
    dt = time.perf_counter() - t0
    traj = np.concatenate([np.asarray(x0)[None], out["x"]])
    return traj, out["u"][:, 0], out["iters"], dt


def run_eager(x0, steps):
    """The same algorithm spelled out eagerly (didactic; slow path)."""
    cfg = solver_config()
    x = jnp.asarray(x0, jnp.float32)
    u_prev = np.zeros(NU, np.float32)
    useq = jnp.zeros((H, NU), jnp.float32)       # running plan (shifted)
    traj, inputs, iters = [np.asarray(x)], [], []

    def nominal(x, useq):
        def step(xk, uk):
            return f_disc(xk, uk), xk
        _, xs = jax.lax.scan(step, x, useq)
        return xs                                # xbar_k = state ENTERING k

    @jax.jit
    def linearize(xbar, ubar):
        def one(x, u):
            A = jax.jacobian(f_disc, argnums=0)(x, u)
            B = jax.jacobian(f_disc, argnums=1)(x, u)
            c = f_disc(x, u) - A @ x - B @ u
            return A, B, c
        return jax.vmap(one)(xbar, ubar)

    base = make_spec(jnp.zeros(NS), jnp.zeros(NU))
    C = np.asarray(base.plant.C)
    E = np.asarray(base.plant.E)
    t0 = time.perf_counter()
    for t in range(steps):
        # warm-start the SQP from the previous plan shifted one stage;
        # 2 relinearizations while the plan is far from the trajectory
        # it predicts, then the classic real-time-iteration single pass
        sqp_iters = 2 if t < 3 else 1
        useq = jnp.concatenate([useq[1:], useq[-1:]])
        for _ in range(sqp_iters):
            xbar = nominal(x, useq)
            A, B, c = linearize(xbar, useq)
            plant = LTVPlant(A=np.asarray(A), B=np.asarray(B), E=E,
                             C=C, name="pendulum_ltv")
            spec = MPCSpec(
                plant=plant, horizon=H, Qy=base.Qy, R=base.R, r=base.r,
                u_min=base.u_min, u_max=base.u_max, du_max=base.du_max,
                u_prev=u_prev)
            sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
            res = solve_stagewise(sd, x[:, None],
                                  dseq=jnp.asarray(c)[:, :, None], cfg=cfg)
            useq = res.U.reshape(H, NU)
        u0 = useq[0]
        x = f_disc(x, u0)                        # TRUE nonlinear plant
        u_prev = np.asarray(u0)
        traj.append(np.asarray(x))
        inputs.append(float(u0[0]))
        iters.append(int(np.asarray(res.iters).max()))
    dt = time.perf_counter() - t0
    return np.stack(traj), np.asarray(inputs), np.asarray(iters), dt


def main():
    enable_persistent_cache()
    argv = [a for a in sys.argv[1:] if a != "--eager"]
    eager = "--eager" in sys.argv[1:]
    steps = int(argv[0]) if argv else 60

    x0 = np.array([2.5, 0.0], np.float32)        # 143 degrees from upright
    run = run_eager if eager else run_compiled
    traj, inputs, iters, dt = run(x0, steps)

    mode = "eager" if eager else "compiled (RTIController.rollout)"
    print(f"{steps} steps in {dt:.2f} s ({steps/dt:.1f} steps/s) [{mode}]")
    print(f"theta: start {traj[0, 0]:+.3f} rad -> final "
          f"{traj[-1, 0]:+.5f} rad  (|u| max {np.abs(inputs).max():.2f}, "
          f"solver iters mean {np.mean(iters):.0f})")
    if steps >= 30:
        assert abs(traj[-1, 0]) < 0.5, "pendulum not swinging up"
    if steps >= 60:
        assert abs(traj[-1, 0]) < 0.01 and abs(traj[-1, 1]) < 0.02, \
            "pendulum not stabilized"
        print("stabilized upright: OK")


if __name__ == "__main__":
    main()
