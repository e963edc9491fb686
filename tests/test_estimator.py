"""Steady-state Kalman filter + output-feedback MPC.

The reference's pipeline receives the full state by file; real loops
measure ``y = C x + v`` and must estimate.  The bar: the f64-built gain
solves the filter DARE (fixed-point residual ~0), the filter's
estimation error beats open-loop prediction by a wide margin under
noise, and a FULLY COMPILED output-feedback loop (estimate → solve →
actuate → measure inside one lax.scan) regulates the plant from a wrong
initial estimate.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _plant():
    from pqp_for_mpc_tpu.models import double_integrator
    return double_integrator()   # position-only measurement (C = [1 0])


def test_kalman_gain_solves_filter_dare():
    from pqp_for_mpc_tpu.models import kalman_gain

    plant = _plant()
    Qw = 0.01 * np.eye(2)
    Rv = 0.04 * np.eye(1)
    L = np.asarray(kalman_gain(plant, Qw, Rv), np.float64)
    # recompute P by the same iteration and check L is its gain AND the
    # DARE fixed point holds to f64 tolerance
    A = np.asarray(plant.A, np.float64)
    C = np.asarray(plant.C, np.float64)
    P = Qw.copy()
    for _ in range(20000):
        S = C @ P @ C.T + Rv
        K = np.linalg.solve(S, C @ P).T
        Pn = A @ (P - K @ C @ P) @ A.T + Qw
        if np.abs(Pn - P).max() < 1e-14:
            P = Pn
            break
        P = Pn
    resid = np.abs(A @ (P - P @ C.T @ np.linalg.solve(
        C @ P @ C.T + Rv, C @ P)) @ A.T + Qw - P).max()
    assert resid < 1e-10
    np.testing.assert_allclose(
        L, np.linalg.solve(C @ P @ C.T + Rv, C @ P).T, atol=1e-6)
    # the filter must be stable: eigenvalues of (I - L C) A inside the
    # unit circle
    eig = np.linalg.eigvals((np.eye(2) - L @ C) @ A)
    assert np.abs(eig).max() < 1.0


def test_filter_beats_open_loop_prediction():
    from pqp_for_mpc_tpu.models import KalmanFilter

    plant = _plant()
    Qw = 0.005 * np.eye(2)
    Rv = 0.02 * np.eye(1)
    kf = KalmanFilter(plant, Qw, Rv)
    rng = np.random.default_rng(0)
    A = np.asarray(plant.A)
    B = np.asarray(plant.B)
    C = np.asarray(plant.C)
    Lw = np.linalg.cholesky(Qw).astype(np.float32)
    Lv = np.linalg.cholesky(Rv).astype(np.float32)

    x = np.array([1.0, -0.5], np.float32)
    xh = jnp.zeros(2, jnp.float32)      # filter starts WRONG
    xo = np.zeros(2, np.float32)        # open-loop predictor, same start
    err_f, err_o = [], []
    for t in range(200):
        u = np.array([0.3 * np.sin(0.1 * t)], np.float32)
        w = (Lw @ rng.standard_normal(2)).astype(np.float32)
        v = (Lv @ rng.standard_normal(1)).astype(np.float32)
        x = A @ x + B @ u + w
        y = C @ x + v
        xh = kf.step(xh, jnp.asarray(u), jnp.asarray(y))
        xo = A @ xo + B @ u
        err_f.append(np.linalg.norm(np.asarray(xh) - x))
        err_o.append(np.linalg.norm(xo - x))
    tail_f = float(np.mean(err_f[100:]))
    tail_o = float(np.mean(err_o[100:]))
    assert tail_f < 0.25 * tail_o, (tail_f, tail_o)
    assert tail_f < 0.2


def test_output_feedback_closed_loop():
    """Estimate -> solve -> actuate -> measure in ONE lax.scan: the MPC
    never sees the true state, only the filter's estimate, and still
    regulates from a wrong initial estimate under noise."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models import KalmanFilter, MPCSpec
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    plant = _plant()
    H = 16
    spec = MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(1, dtype=np.float32),
                   R=0.1 * np.eye(1, dtype=np.float32),
                   r=np.zeros(1, np.float32),
                   u_min=np.array([-1.0], np.float32),
                   u_max=np.array([1.0], np.float32),
                   du_max=np.array([0.5], np.float32))
    cfg = SolverConfig(max_iters=20_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-3, erj=1e-4, erc=1e-4, eac=1e-4,
                       strict_weak_duality=False)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    kf = KalmanFilter(plant, Qw=0.002 * np.eye(2), Rv=0.01 * np.eye(1))
    A = jnp.asarray(plant.A)
    B = jnp.asarray(plant.B)
    C = jnp.asarray(plant.C)

    steps = 120   # 60 is not enough to settle from [2, 0] (measured)
    rng = np.random.default_rng(3)
    vs = jnp.asarray(0.1 * rng.standard_normal(
        (steps, 1)).astype(np.float32))

    @jax.jit
    def run(x0, xh0):
        def body(carry, v):
            x, xh, Y = carry
            res = solve_stagewise(sd, xh[:, None],
                                  Y0=jnp.maximum(Y, 0.01), cfg=cfg)
            u0 = res.U[:1, 0]
            xn = A @ x + B @ u0                 # TRUE plant
            y = C @ xn + v                      # noisy measurement
            xhn = kf.step(xh, u0, y)
            return (xn, xhn, res.Y), (xn, xhn, res.converged[0])
        init = (x0, xh0, jnp.zeros((sd.n_con, 1), jnp.float32))
        _, out = lax.scan(body, init, vs)
        return out

    xs, xhs, conv = run(jnp.asarray([2.0, 0.0], jnp.float32),
                        jnp.zeros(2, jnp.float32))
    assert bool(np.asarray(conv).all())
    tail = np.linalg.norm(np.asarray(xs)[-10:], axis=1).mean()
    assert tail < 0.3, tail                          # regulated
    est_err = np.linalg.norm(np.asarray(xhs) - np.asarray(xs), axis=1)
    assert est_err[-10:].mean() < 0.15               # estimate locked on
