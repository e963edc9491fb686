"""Constrained moving-horizon estimation.

The bar: with no noise the window solve reproduces the true states and
a ~zero noise sequence; with Gaussian noise the unconstrained MHE
matches the steady-state Kalman filter; with ONE-SIDED noise (a bound
the filter's Gaussian model cannot express) the constrained MHE is
measurably better than the filter; the compiled sliding-window run
equals the eager per-window loop.
"""

import numpy as np

import pytest


def _plant():
    from pqp_for_mpc_tpu.models import double_integrator
    return double_integrator()


def _simulate(T, w_draw, v_sigma, seed=0):
    """True trajectory with process noise from ``w_draw(rng, (T, 2))``
    and measurement noise N(0, v_sigma^2)."""
    plant = _plant()
    rng = np.random.default_rng(seed)
    A, B, C = (np.asarray(plant.A), np.asarray(plant.B),
               np.asarray(plant.C))
    W = w_draw(rng, (T, 2)).astype(np.float32)
    V = (v_sigma * rng.standard_normal((T, 1))).astype(np.float32)
    U = (0.4 * np.sin(0.15 * np.arange(T))[:, None]).astype(np.float32)
    x = np.array([0.5, -0.2], np.float32)
    xs, ys = [], []
    for t in range(T):
        x = A @ x + B @ U[t] + W[t]
        xs.append(x)
        ys.append(C @ x + V[t])
    return U, np.stack(ys), np.stack(xs)


def _kf_errors(U, Y, X_true, Qw, Rv, x0):
    from pqp_for_mpc_tpu.models import KalmanFilter
    import jax.numpy as jnp

    kf = KalmanFilter(_plant(), Qw, Rv)
    xh = jnp.asarray(x0)
    errs = []
    for t in range(len(Y)):
        xh = kf.step(xh, jnp.asarray(U[t]), jnp.asarray(Y[t]))
        errs.append(np.linalg.norm(np.asarray(xh) - X_true[t]))
    return np.array(errs)


def test_noise_free_window_recovers_truth():
    from pqp_for_mpc_tpu.models import MovingHorizonEstimator

    U, Y, X = _simulate(12, lambda rng, s: np.zeros(s), 0.0)
    mhe = MovingHorizonEstimator(_plant(), window=12,
                                 Qw=1e-3 * np.eye(2),
                                 Rv=1e-3 * np.eye(1))
    x_hat, xs, res = mhe.step(np.array([0.5, -0.2], np.float32), U, Y)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(np.asarray(xs), X, atol=5e-3)
    W = np.asarray(res.U).reshape(12, 2)
    assert np.abs(W).max() < 5e-3


def test_gaussian_mhe_matches_kalman():
    from pqp_for_mpc_tpu.models import MovingHorizonEstimator

    Qw = np.diag([1e-4, 4e-3]).astype(np.float64)
    Rv = np.array([[4e-4]])
    gauss = lambda rng, s: rng.standard_normal(s) @ np.diag(
        np.sqrt(np.diag(Qw)))
    U, Y, X = _simulate(80, gauss, 0.02, seed=1)
    x0 = np.zeros(2, np.float32)     # both estimators start WRONG

    kf_err = _kf_errors(U, Y, X, Qw, Rv, x0)
    mhe = MovingHorizonEstimator(_plant(), window=10, Qw=Qw, Rv=Rv)
    out = mhe.run(x0, U, Y)
    assert out["converged"].all()
    mhe_err = np.linalg.norm(out["x_hat"] - X[9:], axis=1)
    # unconstrained MHE tracks the optimal (Kalman) filter
    tail_m = mhe_err[30:].mean()
    tail_k = kf_err[39:].mean()
    assert tail_m < 1.4 * tail_k, (tail_m, tail_k)
    assert tail_m < 0.1


def test_constrained_mhe_beats_kalman_on_one_sided_noise():
    from pqp_for_mpc_tpu.models import MovingHorizonEstimator

    # process noise is SPARSE NONNEGATIVE impulses on the velocity
    # state (one-directional kicks, zero most steps) — the filter's
    # zero-mean Gaussian model smears every innovation into symmetric
    # velocity noise, while the MHE's w >= 0 bound is exact (the
    # classic Rao-Rawlings constrained-estimation setting)
    sig = 0.25
    def impulses(rng, s):
        kick = (rng.uniform(size=s[0]) < 0.1).astype(np.float64)
        return np.stack(
            [np.zeros(s[0]),
             kick * np.abs(sig * rng.standard_normal(s[0]))], axis=1)
    Qw = np.diag([1e-6, sig ** 2]).astype(np.float64)
    Rv = np.array([[1e-4]])
    U, Y, X = _simulate(90, impulses, 0.01, seed=2)
    x0 = np.zeros(2, np.float32)

    kf_err = _kf_errors(U, Y, X, Qw, Rv, x0)
    mhe = MovingHorizonEstimator(
        _plant(), window=10, Qw=Qw, Rv=Rv,
        w_min=np.array([-1e-3, 0.0]),          # the known one-sidedness
        w_max=np.array([1e-3, 2.0]))
    out = mhe.run(x0, U, Y)
    assert out["converged"].all()
    assert out["iters"].max() < 5000          # no f32-floor stalls
    mhe_err = np.linalg.norm(out["x_hat"] - X[9:], axis=1)
    tail_m = mhe_err[20:].mean()
    tail_k = kf_err[29:].mean()
    # measured 0.062 vs 0.094 — the sign constraint is worth ~1/3
    assert tail_m < 0.8 * tail_k, (tail_m, tail_k)


def test_run_matches_eager_steps():
    from pqp_for_mpc_tpu.models import MovingHorizonEstimator

    Qw = 1e-3 * np.eye(2)
    Rv = np.array([[1e-3]])
    gauss = lambda rng, s: 0.02 * rng.standard_normal(s)
    U, Y, X = _simulate(20, gauss, 0.02, seed=3)
    x0 = np.zeros(2, np.float32)
    N = 8

    out = MovingHorizonEstimator(_plant(), window=N, Qw=Qw, Rv=Rv).run(
        x0, U, Y)

    mhe = MovingHorizonEstimator(_plant(), window=N, Qw=Qw, Rv=Rv)
    x_bar = x0
    for k in range(len(Y) - N + 1):
        x_hat, xs, res = mhe.step(x_bar, U[k:k + N], Y[k:k + N])
        np.testing.assert_allclose(np.asarray(x_hat), out["x_hat"][k],
                                   atol=2e-4)
        x_bar = np.asarray(xs[0])


def test_mhe_rejects_ltv_and_short_records():
    from pqp_for_mpc_tpu.models import (MovingHorizonEstimator,
                                        stack_plant)

    with pytest.raises(NotImplementedError):
        MovingHorizonEstimator(stack_plant(_plant(), 4), window=4,
                               Qw=np.eye(2), Rv=np.eye(1))
    mhe = MovingHorizonEstimator(_plant(), window=10,
                                 Qw=np.eye(2), Rv=np.eye(1))
    with pytest.raises(ValueError, match="T >="):
        mhe.run(np.zeros(2, np.float32),
                np.zeros((5, 1), np.float32), np.zeros((5, 1), np.float32))
