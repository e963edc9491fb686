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


# ---------------------------------------------------------------------------
# Nonlinear (relinearizing) MHE + output-feedback RTI composition (round 5)
# ---------------------------------------------------------------------------

_DT, _G, _BD = 0.05, 9.81, 0.15


def _pend_hanging():
    """Hanging pendulum (stable, strongly nonlinear at large angles)."""
    import jax.numpy as jnp

    def f_cont(x, u):
        th, om = x[0], x[1]
        return jnp.stack([om, -_G * jnp.sin(th) - _BD * om + u[0]])

    def f_disc(x, u):
        k1 = f_cont(x, u)
        k2 = f_cont(x + 0.5 * _DT * k1, u)
        k3 = f_cont(x + 0.5 * _DT * k2, u)
        k4 = f_cont(x + _DT * k3, u)
        return x + _DT / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    return f_disc


def _pend_upright():
    """Upright pendulum (unstable: the output-feedback bar)."""
    import jax.numpy as jnp

    def f_cont(x, u):
        th, om = x[0], x[1]
        return jnp.stack([om, _G * jnp.sin(th) - 0.2 * om + u[0]])

    def f_disc(x, u):
        k1 = f_cont(x, u)
        k2 = f_cont(x + 0.5 * _DT * k1, u)
        k3 = f_cont(x + 0.5 * _DT * k2, u)
        k4 = f_cont(x + _DT * k3, u)
        return x + _DT / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    return f_disc


def test_nonlinear_mhe_tracks_pendulum_where_kf_cannot():
    """A large-angle pendulum swing measured by angle only: the
    origin-linearized steady-state KF's model error swamps its estimate
    (sin th != th at 2.4 rad) while the relinearizing MHE tracks both
    states.  Pinned: MHE RMSE [0.012, 0.057] vs KF [0.47, 2.01]
    (measured; bars give 3x headroom)."""
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models import KalmanFilter, NonlinearMHE
    from pqp_for_mpc_tpu.models.plants import LinearPlant

    f_disc = _pend_hanging()
    C = np.array([[1.0, 0.0]])
    rng = np.random.default_rng(0)
    T = 80
    x = np.array([2.4, 0.0], np.float32)
    w_sd = np.array([0.002, 0.01])
    v_sd = 0.02
    xs_true, us, ys = [], [], []
    for t in range(T):
        u = np.array([0.3 * np.sin(0.25 * t)], np.float32)
        w = rng.normal(0, w_sd).astype(np.float32)
        x = np.asarray(f_disc(jnp.asarray(x), jnp.asarray(u))) + w
        xs_true.append(x.copy())
        us.append(u)
        ys.append((C @ x + rng.normal(0, v_sd, 1)).astype(np.float32))
    xs_true, us, ys = np.stack(xs_true), np.stack(us), np.stack(ys)

    Qw = np.diag(w_sd ** 2)
    Rv = np.array([[v_sd ** 2]])
    A0 = np.asarray(jax.jacobian(f_disc, 0)(jnp.zeros(2), jnp.zeros(1)))
    B0 = np.asarray(jax.jacobian(f_disc, 1)(jnp.zeros(2), jnp.zeros(1)))
    kf = KalmanFilter(LinearPlant(A=A0.astype(np.float32),
                                  B=B0.astype(np.float32),
                                  E=np.zeros((2, 1), np.float32),
                                  C=C.astype(np.float32)), Qw, Rv)
    x0_hat = xs_true[0] + np.array([0.1, -0.2], np.float32)
    xh = jnp.asarray(x0_hat)
    kf_est = []
    for t in range(1, T):
        xh = kf.step(xh, jnp.asarray(us[t]), jnp.asarray(ys[t]))
        kf_est.append(np.asarray(xh))
    kf_est = np.stack(kf_est)

    N = 10
    mhe = NonlinearMHE(f_disc, C, window=N, Qw=Qw, Rv=Rv,
                       u_lin=np.zeros(1), w_min=-5 * w_sd,
                       w_max=5 * w_sd, sqp_iters=2)
    out = mhe.run(x0_hat, us, ys)
    assert out["converged"].all()
    assert out["iters"].max() < 5000

    truth_tail = xs_true[N - 1:]
    e_mhe = np.sqrt(((out["x_hat"] - truth_tail) ** 2).mean(0))
    e_kf = np.sqrt(((kf_est[N - 2:] - truth_tail) ** 2).mean(0))
    assert e_mhe[0] < 0.04 and e_mhe[1] < 0.2, e_mhe
    assert e_kf[0] > 0.2 and e_kf[1] > 0.5, e_kf     # the KF really fails
    assert (e_mhe < 0.25 * e_kf).all()


def test_nonlinear_mhe_step_matches_run():
    """The compiled sliding scan equals the eager per-window loop."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models import NonlinearMHE

    f_disc = _pend_hanging()
    C = np.array([[1.0, 0.0]])
    rng = np.random.default_rng(3)
    T, N = 18, 6
    x = np.array([1.5, 0.3], np.float32)
    us, ys = [], []
    for t in range(T):
        u = np.array([0.2 * np.cos(0.3 * t)], np.float32)
        x = np.asarray(f_disc(jnp.asarray(x), jnp.asarray(u)))
        x = x + rng.normal(0, [0.002, 0.01]).astype(np.float32)
        us.append(u)
        ys.append((C @ x + rng.normal(0, 0.02, 1)).astype(np.float32))
    us, ys = np.stack(us), np.stack(ys)
    x_bar0 = np.array([1.4, 0.2], np.float32)

    mhe = NonlinearMHE(f_disc, C, window=N, Qw=np.diag([4e-6, 1e-4]),
                       Rv=np.array([[4e-4]]), u_lin=np.zeros(1))
    out = mhe.run(x_bar0, us, ys)

    mhe.reset()
    x_bar = x_bar0
    eager = []
    for k in range(T - N + 1):
        x_hat, xs, res = mhe.step(x_bar, us[k:k + N], ys[k:k + N])
        assert bool(np.asarray(res.converged).all())
        eager.append(np.asarray(x_hat))
        x_bar = np.asarray(xs[0])
    np.testing.assert_allclose(out["x_hat"], np.stack(eager),
                               rtol=1e-4, atol=2e-4)


def test_output_feedback_rti_rollout_stabilizes_upright():
    """The capstone composition: NonlinearMHE (angle-only, noisy) +
    RTIController stabilize the UPRIGHT pendulum in one compiled scan —
    estimate -> relinearize -> solve -> apply.  100% certified both
    solvers (measured: final |x| = [0.001, 0.024])."""
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models import (MPCSpec, NonlinearMHE,
                                        RTIController,
                                        output_feedback_rollout)
    from pqp_for_mpc_tpu.models.plants import LTVPlant

    f_disc = _pend_upright()
    H, ns, nu, ny = 24, 2, 1, 1
    A0 = np.asarray(jax.jacobian(f_disc, 0)(jnp.zeros(ns), jnp.zeros(nu)))
    B0 = np.asarray(jax.jacobian(f_disc, 1)(jnp.zeros(ns), jnp.zeros(nu)))
    C = np.array([[1.0, 0.0]], np.float32)
    plant = LTVPlant(
        A=np.broadcast_to(A0, (H, ns, ns)).astype(np.float32),
        B=np.broadcast_to(B0, (H, ns, nu)).astype(np.float32),
        E=np.broadcast_to(np.eye(ns), (H, ns, ns)).astype(np.float32),
        C=np.broadcast_to(C, (H, ny, ns)).astype(np.float32))
    spec = MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(ny, dtype=np.float32),
                   R=0.05 * np.eye(nu, dtype=np.float32),
                   r=np.zeros(ny, np.float32),
                   u_min=np.array([-12.0], np.float32),
                   u_max=np.array([12.0], np.float32),
                   du_max=np.array([10.0], np.float32))
    rti = RTIController(f_disc, spec, sqp_iters=1)

    w_sd = np.array([0.001, 0.005])
    v_sd = 0.01
    mhe = NonlinearMHE(f_disc, C, window=8, Qw=np.diag(w_sd ** 2),
                       Rv=np.array([[v_sd ** 2]]), u_lin=np.zeros(nu),
                       w_min=-5 * w_sd, w_max=5 * w_sd)

    rng = np.random.default_rng(1)
    steps = 60
    w_seq = rng.normal(0, w_sd, (steps + 8, ns)).astype(np.float32)
    v_seq = rng.normal(0, v_sd, (steps + 8, ny)).astype(np.float32)
    out = output_feedback_rollout(rti, mhe,
                                  np.array([0.15, 0.0], np.float32),
                                  steps, w_seq, v_seq)
    assert out["conv_mhe"].all() and out["conv_rti"].all()
    tail = np.abs(out["x"][-5:])
    assert tail[:, 0].max() < 0.05, tail      # upright held
    assert tail[:, 1].max() < 0.15, tail
    # the estimate the controller acted on tracked the truth
    err = np.sqrt(((out["x_hat"][20:] - out["x"][20:]) ** 2).mean(0))
    assert err[0] < 0.03 and err[1] < 0.1, err


def test_output_feedback_requires_shared_dynamics():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from pqp_for_mpc_tpu.models import (MPCSpec, NonlinearMHE,
                                        RTIController,
                                        output_feedback_rollout)
    from pqp_for_mpc_tpu.models.plants import LTVPlant

    f1, f2 = _pend_upright(), _pend_hanging()
    H, ns, nu, ny = 8, 2, 1, 1
    A0 = np.asarray(jax.jacobian(f1, 0)(jnp.zeros(ns), jnp.zeros(nu)))
    B0 = np.asarray(jax.jacobian(f1, 1)(jnp.zeros(ns), jnp.zeros(nu)))
    C = np.array([[1.0, 0.0]], np.float32)
    plant = LTVPlant(
        A=np.broadcast_to(A0, (H, ns, ns)).astype(np.float32),
        B=np.broadcast_to(B0, (H, ns, nu)).astype(np.float32),
        E=np.broadcast_to(np.eye(ns), (H, ns, ns)).astype(np.float32),
        C=np.broadcast_to(C, (H, ny, ns)).astype(np.float32))
    spec = MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(ny, dtype=np.float32),
                   R=0.05 * np.eye(nu, dtype=np.float32),
                   r=np.zeros(ny, np.float32),
                   u_min=np.array([-12.0], np.float32),
                   u_max=np.array([12.0], np.float32),
                   du_max=np.array([10.0], np.float32))
    rti = RTIController(f1, spec)
    mhe = NonlinearMHE(f2, C, window=4, Qw=np.eye(2) * 1e-4,
                       Rv=np.array([[1e-4]]), u_lin=np.zeros(1))
    with _pytest.raises(ValueError, match="share f_disc"):
        output_feedback_rollout(rti, mhe, np.zeros(2, np.float32), 4)


def test_nonlinear_mhe_output_bounds():
    """Physically-known state bounds on the NONLINEAR estimator (round
    5 parity with MovingHorizonEstimator's y_min/y_max): during a
    sustained sensor-bias episode the unbounded estimate spikes past
    the physical range while the bounded one respects it exactly and
    carries lower error (measured: max estimate 0.497 vs 0.379 at the
    0.379 bound, mean error 0.162 -> 0.144)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models import NonlinearMHE

    f_disc = _pend_hanging()
    C = np.array([[1.0, 0.0]])
    rng = np.random.default_rng(0)
    T = 40
    x = np.array([0.3, 0.0], np.float32)
    w_sd = np.array([0.02, 0.1])      # loose process trust: the
    v_sd = 0.02                       # estimator follows measurements
    xs, us, ys = [], [], []
    for t in range(T):
        u = np.array([0.1 * np.sin(0.3 * t)], np.float32)
        x = np.asarray(f_disc(jnp.asarray(x), jnp.asarray(u))) \
            + rng.normal(0, w_sd).astype(np.float32)
        xs.append(x.copy())
        us.append(u)
        ys.append((C @ x + rng.normal(0, v_sd, 1)).astype(np.float32))
    xs, us, ys = np.stack(xs), np.stack(us), np.stack(ys)
    ys[20:28] += 0.6                  # sustained sensor-bias episode
    Qw, Rv = np.diag(w_sd ** 2), np.array([[v_sd ** 2]])
    bound = float(np.abs(xs[:, 0]).max()) + 0.08
    x0 = xs[0] + np.array([0.05, -0.05], np.float32)

    free = NonlinearMHE(f_disc, C, window=8, Qw=Qw, Rv=Rv,
                        u_lin=np.zeros(1))
    out_f = free.run(x0, us, ys)
    bounded = NonlinearMHE(f_disc, C, window=8, Qw=Qw, Rv=Rv,
                           u_lin=np.zeros(1),
                           y_max=np.array([bound], np.float32),
                           y_min=np.array([-bound], np.float32))
    out_b = bounded.run(x0, us, ys)
    assert out_f["converged"].all() and out_b["converged"].all()
    # the unbounded estimate violates the physical range...
    assert out_f["x_hat"][:, 0].max() > bound + 0.05
    # ...the bounded one respects it and is more accurate.  Slack note:
    # the QP enforces the bound on the LINEARIZED window trajectory;
    # x_hat is the NONLINEAR re-roll with the solved noise, so the gap
    # is linearization error (measured ~1e-4 here), not float noise —
    # the 0.02 slack covers it across seeds/windows
    assert out_b["x_hat"][:, 0].max() <= bound + 0.02
    err_f = np.abs(out_f["x_hat"][:, 0] - xs[7:, 0])
    err_b = np.abs(out_b["x_hat"][:, 0] - xs[7:, 0])
    assert err_b.mean() < err_f.mean()
