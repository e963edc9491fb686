"""Robust constraint-tightening MPC.

The bar: the margins are the exact box supports (one-step margin =
|C| w, monotone in the stage); per-stage output-bound schedules
condense identically to constants when constant; under an ADVERSARIAL
worst-case disturbance the nominal loop violates the output bound while
the tightened loop never does; impossible tightenings raise.
"""

import dataclasses

import numpy as np

import pytest


def _spec(H=16, **kw):
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator
    args = dict(plant=double_integrator(), horizon=H,
                Qy=np.eye(1, dtype=np.float32),
                R=0.05 * np.eye(1, dtype=np.float32),
                r=np.array([0.95], np.float32),
                u_min=np.array([-1.0], np.float32),
                u_max=np.array([1.0], np.float32),
                du_max=np.array([0.5], np.float32))
    args.update(kw)
    return MPCSpec(**args)


def test_margins_exact_and_monotone():
    from pqp_for_mpc_tpu.models import double_integrator, lqr_gain, \
        tube_margins

    plant = double_integrator()
    K = lqr_gain(plant, np.eye(1), 0.05 * np.eye(1))
    # K stabilizes A + B K
    Phi = np.asarray(plant.A) + np.asarray(plant.B) @ K
    assert np.abs(np.linalg.eigvals(Phi)).max() < 1.0
    w = np.array([0.01, 0.05])
    m_u, m_y = tube_margins(plant, K, w, 12)
    # one-step output margin is exactly |C| w
    np.testing.assert_allclose(m_y[1], np.abs(plant.C) @ w, atol=1e-12)
    np.testing.assert_allclose(m_u[0], 0.0)
    np.testing.assert_allclose(m_y[0], 0.0)
    # supports accumulate: strictly nondecreasing, finite (stable Phi)
    assert (np.diff(m_y[:, 0]) >= -1e-12).all()
    assert (np.diff(m_u[:, 0]) >= -1e-12).all()
    assert m_y.max() < 10.0


def test_per_stage_ybound_schedule_matches_constant():
    from pqp_for_mpc_tpu.models import condense

    H = 8
    s_const = dataclasses.replace(_spec(H), y_max=np.array([1.0],
                                                           np.float32))
    s_sched = dataclasses.replace(
        _spec(H), y_max=np.ones((H, 1), np.float32))
    a, b = condense(s_const), condense(s_sched)
    np.testing.assert_allclose(np.asarray(a.Kp), np.asarray(b.Kp))
    np.testing.assert_allclose(np.asarray(a.Gp), np.asarray(b.Gp))


def test_robust_loop_respects_bound_under_worst_case():
    from pqp_for_mpc_tpu.models import MPCController, robust_spec

    w_box = np.array([0.005, 0.02])
    spec = dataclasses.replace(_spec(24),
                               y_max=np.array([1.0], np.float32),
                               u_min=np.array([-2.0], np.float32),
                               u_max=np.array([2.0], np.float32),
                               du_max=np.array([2.0], np.float32))
    steps = 50

    # adversarial disturbance: always push position/velocity UP
    noise = lambda t: w_box.astype(np.float32)
    x0 = np.zeros(2, np.float32)

    nominal = MPCController(spec, warm_start="shift")
    out_n = nominal.rollout(x0, steps, noise=noise)
    # the nominal loop gets pushed over the bound
    assert out_n["x"][:, 0].max() > 1.0 + 1e-4, out_n["x"][:, 0].max()

    tight = MPCController(robust_spec(spec, w_box), warm_start="shift")
    out_r = tight.rollout(x0, steps, noise=noise)
    # the tightened loop never violates the ORIGINAL bound...
    assert out_r["x"][:, 0].max() <= 1.0 + 1e-4, out_r["x"][:, 0].max()
    # ...and still tracks usefully (backs off by ~the one-step margin)
    assert out_r["x"][-1, 0] > 0.85


def test_stagewise_matches_condensed_on_ybound_schedule():
    """(H, ny) output-bound SCHEDULES on the stage-wise backend: same
    U* as the condensed solver on the identical per-stage-tightened QP
    (round-5 item 1 — previously a NotImplementedError,
    stagewise.py:811)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve_batched
    from pqp_for_mpc_tpu.models import condense
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 24
    # a genuinely per-stage schedule: the bound tightens down the horizon
    y_max = np.linspace(1.1, 0.75, H, dtype=np.float32).reshape(H, 1)
    spec = dataclasses.replace(_spec(H), y_max=y_max,
                               r=np.array([1.05], np.float32))
    cfg = SolverConfig(max_iters=200_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-5, erj=1e-6, erc=1e-4, eac=1e-4,
                       strict_weak_duality=False)
    x0 = np.array([[0.4, -0.8], [0.0, 0.2]], np.float32)

    data = condense(spec)
    primal = data.assemble(x=jnp.asarray(x0), Qp=data.qp())
    ref = solve_batched(primal, dualize(primal,
                                        theta_floor=cfg.theta_floor), cfg=cfg)
    assert bool(np.asarray(ref.converged).all())

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    assert np.asarray(sd.y_max).shape == (H, 1)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    # agreement bar = the duality-gap certificate: both solvers stop at
    # |Jp+Jd| <= eaj, and strong convexity gives ||U - U*|| <=
    # sqrt(gap / lambda_min(Qp)) ~= sqrt(1e-5 / 0.05) ~= 1.4e-2; the
    # active tightened y-rows leave a weakly-determined U direction
    # (measured max|dU| = 7.4e-3 with costs agreeing to 1e-4 relative)
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=2e-4, atol=1e-4)
    # the schedule binds: predicted outputs respect the per-stage bound
    U = np.asarray(res.U)[:, 0].reshape(H, 1)
    x = x0[:, 0].astype(np.float64)
    A, B = np.asarray(spec.plant.A), np.asarray(spec.plant.B)
    C = np.asarray(spec.plant.C)
    ys = []
    for k in range(H):
        x = A @ x + B @ U[k]
        ys.append(C @ x)
    assert (np.array(ys) <= y_max + 2e-3).all()


def test_robust_loop_stagewise_respects_bound():
    """The condensed-path adversarial tube test on the STAGE-WISE
    backend: the flagship long-horizon backend and the tube machinery
    compose (round-5 item 1)."""
    from pqp_for_mpc_tpu.models import MPCController, robust_spec

    w_box = np.array([0.005, 0.02])
    spec = dataclasses.replace(_spec(32),
                               y_max=np.array([1.0], np.float32),
                               u_min=np.array([-2.0], np.float32),
                               u_max=np.array([2.0], np.float32),
                               du_max=np.array([2.0], np.float32))
    steps = 40
    noise = lambda t: w_box.astype(np.float32)
    x0 = np.zeros(2, np.float32)

    tight = MPCController(robust_spec(spec, w_box), backend="stagewise",
                          warm_start="shift")
    out_r = tight.rollout(x0, steps, noise=noise)
    assert out_r["x"][:, 0].max() <= 1.0 + 1e-4, out_r["x"][:, 0].max()
    assert out_r["x"][-1, 0] > 0.85


def test_robust_input_bounds_tightened():
    from pqp_for_mpc_tpu.models import robust_spec

    spec = _spec(12)
    r = robust_spec(spec, np.array([0.002, 0.01]))
    u_max = np.asarray(r.u_max)
    assert u_max.shape == (12, 1)
    assert u_max[0, 0] == pytest.approx(1.0)       # e_0 = 0, no margin
    assert (np.diff(u_max[:, 0]) <= 1e-7).all()    # tightens with k
    assert u_max[-1, 0] < 1.0


def test_impossible_tightening_raises():
    from pqp_for_mpc_tpu.models import robust_spec

    with pytest.raises(ValueError, match="consume"):
        robust_spec(_spec(40), np.array([0.5, 2.0]))


def test_rollout_jit_w_seq_matches_eager_noise():
    """MPCController.rollout_jit(w_seq=...) (round 5, the compiled
    vehicle for robust closed loops) reproduces the eager
    rollout(noise=...) loop on both backends."""
    from pqp_for_mpc_tpu.models import MPCController, robust_spec

    w_box = np.array([0.005, 0.02], np.float32)
    spec = dataclasses.replace(_spec(16),
                               y_max=np.array([1.0], np.float32),
                               u_min=np.array([-2.0], np.float32),
                               u_max=np.array([2.0], np.float32),
                               du_max=np.array([2.0], np.float32))
    steps = 12
    w_seq = np.broadcast_to(w_box, (steps, 2)).copy()
    for backend in ("condensed", "stagewise"):
        tight = robust_spec(spec, w_box)
        c1 = MPCController(tight, backend=backend, warm_start="shift")
        jit_out = c1.rollout_jit(np.zeros(2, np.float32), steps,
                                 w_seq=w_seq)
        c2 = MPCController(tight, backend=backend, warm_start="shift")
        eager = c2.rollout(np.zeros(2, np.float32), steps,
                           noise=lambda t: w_box)
        # both loops certify independently at MPC_CONFIG tolerances;
        # per-step solution differences at certificate scale compound
        # over the rollout (measured max 3.6e-4 over 12 steps)
        np.testing.assert_allclose(jit_out["x"], eager["x"],
                                   rtol=1e-3, atol=1e-3)
        assert jit_out["x"][:, 0].max() <= 1.0 + 1e-4
