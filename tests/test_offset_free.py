"""Offset-free MPC: disturbance estimation + targets + deviation solve.

The bar: (a) the precomputed target map satisfies the steady-state
equations to f64 accuracy; (b) the detectability rank check rejects the
classic undetectable pairing (output disturbance on an integrating
plant); (c) under a constant UNMEASURED disturbance the offset-free
loop drives the measured output to the reference while the nominal MPC
(same spec, no disturbance model) is left with a visible steady-state
offset; (d) both backends and both disturbance kinds work; (e) the
eager `control()` agrees with the compiled rollout's first step.
"""

import numpy as np

import jax.numpy as jnp
import pytest


def _spec(plant, H=20, r=1.0):
    from pqp_for_mpc_tpu.models import MPCSpec
    ny, nu = plant.n_output, plant.n_input
    return MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(ny, dtype=np.float32),
                   R=0.1 * np.eye(nu, dtype=np.float32),
                   r=np.full(ny, r, np.float32),
                   u_min=np.full(nu, -2.0, np.float32),
                   u_max=np.full(nu, 2.0, np.float32),
                   du_max=np.full(nu, 1.0, np.float32))


def test_target_maps_satisfy_equations():
    from pqp_for_mpc_tpu.models import quadruple_tank, target_maps
    from pqp_for_mpc_tpu.models.offset_free import disturbance_channels

    plant = quadruple_tank()
    rng = np.random.default_rng(0)
    for kind in ("output", "input"):
        Bd, Cd = disturbance_channels(plant, kind)
        Gd, Gr = target_maps(plant, Bd, Cd)
        A = np.asarray(plant.A, np.float64)
        B = np.asarray(plant.B, np.float64)
        C = np.asarray(plant.C, np.float64)
        for _ in range(3):
            d = rng.standard_normal(Bd.shape[1])
            r = rng.standard_normal(plant.n_output)
            t = np.asarray(Gd, np.float64) @ d + np.asarray(Gr,
                                                            np.float64) @ r
            x_ss, u_ss = t[:plant.n_state], t[plant.n_state:]
            np.testing.assert_allclose(
                A @ x_ss + B @ u_ss + Bd @ d, x_ss, atol=1e-4)
            np.testing.assert_allclose(C @ x_ss + Cd @ d, r, atol=1e-4)


def test_rank_check_rejects_output_dist_on_integrator():
    # double integrator: I - A is singular, so an output-disturbance
    # state is indistinguishable from the plant's own integrating mode
    from pqp_for_mpc_tpu.models import OffsetFreeController, \
        double_integrator

    with pytest.raises(ValueError, match="undetectable"):
        OffsetFreeController(_spec(double_integrator()), kind="output")


def test_too_many_disturbances_rejected():
    from pqp_for_mpc_tpu.models import double_integrator
    from pqp_for_mpc_tpu.models.offset_free import check_offset_free_rank

    plant = double_integrator()           # ny = 1
    Bd = np.eye(2)                        # nd = 2 > ny
    Cd = np.zeros((1, 2))
    with pytest.raises(ValueError, match="nd=2 > ny=1"):
        check_offset_free_rank(plant, Bd, Cd)


def _nominal_closed_loop(spec, d_true, steps):
    """Nominal full-state-feedback MPC under an unmodeled constant input
    disturbance: x+ = A x + B (u + d)."""
    from pqp_for_mpc_tpu.models import MPCController

    ctrl = MPCController(spec, warm_start="shift")
    plant = spec.plant
    A = np.asarray(plant.A)
    B = np.asarray(plant.B)
    C = np.asarray(plant.C)
    x = np.zeros(plant.n_state, np.float32)
    u_prev = np.zeros(plant.n_input, np.float32)
    ys = []
    for _ in range(steps):
        u0, _ = ctrl.step(jnp.asarray(x), u_prev=jnp.asarray(u_prev))
        u0 = np.asarray(u0).reshape(-1)
        x = A @ x + B @ (u0 + d_true)
        u_prev = u0
        ys.append(C @ x)
    return np.stack(ys)


def test_offset_free_rejects_input_disturbance():
    from pqp_for_mpc_tpu.models import OffsetFreeController, \
        double_integrator

    plant = double_integrator()
    spec = _spec(plant, H=20, r=1.0)
    d_true = np.array([0.3], np.float32)
    steps = 120

    ofc = OffsetFreeController(spec, kind="input")
    out = ofc.rollout_jit(np.zeros(2, np.float32), steps, d_true)
    assert out["converged"].all()
    y_tail = out["y"][-10:]
    assert np.abs(y_tail - 1.0).max() < 5e-3, y_tail[-1]
    # the estimator locked onto the true disturbance
    assert np.abs(out["d_hat"][-10:] - 0.3).max() < 5e-3
    # input respects the shifted box (|u| <= 2)
    assert np.abs(out["u"]).max() <= 2.0 + 1e-5

    # nominal MPC under the same disturbance keeps a visible offset
    y_nom = _nominal_closed_loop(spec, d_true, 60)
    nom_offset = np.abs(y_nom[-5:] - 1.0).mean()
    assert nom_offset > 10 * np.abs(y_tail - 1.0).mean()
    assert nom_offset > 2e-2, nom_offset


def test_output_disturbance_rollout():
    # quadruple tank (2 inputs / 2 outputs): constant sensor/output bias;
    # offset-free drives the MEASURED output to the reference
    from pqp_for_mpc_tpu.models import OffsetFreeController, quadruple_tank

    plant = quadruple_tank()
    spec = _spec(plant, H=30, r=0.2)
    d_true = np.array([0.1, -0.05], np.float32)
    ofc = OffsetFreeController(spec, kind="output")
    out = ofc.rollout_jit(np.zeros(4, np.float32), 250, d_true)
    assert out["converged"].all()
    y_tail = out["y"][-10:]
    assert np.abs(y_tail - 0.2).max() < 5e-3, y_tail[-1]
    assert np.abs(out["d_hat"][-10:] - d_true).max() < 5e-3


def test_stagewise_backend_offset_free():
    from pqp_for_mpc_tpu.models import OffsetFreeController, \
        double_integrator

    plant = double_integrator()
    spec = _spec(plant, H=32, r=1.0)
    ofc = OffsetFreeController(spec, kind="input", backend="stagewise")
    out = ofc.rollout_jit(np.zeros(2, np.float32), 100,
                          np.array([0.25], np.float32))
    assert out["converged"].all()
    assert np.abs(out["y"][-10:] - 1.0).max() < 1e-2
    assert np.abs(out["d_hat"][-10:] - 0.25).max() < 1e-2


def test_eager_control_matches_rollout_first_step():
    from pqp_for_mpc_tpu.models import OffsetFreeController, \
        double_integrator

    plant = double_integrator()
    spec = _spec(plant, H=16, r=0.5)
    d_true = np.array([0.1], np.float32)

    ofc = OffsetFreeController(spec, kind="input")
    out = ofc.rollout_jit(np.zeros(2, np.float32), 3, d_true)

    ofc2 = OffsetFreeController(spec, kind="input")
    u0, res = ofc2.control(np.zeros(2, np.float32),
                           np.zeros(1, np.float32))
    np.testing.assert_allclose(np.asarray(u0), out["u"][0], atol=1e-5)
    assert bool(np.asarray(res.converged).all())


def test_output_constrained_deviation_shift():
    # output bounds shift by y_ss in deviation coordinates: with a bound
    # just above the reference, the offset-free loop still settles at r
    # without violating the bound (checked on the measured output)
    import dataclasses
    from pqp_for_mpc_tpu.models import OffsetFreeController, \
        double_integrator

    plant = double_integrator()
    spec = dataclasses.replace(_spec(plant, H=20, r=1.0),
                               y_max=np.array([1.05], np.float32))
    ofc = OffsetFreeController(spec, kind="input")
    out = ofc.rollout_jit(np.zeros(2, np.float32), 120,
                          np.array([0.2], np.float32))
    assert out["converged"].all()
    assert np.abs(out["y"][-10:] - 1.0).max() < 5e-3
    assert out["y"].max() <= 1.05 + 1e-3, out["y"].max()
