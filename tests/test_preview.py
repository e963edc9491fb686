"""Known-disturbance preview (feedforward) in the jitted rollout.

The reference's example plant is disturbance-driven (the ambient
temperature ``D``, loaded from example/D.txt by PQP_CPU.c:757-930) but
its pipeline bakes one constant D into the forcing.  The framework's
``rollout_jit(d_forecast=...)`` gives every step its own preview window
inside the compiled scan.  The bar: the jitted preview path reproduces
the eager ``rollout(d_fn=...)`` loop exactly, both backends agree, and
a wrong-length forecast is rejected.
"""

import numpy as np

import pytest


def _spec(H=12, backend_plant="dc_motor"):
    from pqp_for_mpc_tpu.models import MPCSpec, dc_motor
    plant = dc_motor()
    return MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(1, dtype=np.float32),
                   R=0.05 * np.eye(1, dtype=np.float32),
                   r=np.array([0.5], np.float32),
                   u_min=np.array([-3.0], np.float32),
                   u_max=np.array([3.0], np.float32),
                   du_max=np.array([1.5], np.float32))


def _forecast(steps, H, nd=1):
    t = np.arange(steps + H, dtype=np.float32)
    return (0.05 * np.sin(0.3 * t) + 0.03)[:, None] * np.ones(
        (1, nd), np.float32)


def test_preview_matches_eager_rollout():
    from pqp_for_mpc_tpu.models import MPCController

    spec = _spec(H=12)
    steps = 15
    df = _forecast(steps, spec.horizon)

    ctrl_j = MPCController(spec, warm_start="shift")
    out_j = ctrl_j.rollout_jit(np.zeros(3, np.float32), steps,
                               d_forecast=df)

    ctrl_e = MPCController(spec, warm_start="shift")
    out_e = ctrl_e.rollout(np.zeros(3, np.float32), steps,
                           d_fn=lambda t: df[t:t + spec.horizon]
                           .reshape(-1))
    assert out_j["converged"].all()
    np.testing.assert_allclose(out_j["x"], out_e["x"], atol=2e-4)
    np.testing.assert_allclose(out_j["u"], out_e["u"], atol=2e-4)


def test_preview_condensed_vs_stagewise():
    from pqp_for_mpc_tpu.models import MPCController

    spec = _spec(H=16)
    steps = 20
    df = _forecast(steps, spec.horizon)
    x0 = np.zeros(3, np.float32)

    out_c = MPCController(spec, warm_start="shift").rollout_jit(
        x0, steps, d_forecast=df)
    out_s = MPCController(spec, warm_start="shift",
                          backend="stagewise").rollout_jit(
        x0, steps, d_forecast=df)
    assert out_c["converged"].all() and out_s["converged"].all()
    np.testing.assert_allclose(out_c["x"], out_s["x"], atol=2e-3)
    np.testing.assert_allclose(out_c["u"], out_s["u"], atol=2e-3)
    # the disturbance actually matters on this plant: the undisturbed
    # rollout differs visibly from the previewed one
    out_0 = MPCController(spec, warm_start="shift").rollout_jit(x0, steps)
    assert np.abs(out_0["x"] - out_c["x"]).max() > 1e-3


def test_preview_rejects_short_forecast():
    from pqp_for_mpc_tpu.models import MPCController

    spec = _spec(H=12)
    ctrl = MPCController(spec)
    with pytest.raises(ValueError, match="d_forecast needs"):
        ctrl.rollout_jit(np.zeros(3, np.float32), 10,
                         d_forecast=np.zeros((12, 1), np.float32))
