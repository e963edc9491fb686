"""Operator-consistent condensed certification (VERDICT r4 item 8).

The identity ``Gp U - Kp = -(Qd Y + Fd)`` holds exactly for the
recovered primal; certifying feasibility through it measures the
residual at dual scale and drops the condensed backend's certification
floor by ~an order of magnitude (measured: H=128 at erc=1e-4 goes from
30% certified / 14k iters/step to 100% / 41 iters/step).
"""

import dataclasses

import numpy as np


def _spec(H):
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator
    return MPCSpec(plant=double_integrator(), horizon=H,
                   Qy=np.eye(1, dtype=np.float32),
                   R=0.05 * np.eye(1, dtype=np.float32),
                   r=np.zeros(1, np.float32),
                   u_min=np.array([-1.0], np.float32),
                   u_max=np.array([1.0], np.float32),
                   du_max=np.array([0.5], np.float32))


def test_identity_exact_in_f64():
    """Gp U - Kp == -(Qd Y + Fd) to f64 round-off on the condensed
    build (the algebra behind the certificate: substitute
    U = -Qp^-1(Fp + Gp'Y) into Qd/Fd's definitions,
    computeQd/computeFd PQP_CPU.c:440-460)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.models import condense

    data = condense(_spec(8))
    primal = data.assemble(x=jnp.asarray(np.array([1.0, -0.5],
                                                  np.float32)),
                           Qp=data.qp())
    dual = dualize(primal)
    rng = np.random.default_rng(0)
    Y = np.abs(rng.standard_normal((dual.n_con, 1))).astype(np.float64)
    Qp_i = np.asarray(primal.Qp_inv, np.float64)
    Gp = np.asarray(primal.Gp, np.float64)
    Fp = np.asarray(primal.Fp, np.float64).reshape(-1, 1)
    Kp = np.asarray(primal.Kp, np.float64).reshape(-1, 1)
    Qd = np.asarray(dual.Qd, np.float64)
    Fd = np.asarray(dual.Fd, np.float64).reshape(-1, 1)
    U = -Qp_i @ (Fp + Gp.T @ Y)
    lhs = Gp @ U - Kp
    rhs = -(Qd @ Y + Fd)
    # the identity is exact modulo the f32 storage of Qd/Fd themselves
    np.testing.assert_allclose(lhs, rhs, atol=5e-5)


def test_gradient_certificate_verdict_is_honest():
    """A verdict certified through the gradient form satisfies the
    ORIGINAL Gp U <= Kp + slack test when re-audited in float64 — the
    new certificate is not looser, it is less noisy."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.config import MPC_CONFIG
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.models import condense
    from pqp_for_mpc_tpu.solver import solve_batched

    cfg = dataclasses.replace(MPC_CONFIG, erc=1e-5, eac=1e-5,
                              feas_from_dual_gradient=True)
    data = condense(_spec(32))
    rng = np.random.default_rng(1)
    x = rng.uniform(-2, 2, (2, 8)).astype(np.float32)
    primal = data.assemble(x=jnp.asarray(x), Qp=data.qp())
    dual = dualize(primal, theta_floor=cfg.theta_floor)
    res = solve_batched(primal, dual, cfg=cfg)
    conv = np.asarray(res.converged)
    # cold starts at the 1e-5 floor: most lanes certify (the warm
    # closed-loop case below certifies ~all); audit the certified ones
    assert conv.sum() >= 6, res.stats()
    Gp = np.asarray(primal.Gp, np.float64)
    Kp = np.asarray(primal.Kp, np.float64).reshape(-1, 1)
    U = np.asarray(res.U, np.float64)[:, conv]
    viol = (Gp @ U - Kp[:, :1]).max(axis=0)
    # certified at erc=eac=1e-5; the f64 audit of the STORED f32 U must
    # track certificate + the f32 recovery/storage rounding of U itself
    # (measured <= 2.3e-5 here — the same property the stage-wise path
    # pins: the externally-audited violation tracks the certificate
    # instead of the old forcing-scale floor)
    assert (viol <= 1e-5 + 3e-5).all(), viol


def test_floor_improvement_pinned():
    """The measured contrast: at erc=1e-5, H=32, warm-shifted closed
    loop — the reference-program feasibility stalls most steps at
    max_iters while the gradient form certifies nearly all."""
    from pqp_for_mpc_tpu.config import MPC_CONFIG
    from pqp_for_mpc_tpu.models import MPCController

    spec = _spec(32)
    out = {}
    for flag in (False, True):
        cfg = dataclasses.replace(MPC_CONFIG, erc=1e-5, eac=1e-5,
                                  max_iters=20_000,
                                  feas_from_dual_gradient=flag)
        ctrl = MPCController(spec, cfg=cfg, warm_start="shift",
                             retry_cold=True)
        r = ctrl.rollout_jit(np.array([2.0, 0.0], np.float32), steps=20)
        out[flag] = (r["converged"].mean(), r["iters"].mean())
    assert out[True][0] >= 0.9, out
    assert out[False][0] <= 0.8, out
    # and it is cheaper, not just more certified
    assert out[True][1] < 0.5 * out[False][1], out
