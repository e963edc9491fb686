"""Per-stage weights (Qy_k, R_k) and the terminal state cost P.

The reference's cost is a single fixed (Qy, R) pair baked into its text
files; these are framework extensions (MPCSpec.Qy/R accepting (H, ...)
stacks, MPCSpec.P).  The bar: (a) the condensed QP cost must equal the
explicitly rolled-out cost including the terminal term, (b) condensed
and stage-wise backends must agree on U* for every weight form, (c) a
DARE-style terminal P must actually change the solution the way theory
says (longer effective horizon).
"""

import dataclasses

import numpy as np

from tests.test_ltv import _cfg, _condensed_solve, _ltv_spec


def _di_spec(H, **kw):
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator

    base = dict(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.1 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32))
    base.update(kw)
    return MPCSpec(**base)


def _rollout_cost(spec, x0, U):
    """f64 simulation of J = sum (y-r)'Qy_k(y-r) + u'R_k u + x_H'P x_H."""
    plant, H = spec.plant, spec.horizon
    nu = plant.n_input
    A, B, C = (np.asarray(m, np.float64)
               for m in (plant.A, plant.B, plant.C))
    Qy = np.asarray(spec.Qy, np.float64)
    R = np.asarray(spec.R, np.float64)
    r = np.asarray(spec.r, np.float64)
    x = np.asarray(x0, np.float64).reshape(-1).copy()
    J = 0.0
    for k in range(H):
        u = np.asarray(U, np.float64).reshape(-1)[k * nu:(k + 1) * nu]
        Ak = A[k] if A.ndim == 3 else A
        Bk = B[k] if B.ndim == 3 else B
        Ck = C[k] if C.ndim == 3 else C
        x = Ak @ x + Bk @ u
        e = Ck @ x - (r[k] if r.ndim == 2 else r)
        Qk = Qy[k] if Qy.ndim == 3 else Qy
        Rk = R[k] if R.ndim == 3 else R
        J += float(e @ Qk @ e + u @ Rk @ u)
    if spec.P is not None:
        P = np.asarray(spec.P, np.float64)
        J += float(x @ P @ x)
    return J


def _qp_cost(data, primal, U):
    Qp = np.asarray(data.qp(), np.float64)
    U = np.asarray(U, np.float64).reshape(-1)
    return (0.5 * U @ Qp @ U + np.asarray(primal.Fp, np.float64) @ U
            + 0.5 * float(primal.Mp))


def test_condensed_cost_with_terminal_and_stage_weights():
    """Condensed QP cost == rolled-out cost for per-stage Qy/R stacks
    plus a terminal P, at arbitrary (infeasible-for-the-QP) U."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.mpc import condense

    H = 6
    rng = np.random.default_rng(3)
    Qys = np.stack([(0.5 + k / H) * np.eye(1) for k in range(H)]) \
        .astype(np.float32)
    Rs = np.stack([(0.05 + 0.02 * k) * np.eye(1) for k in range(H)]) \
        .astype(np.float32)
    Lp = rng.standard_normal((2, 2))
    P = (Lp @ Lp.T + np.eye(2)).astype(np.float32)      # PSD
    spec = _di_spec(H, Qy=Qys, R=Rs, P=P)
    data = condense(spec)
    x0 = np.array([1.3, -0.4], np.float32)
    U = rng.uniform(-1, 1, H).astype(np.float32)
    primal = data.assemble(x=jnp.asarray(x0),
                           D=jnp.zeros(H, jnp.float32))
    J_qp = _qp_cost(data, primal, U)
    J_sim = _rollout_cost(spec, x0, U)
    assert abs(J_qp - J_sim) <= 1e-4 * max(1.0, abs(J_sim))


def test_terminal_p_backends_agree():
    """Condensed vs stage-wise U* with a strong terminal P on an LTV
    plant (every generalized path at once)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 12
    rng = np.random.default_rng(5)
    Lp = rng.standard_normal((2, 2))
    P = (4.0 * (Lp @ Lp.T) + 2.0 * np.eye(2)).astype(np.float32)
    spec = dataclasses.replace(_ltv_spec(H, seed=4), P=P)
    x0 = np.array([[1.0], [0.6]], np.float32)
    cfg = _cfg()
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)

    # and P must matter: dropping it changes the plan
    ref0, _ = _condensed_solve(dataclasses.replace(spec, P=None), x0, cfg)
    assert np.abs(np.asarray(ref0.U) - np.asarray(ref.U)).max() > 1e-3


def test_stage_weights_backends_agree():
    """Per-stage Qy/R stacks: condensed vs stage-wise U* parity, and
    the schedule must actually shape the plan vs constant weights."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 10
    Qys = np.stack([(0.2 + 1.6 * k / (H - 1)) * np.eye(1)
                    for k in range(H)]).astype(np.float32)
    Rs = np.stack([(0.15 - 0.01 * k) * np.eye(1)
                   for k in range(H)]).astype(np.float32)
    spec = _di_spec(H, Qy=Qys, R=Rs)
    x0 = np.array([[1.5], [0.0]], np.float32)
    cfg = _cfg()
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)

    flat, _ = _condensed_solve(_di_spec(H), x0, cfg)
    assert np.abs(np.asarray(flat.U) - np.asarray(ref.U)).max() > 1e-3


def test_dare_terminal_extends_horizon():
    """The textbook use: with P = the infinite-horizon cost-to-go
    (DARE), a SHORT horizon reproduces the long-horizon plan's first
    input far better than without it."""
    import jax.numpy as jnp

    # x0 chosen so u_0 is NOT bound-saturated (a clipped first input
    # hides the cost shaping)
    Hs, Hl = 4, 40
    x0 = np.array([[0.25], [-0.15]], np.float32)
    cfg = _cfg()
    spec_l = _di_spec(Hl)
    long_ref, _ = _condensed_solve(spec_l, x0, cfg)
    u_long = np.asarray(long_ref.U).reshape(-1)[0]

    from pqp_for_mpc_tpu.models import dare_terminal_weight
    P = dare_terminal_weight(spec_l.plant, spec_l.Qy, spec_l.R)

    with_p, _ = _condensed_solve(_di_spec(Hs, P=P), x0, cfg)
    without_p, _ = _condensed_solve(_di_spec(Hs), x0, cfg)
    err_with = abs(np.asarray(with_p.U).reshape(-1)[0] - u_long)
    err_without = abs(np.asarray(without_p.U).reshape(-1)[0] - u_long)
    assert err_with < 0.25 * err_without, (err_with, err_without)
    assert err_with < 0.05


def test_terminal_p_with_output_constraints():
    """P composes with (soft) output constraints on BOTH backends: the
    augmented cost rows must not leak into the constraint geometry."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 8
    P = np.array([[3.0, 0.5], [0.5, 2.0]], np.float32)
    spec = _di_spec(H, P=P,
                    y_max=np.array([0.8], np.float32),
                    soft_penalty=200.0)
    x0 = np.array([[1.0], [0.5]], np.float32)
    cfg = _cfg(eaj=1e-3, erj=1e-4, erc=1e-4, eac=1e-4)
    ref, primal = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    # the condensed soft primal is [U; s+; s-]; compare the input block
    np.testing.assert_allclose(np.asarray(res.U),
                               np.asarray(ref.U)[:H], rtol=2e-3, atol=4e-3)


def test_relinearize_preserves_terminal_p():
    """relinearize must carry P through to the rebuilt factor (the RTI
    loop's stability certificate survives relinearization)."""
    import jax
    from pqp_for_mpc_tpu.models.stagewise import relinearize, stagewise_dual

    H = 6
    P = np.array([[2.0, 0.3], [0.3, 1.5]], np.float32)
    spec = dataclasses.replace(_ltv_spec(H, seed=6), P=P)
    sd0 = stagewise_dual(spec, theta_floor=5.0)
    np.testing.assert_allclose(np.asarray(sd0.factor.P), P)
    A2 = np.asarray(spec.plant.A) * 1.02
    B2 = np.asarray(spec.plant.B) * 0.98
    sd2 = relinearize(sd0, A2, B2)
    np.testing.assert_allclose(np.asarray(sd2.factor.P), P)

    # and it must equal a fresh build on the new plant
    plant2 = dataclasses.replace(spec.plant, A=A2, B=B2)
    spec2 = dataclasses.replace(spec, plant=plant2)
    sd_fresh = stagewise_dual(spec2, theta_floor=5.0, band=sd0.band)
    la = jax.tree_util.tree_leaves(sd2)
    lb = jax.tree_util.tree_leaves(sd_fresh)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_per_stage_input_bounds_backends_agree():
    """Per-stage (H, nu) input-bound schedules (actuator derating):
    both backends honor them and agree on U*."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 8
    # ramp the box down over the horizon; loosen slew late
    umax = np.linspace(1.0, 0.3, H)[:, None].astype(np.float32)
    spec = _di_spec(H, u_max=umax, u_min=-umax,
                    du_max=np.linspace(0.5, 0.2, H)[:, None]
                    .astype(np.float32))
    x0 = np.array([[1.5], [0.2]], np.float32)
    cfg = _cfg()
    ref, primal = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    U = np.asarray(ref.U).reshape(-1)
    # the schedule binds: every stage respects ITS OWN bound, and the
    # early stages exceed the late stages' tighter bound
    assert (np.abs(U) <= umax.reshape(-1) + 2e-3).all()
    assert np.abs(U[0]) > 0.3 + 1e-3

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U).reshape(-1), U,
                               rtol=1e-3, atol=2e-3)
