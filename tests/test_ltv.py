"""Time-varying (LTV) plants and per-stage references, both backends.

The reference solves exactly one precondensed LTI instance
(PQP_CPU.c:757-930); the LTV surface (`models/plants.LTVPlant`) is the
framework extension that successive linearization of a nonlinear plant
needs (examples/nonlinear_mpc.py).  The bar for every test: the LTV
machinery must agree with (a) brute-force simulation, (b) the LTI path
on a stacked-constant plant, and (c) the dense condensed algebra on a
genuinely time-varying plant — through prediction, factorization, and
both solvers.
"""

import dataclasses

import numpy as np


def _ltv_plant(H, seed=0, nu=1, nd=1):
    """A genuinely time-varying stable 2-state plant: damped rotations
    with stage-varying angle/damping, stage-varying B/E/C."""
    from pqp_for_mpc_tpu.models import LTVPlant

    rng = np.random.default_rng(seed)
    ks = np.arange(H)
    th = 0.25 + 0.5 * np.sin(0.37 * ks)
    rho = 0.85 + 0.1 * np.cos(0.23 * ks)
    A = np.stack([rho[k] * np.array([[np.cos(th[k]), -np.sin(th[k])],
                                     [np.sin(th[k]), np.cos(th[k])]])
                  for k in range(H)]).astype(np.float32)
    B = (0.5 + 0.25 * rng.standard_normal((H, 2, nu))).astype(np.float32)
    E = (0.2 * rng.standard_normal((H, 2, nd))).astype(np.float32)
    C = np.stack([np.array([[1.0 + 0.2 * np.sin(0.5 * k), 0.3]])
                  for k in range(H)]).astype(np.float32)
    return LTVPlant(A=A, B=B, E=E, C=C, name="ltv-test")


def _ltv_spec(H, seed=0, **kw):
    from pqp_for_mpc_tpu.models import MPCSpec

    return MPCSpec(
        plant=_ltv_plant(H, seed=seed), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32), **kw)


def _cfg(**kw):
    from pqp_for_mpc_tpu import SolverConfig

    base = dict(max_iters=100_000, check_every=8, accel_every=4,
                y0=0.01, eaj=1e-4, erj=1e-5, erc=1e-5, eac=1e-5,
                strict_weak_duality=False)
    base.update(kw)
    return SolverConfig(**base)


def _condensed_solve(spec, x0, cfg, dseq=None):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize, solve_batched
    from pqp_for_mpc_tpu.models.mpc import condense

    data = condense(spec)
    D = jnp.zeros(spec.horizon * spec.plant.n_dist, jnp.float32) \
        if dseq is None else jnp.asarray(dseq, jnp.float32).reshape(-1)
    primal = data.assemble(x=jnp.asarray(x0), D=D,
                           Qp=jnp.linalg.inv(data.Qp_inv))
    dual = dualize(primal, theta_floor=cfg.theta_floor,
                   precision=cfg.precision)
    return solve_batched(primal, dual, cfg=cfg), primal


def test_ltv_prediction_matrices_brute_force():
    """X = Sx x0 + Su U + Sd D reproduces step-by-step simulation of
    the time-varying dynamics."""
    from pqp_for_mpc_tpu.models.mpc import prediction_matrices

    H = 6
    plant = _ltv_plant(H, seed=1)
    Sx, Su, Sd = (np.asarray(m, np.float64)
                  for m in prediction_matrices(plant, H))
    rng = np.random.default_rng(2)
    for trial in range(3):
        x0 = rng.standard_normal(2).astype(np.float32)
        useq = rng.standard_normal((H, 1)).astype(np.float32)
        dseq = rng.standard_normal((H, 1)).astype(np.float32)
        xs, x = [], x0
        for k in range(H):
            x = plant.step(k, x, useq[k], dseq[k])
            xs.append(x)
        want = np.concatenate(xs)
        got = Sx @ x0 + Su @ useq.reshape(-1) + Sd @ dseq.reshape(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_stacked_lti_matches_lti_condense():
    """stack_plant(lti, H) through the LTV code path reproduces the LTI
    condensation exactly (same blocks, same dual geometry inputs)."""
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator, stack_plant
    from pqp_for_mpc_tpu.models.mpc import condense

    H = 10
    mk = lambda plant: MPCSpec(
        plant=plant, horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.array([0.3], np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32),
        y_min=np.array([-2.0], np.float32),
        y_max=np.array([2.0], np.float32))
    lti = mk(double_integrator())
    ltv = mk(stack_plant(double_integrator(), H))
    d1, d2 = condense(lti), condense(ltv)
    for name in ("Qp_inv", "Fp1", "Fp2", "Fp3", "Gp", "Kp", "Kx", "Kd"):
        a, b = getattr(d1, name), getattr(d2, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_ltv_riccati_kkt_matches_dense_inverse():
    """Qp^-1 v via the time-varying Riccati scans == dense inverse of
    the LTV condensed Hessian (the recursion's Qt_prev stagger is the
    load-bearing subtlety here)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.mpc import condense
    from pqp_for_mpc_tpu.models.stagewise import kkt_solve, riccati_factor

    H = 8
    spec = _ltv_spec(H, seed=3)
    f = riccati_factor(spec)
    data = condense(spec)
    Qp = np.linalg.inv(np.asarray(data.Qp_inv, np.float64))
    rng = np.random.default_rng(4)
    v = rng.standard_normal((H, 1, 3)).astype(np.float32)
    for pscan in (False, True):
        u = np.asarray(kkt_solve(f, jnp.asarray(v), pscan=pscan))
        want = np.linalg.solve(Qp, v.reshape(H, 3))
        np.testing.assert_allclose(u.reshape(H, 3), want,
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"pscan={pscan}")


def test_ltv_stagewise_matches_condensed():
    """Same U* and J* from both backends on a genuinely time-varying
    plant, batched initial states."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _ltv_spec(12, seed=5)
    rng = np.random.default_rng(6)
    x0 = rng.uniform(-2, 2, (2, 4)).astype(np.float32)
    cfg = _cfg()
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-4, atol=1e-4)


def test_ltv_disturbance_channel_matches_condensed():
    """Nonzero time-varying dseq through both backends — the channel the
    successive-linearization remainder rides (examples/nonlinear_mpc.py)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 10
    spec = _ltv_spec(H, seed=7)
    rng = np.random.default_rng(8)
    x0 = np.array([[1.5], [-0.5]], np.float32)
    dseq = (0.3 * rng.standard_normal((H, 1))).astype(np.float32)
    cfg = _cfg()
    ref, _ = _condensed_solve(spec, x0, cfg, dseq=dseq)
    assert bool(np.asarray(ref.converged).all())

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0),
                          dseq=jnp.asarray(dseq)[:, :, None], cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)


def test_per_stage_reference_constant_equals_vector():
    """r given as a constant (H, ny) stack solves identically to the
    (ny,) form — both backends."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    H = 10
    spec1 = _ltv_spec(H, seed=9)
    r2 = np.full((H, 1), 0.0, np.float32)
    spec2 = dataclasses.replace(spec1, r=r2)
    x0 = np.array([[1.0], [0.5]], np.float32)
    cfg = _cfg()
    a, _ = _condensed_solve(spec1, x0, cfg)
    b, _ = _condensed_solve(spec2, x0, cfg)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                               rtol=0, atol=0)
    sa = solve_stagewise(stagewise_dual(spec1), jnp.asarray(x0), cfg=cfg)
    sb = solve_stagewise(stagewise_dual(spec2), jnp.asarray(x0), cfg=cfg)
    np.testing.assert_allclose(np.asarray(sa.U), np.asarray(sb.U),
                               rtol=0, atol=0)


def test_per_stage_reference_trajectory_tracking():
    """A varying (H, ny) reference: backends agree, and the achieved
    outputs actually track the commanded trajectory."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    # Slot k tracks y_{k+1}: peak acceleration of the commanded sinusoid
    # is 0.8*(0.15/dt)^2 = 1.8 < u_max, so exact tracking is reachable.
    H = 16
    rtraj = (0.8 * np.sin(0.15 * (1 + np.arange(H))))[:, None] \
        .astype(np.float32)
    spec = MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=50.0 * np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=rtraj,
        u_min=np.array([-4.0], np.float32),
        u_max=np.array([4.0], np.float32),
        du_max=np.array([2.0], np.float32))
    x0 = np.zeros((2, 1), np.float32)
    # Qy=50 scales the cost ~50x, so the float32 duality-gap floor
    # scales with it — certify at correspondingly relaxed tolerances
    cfg = _cfg(eaj=1e-3, erj=1e-4, erc=1e-4, eac=1e-4)
    ref, primal = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)
    # simulate the plan and check mid-horizon tracking (ends drift: the
    # finite-horizon cost trades the last stages against input effort)
    plant = spec.plant
    A, B = np.asarray(plant.A), np.asarray(plant.B)
    C = np.asarray(plant.C)
    x = x0[:, 0]
    ys = []
    for k in range(H):
        x = A @ x + B @ np.asarray(res.U).reshape(H, 1)[k]
        ys.append(C @ x)
    # the from-rest transient decays over ~6 slots (velocity must ramp
    # under the slew bound); mid-horizon the plan locks on to ~1e-3
    err = np.abs(np.stack(ys) - rtraj)[8:H - 3]
    assert err.max() < 0.01, err.max()


def test_ltv_output_constraints_match_condensed():
    """Hard y-bounds with per-stage C through both backends."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    # Track r=0.6 but cap outputs at 0.42: the unconstrained plan from
    # this x0 reaches 0.55, so the cap is ACTIVE at several slots while
    # staying reachable (large x0 makes the slot-0 output unreachable
    # below ~1.05 under the stage-0 slew bound — the dual correctly
    # diverges on such specs, which is not what this test is about)
    spec = dataclasses.replace(
        _ltv_spec(10, seed=10,
                  y_min=np.array([-0.42], np.float32),
                  y_max=np.array([0.42], np.float32)),
        r=np.array([0.6], np.float32))
    x0 = np.array([[0.4], [0.1]], np.float32)
    cfg = _cfg(erc=1e-4, eac=1e-4)
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=2e-3, atol=4e-3)


def test_ltv_controller_step_works_rollout_guarded():
    """MPCController accepts an LTV spec for per-step solves (the
    successive-linearization usage pattern); the fixed-(A, B) rollout
    paths refuse it with a pointer to the right usage."""
    import pytest

    from pqp_for_mpc_tpu.models import MPCController

    spec = _ltv_spec(8, seed=11)
    for backend in ("condensed", "stagewise"):
        ctl = MPCController(spec, cfg=_cfg(), backend=backend)
        u0, res = ctl.step(np.array([1.0, -0.3], np.float32))
        assert bool(np.asarray(res.converged).all()), backend
        assert np.asarray(u0).size == 1           # (nu, B) = (1, 1)
        assert abs(float(np.asarray(u0).reshape(-1)[0])) <= 1.0 + 1e-5
        with pytest.raises(NotImplementedError):
            ctl.rollout(np.array([1.0, -0.3], np.float32), steps=3)


def test_ltv_pscan_solve_matches_sequential():
    """Temporal parallelization on a time-varying plant: pscan and
    sequential solves produce the same trajectory."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _ltv_spec(12, seed=12)
    x0 = np.array([[1.0, -1.5], [0.2, 0.7]], np.float32)
    cfg = _cfg()
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    a = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg, pscan=False)
    b = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg, pscan=True)
    assert bool(np.asarray(a.converged).all())
    assert bool(np.asarray(b.converged).all())
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                               rtol=1e-3, atol=1e-3)
