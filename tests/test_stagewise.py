"""Sparse stage-wise PQP vs the condensed path (VERDICT r1 item 1).

The stage-wise solver must reproduce the condensed solver's U* on the
same MPCSpec (identical QP, different linear algebra), and scale to
H = 512 with memory linear in H."""

import numpy as np
import pytest


def _spec(H=12, du=0.5, u_prev=None):
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator

    return MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([du], np.float32),
        u_prev=u_prev)


def _condensed_solve(spec, x0, cfg):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize, solve_batched
    from pqp_for_mpc_tpu.models.mpc import condense

    data = condense(spec)
    primal = data.assemble(x=jnp.asarray(x0),
                           Qp=jnp.linalg.inv(data.Qp_inv))
    dual = dualize(primal, theta_floor=cfg.theta_floor,
                   precision=cfg.precision)
    return solve_batched(primal, dual, cfg=cfg), primal


def test_kkt_solve_matches_dense_inverse():
    """Qp^-1 v via the Riccati scans == dense inverse of the condensed
    Hessian."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.mpc import condense
    from pqp_for_mpc_tpu.models.stagewise import kkt_solve, riccati_factor

    spec = _spec(H=8)
    f = riccati_factor(spec)
    data = condense(spec)
    Qp_inv = np.asarray(data.Qp_inv, np.float64)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((8, 1, 3)).astype(np.float32)
    u = np.asarray(kkt_solve(f, jnp.asarray(v)))
    want = Qp_inv @ v.reshape(8, 3)
    np.testing.assert_allclose(u.reshape(8, 3), want, rtol=1e-4, atol=1e-5)


def test_qd_diag_matches_condensed():
    """r_i^2 (Cauchy-Schwarz radii) equals diag(Qd) of the condensed
    dual, and theta dominates the condensed theta."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize
    from pqp_for_mpc_tpu.models.mpc import condense
    from pqp_for_mpc_tpu.models.stagewise import stagewise_dual

    spec = _spec(H=8)
    sd = stagewise_dual(spec)
    data = condense(spec)
    primal = data.assemble(Qp=jnp.linalg.inv(data.Qp_inv))
    dual = dualize(primal)
    qd_diag = np.diag(np.asarray(dual.Qd))
    r2 = np.asarray(sd.r_vec).reshape(-1) ** 2
    np.testing.assert_allclose(r2, qd_diag, rtol=2e-3, atol=1e-5)
    assert np.all(np.asarray(sd.theta).reshape(-1)
                  >= np.asarray(dual.theta) - 1e-3)


def test_stagewise_matches_condensed_solution():
    """Same U* as the condensed solver on a batch of initial states
    (the solvers iterate differently — the bar is the solution)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _spec(H=12)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-2, 2, (2, 4)).astype(np.float32)
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-4, erj=1e-5, erc=1e-5, eac=1e-5,
                       strict_weak_duality=False)
    ref, primal = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)
    # optimal costs agree
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-4, atol=1e-4)


def test_stagewise_with_slew_and_uprev():
    """Slew rows + nonzero u_prev: feasible solution honoring
    |u_0 - u_prev| <= du."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _spec(H=10, du=0.25, u_prev=np.array([0.5], np.float32))
    # feasibility slack 1e-4: with ~all slew rows active the float32
    # boundary noise is ~7e-5, and BOTH solvers (condensed and
    # stage-wise, identically) fail a 1e-5 slack forever
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-4, erj=1e-5, erc=1e-4, eac=1e-4,
                       strict_weak_duality=False)
    x0 = np.array([[2.0], [0.0]], np.float32)
    ref, _ = _condensed_solve(spec, x0, cfg)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all())
    U = np.asarray(res.U)[:, 0]
    assert abs(U[0] - 0.5) <= 0.25 + 1e-3      # slew vs u_prev honored
    assert np.abs(np.diff(U)).max() <= 0.25 + 1e-3
    np.testing.assert_allclose(U, np.asarray(ref.U)[:, 0],
                               rtol=1e-3, atol=2e-3)


def test_stagewise_long_horizon_linear_memory():
    """H = 512: the dense Qd would be (2048)^2 * 3 splits = 50 MB; the
    stage-wise path's biggest solver-state arrays are O(H).  Solve a
    double integrator and check the solution is feasible and optimal-ish
    (monotone gap)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _spec(H=512)
    # Round-2 floors at this horizon were erc=5e-3 with 20k iterations
    # (rank-1 split + forcing-scale recovery noise); the round-3
    # banded-exact split + momentum accel + operator-consistent
    # recovery certify erc=1e-4 cold in ~200 iterations (kappa(Qp) is
    # ~1.1e7 here — the f32 floor belongs to the small-magnitude dual
    # gradient, not to kappa; see stagewise.recover's docstring).
    cfg = SolverConfig(max_iters=2_000, check_every=16, accel_every=8,
                       y0=0.01, eaj=1e-2, erj=1e-3, erc=1e-4, eac=1e-4,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    x0 = np.array([[2.0], [0.0]], np.float32)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    assert int(np.asarray(res.iters).max()) <= 500, res.stats()
    U = np.asarray(res.U)[:, 0]
    # external audit: the certificate must be honest, not an artifact
    # of the solver's own arithmetic — evaluate G U - Kp in float64
    from pqp_for_mpc_tpu.models.stagewise import _flat, _g_apply
    GU = np.asarray(_flat(_g_apply(jnp.asarray(U.reshape(512, 1, 1)))))
    kp = np.asarray(_flat(sd.Kp[..., None]))
    true_viol = (GU.astype(np.float64) - kp.astype(np.float64)).max()
    assert true_viol <= 5e-4, true_viol
    assert np.abs(U).max() <= 1.0 + 5e-4
    # physical sanity: the state is driven toward the origin
    from pqp_for_mpc_tpu.models.stagewise import rollout_states
    xs = rollout_states(sd.factor, jnp.asarray(x0),
                        jnp.asarray(U.reshape(512, 1, 1)))
    assert abs(float(xs[-1, 0, 0])) < 0.1


def test_stagewise_h512_closed_loop_certified():
    """The flagship long-horizon capability (VERDICT r2 task 1): the
    H=512 double-integrator closed loop certifies EVERY step at
    stagewise_mpc_config tolerances 10x tighter than round 2's
    (erc=eac=eaj: 1e-2 -> 1e-3), with warm-shift + in-graph cold retry.
    Round 2 measured 33% certified at the looser tolerances with 13,486
    iters/step; the fix bundle brings ~30 iters/step."""
    from pqp_for_mpc_tpu.config import stagewise_mpc_config
    from pqp_for_mpc_tpu.models import MPCController

    spec = _spec(H=512)
    cfg = stagewise_mpc_config(512)
    assert cfg.erc <= 1.1e-3 and cfg.eaj <= 1.1e-3   # 10x round 2
    ctrl = MPCController(spec, cfg=cfg, backend="stagewise",
                         warm_start="shift", retry_cold=True)
    out = ctrl.rollout_jit(np.array([2.0, 0.0], np.float32), steps=10)
    assert bool(out["converged"].all()), out["iters"]
    assert out["iters"].mean() <= 500, out["iters"]


def _spec_y(H, y_max=1.9, du=0.5):
    """Double integrator tracking a reference ABOVE a position bound
    (r = 2.5, y <= 1.9): the unconstrained optimum would settle at the
    reference, so the bound is persistently active yet trivially
    feasible (output rows beyond the reference's input-only surface,
    PQP_CPU.c:941)."""
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator

    return MPCSpec(
        plant=double_integrator(), horizon=H,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.full(1, 2.5, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([du], np.float32),
        y_min=np.array([-y_max], np.float32),
        y_max=np.array([y_max], np.float32))


def test_stagewise_output_constraints_match_condensed():
    """VERDICT r2 task 6: the stage-wise path accepts output (state)
    constraints and reproduces the condensed solver's U* on an
    output-constrained spec where the y-rows are genuinely active
    (the tracking reference sits above the bound)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _spec_y(H=20)
    # erc=1e-3: the CONDENSED comparator's own f32 floor on this
    # instance (its dense recovery keeps the reference's float program;
    # the active y-rows put U hard on the box bound) — the bar here is
    # U* parity, not the stage-wise path's tighter floor
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-3, erj=1e-5, erc=1e-3, eac=1e-3,
                       strict_weak_duality=False)
    x0 = np.array([[1.0, -1.0], [0.2, -0.3]], np.float32)
    ref, primal = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all())

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    assert sd.n_con == 4 * 20 + 2 * 20
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    # U atol: two independently certified 1e-3 solutions of the same QP
    # may differ by ~sqrt(gap/lambda_min(Qp)) along near-flat directions
    # (tail inputs after the bound activates); the COST agreement below
    # is the sharp optimality comparison
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-2)
    # 1e-3: both backends certify the EXPLICIT gap here, whose float
    # noise (Md's catastrophic cancellation) masks true-gap differences
    # below ~1e-4 relative on this cost scale
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-3, atol=1e-3)
    # the output bound is genuinely active and honored: roll the states
    from pqp_for_mpc_tpu.models.stagewise import rollout_states
    xs = rollout_states(sd.factor, jnp.asarray(x0),
                        jnp.asarray(np.asarray(res.U).reshape(20, 1, 2)))
    y = np.asarray(xs)[:, 0, :]
    assert y.max() > 1.85            # the bound region is visited
    assert y.max() <= 1.9 + 1e-3     # and respected


def test_stagewise_output_constraints_long_horizon():
    """H=256 output-constrained solve, matrix-free (the condensed dual
    would be (4*256 + 2*256)^2 dense)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (rollout_states,
                                                  solve_stagewise,
                                                  stagewise_dual)

    spec = _spec_y(H=256)
    cfg = SolverConfig(max_iters=5_000, check_every=16, accel_every=8,
                       y0=0.01, eaj=1e-2, erj=1e-3, erc=5e-4, eac=5e-4,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    x0 = np.array([[1.0], [0.2]], np.float32)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    U = np.asarray(res.U)[:, 0]
    xs = rollout_states(sd.factor, jnp.asarray(x0),
                        jnp.asarray(U.reshape(256, 1, 1)))
    y = np.asarray(xs)[:, 0, 0]
    assert y.max() <= 1.9 + 2e-3, y.max()
    assert y[-1] > 1.7               # rides the active bound at the end
    assert np.abs(U).max() <= 1.0 + 1e-3


def test_stagewise_soft_outputs_match_condensed():
    """Slack-softened output constraints, matrix-free: the instance is
    INFEASIBLE under hard bounds (x0 = [1.8, 0.5] cannot brake inside
    y <= 1.9 under the slew-limited input — the hard dual diverges),
    so the soft QP is the only well-posed formulation; both backends
    must agree on it."""
    import dataclasses
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = dataclasses.replace(_spec_y(H=24), soft_penalty=50.0,
                               r=np.zeros(1, np.float32))
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-3, erj=1e-5, erc=1e-3, eac=1e-3,
                       strict_weak_duality=False)
    x0 = np.array([[1.8], [0.5]], np.float32)
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all()), ref.stats()

    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    assert sd.has_soft and sd.n_con == 4 * 24 + 4 * 24
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    # condensed U is [U; s] stacked (M + n_out rows); compare the input
    # part and the optimal costs
    U_ref = np.asarray(ref.U)[:24, :]
    np.testing.assert_allclose(np.asarray(res.U), U_ref,
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-3, atol=1e-3)
    # the soft bound is genuinely exceeded (that is what the slack buys)
    from pqp_for_mpc_tpu.models.stagewise import rollout_states
    xs = rollout_states(sd.factor, jnp.asarray(x0),
                        jnp.asarray(np.asarray(res.U).reshape(24, 1, 1)))
    assert np.asarray(xs)[:, 0, 0].max() > 1.9


def test_stagewise_mimo_matches_condensed():
    """nu > 1 / ny > 1 exercise the banded split's block structure
    (the (H, w, nu, nu) band tensors, channel-coupled slew rows, and —
    with output bounds — the mixed-width in/out band blocks): a
    3-input/3-output mass-spring-damper chain must reproduce the
    condensed solver's solution."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models import MPCSpec, mass_spring_damper
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    plant = mass_spring_damper(3)
    spec = MPCSpec(
        plant=plant, horizon=10,
        Qy=np.eye(3, dtype=np.float32),
        R=0.05 * np.eye(3, dtype=np.float32),
        r=np.array([0.3, -0.2, 0.1], np.float32),
        u_min=-np.ones(3, np.float32),
        u_max=np.ones(3, np.float32),
        du_max=0.4 * np.ones(3, np.float32),
        y_min=np.full(3, -0.25, np.float32),
        y_max=np.full(3, 0.25, np.float32))
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-3, erj=1e-5, erc=1e-3, eac=1e-3,
                       strict_weak_duality=False)
    rng = np.random.default_rng(4)
    # positions well inside the y-bound (it applies from stage 1, so an
    # initial position near ±0.25 would make the QP infeasible)
    x0 = np.concatenate([
        rng.uniform(-0.12, 0.12, (3, 2)),
        rng.uniform(-0.3, 0.3, (3, 2))]).astype(np.float32)
    ref, _ = _condensed_solve(spec, x0, cfg)
    assert bool(np.asarray(ref.converged).all()), ref.stats()
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    assert sd.n_con == 4 * 10 * 3 + 2 * 10 * 3
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-3, atol=1e-3)


def test_pscan_kkt_matches_sequential():
    """Temporal-parallel (associative-scan) KKT recursions == the
    sequential scans, for all three recursions (kkt_solve, rollout,
    forcing): same affine maps, different association order."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.models.stagewise import (kkt_solve,
                                                  riccati_factor,
                                                  rollout_states)

    spec = _spec(H=37)   # odd, non-power-of-two
    f = riccati_factor(spec)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((37, 1, 4)).astype(np.float32))
    u_seq = np.asarray(kkt_solve(f, v, pscan=False))
    u_par = np.asarray(kkt_solve(f, v, pscan=True))
    np.testing.assert_allclose(u_par, u_seq, rtol=1e-4, atol=1e-5)

    x0 = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    u = jnp.asarray(rng.standard_normal((37, 1, 4)).astype(np.float32))
    xs_seq = np.asarray(rollout_states(f, x0, u, pscan=False))
    xs_par = np.asarray(rollout_states(f, x0, u, pscan=True))
    np.testing.assert_allclose(xs_par, xs_seq, rtol=1e-4, atol=1e-5)


def test_pscan_solve_matches_sequential():
    """solve_stagewise(pscan=True) reproduces the sequential path's
    solution and convergence on a batch (H below the auto threshold so
    both modes are forced explicitly)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)

    spec = _spec(H=12)
    rng = np.random.default_rng(1)
    x0 = rng.uniform(-2, 2, (2, 4)).astype(np.float32)
    cfg = SolverConfig(max_iters=100_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-4, erj=1e-5, erc=1e-5, eac=1e-5,
                       strict_weak_duality=False)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    ref = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg, pscan=False)
    res = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg, pscan=True)
    assert bool(np.asarray(res.converged).all()), res.stats()
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.Jp), np.asarray(ref.Jp),
                               rtol=1e-4, atol=1e-4)
