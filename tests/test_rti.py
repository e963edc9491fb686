"""RTIController and relinearize: the jitted nonlinear-MPC path.

``relinearize`` must be indistinguishable from a fresh
``stagewise_dual`` build on the new plant (same band): the RTI
controller's correctness rests on that equivalence, so it is pinned
field-by-field here.  The controller itself is smoke-tested on the
swing-up pendulum (examples/nonlinear_mpc.py's plant) and its eager
``step`` path is pinned against the compiled ``rollout``.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu import SolverConfig

DT = 0.05
G_OVER_L = 10.0
DAMPING = 0.1


def _f_disc(x, u):
    def f_cont(x, u):
        th, w = x[0], x[1]
        return jnp.stack([w, G_OVER_L * jnp.sin(th) - DAMPING * w + u[0]])
    k1 = f_cont(x, u)
    k2 = f_cont(x + 0.5 * DT * k1, u)
    k3 = f_cont(x + 0.5 * DT * k2, u)
    k4 = f_cont(x + DT * k3, u)
    return x + (DT / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _pendulum_spec(H, du_max=6.0, u_prev=None):
    from pqp_for_mpc_tpu.models import LTVPlant, MPCSpec

    A = np.asarray(jax.jacobian(_f_disc, argnums=0)(
        jnp.zeros(2), jnp.zeros(1)))
    B = np.asarray(jax.jacobian(_f_disc, argnums=1)(
        jnp.zeros(2), jnp.zeros(1)))
    plant = LTVPlant(A=np.tile(A[None], (H, 1, 1)).astype(np.float32),
                     B=np.tile(B[None], (H, 1, 1)).astype(np.float32),
                     E=np.tile(np.eye(2, dtype=np.float32)[None],
                               (H, 1, 1)),
                     C=np.tile(np.array([[[1.0, 0.0]]], np.float32),
                               (H, 1, 1)),
                     name="pendulum")
    return MPCSpec(plant=plant, horizon=H,
                   Qy=np.eye(1, dtype=np.float32),
                   R=0.02 * np.eye(1, dtype=np.float32),
                   r=np.zeros(1, np.float32),
                   u_min=np.array([-12.0], np.float32),
                   u_max=np.array([12.0], np.float32),
                   du_max=np.array([du_max], np.float32),
                   u_prev=u_prev)


def _cfg():
    return SolverConfig(max_iters=20_000, check_every=8, accel_every=4,
                        y0=0.01, eaj=1e-3, erj=1e-4, erc=1e-4, eac=1e-4,
                        strict_weak_duality=False)


def _assert_duals_match(sd_a, sd_b, atol=2e-5, rtol=2e-5):
    assert sd_a.band == sd_b.band
    assert sd_a.n_con == sd_b.n_con
    assert sd_a.soft_rho == sd_b.soft_rho
    la, lb = jax.tree_util.tree_leaves(sd_a), jax.tree_util.tree_leaves(sd_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol)


def test_relinearize_matches_fresh_build():
    """relinearize(sd0, A, B, ...) on NEW per-stage dynamics must equal
    stagewise_dual on a spec carrying those dynamics, at the same band
    (ADVICE r3: pin the _dual_blocks/_dual_assemble split)."""
    from pqp_for_mpc_tpu.models import LTVPlant, MPCSpec
    from pqp_for_mpc_tpu.models.stagewise import relinearize, stagewise_dual

    H = 10
    spec0 = _pendulum_spec(H)
    sd0 = stagewise_dual(spec0, theta_floor=5.0)

    # genuinely different per-stage dynamics: linearize along a swing
    rng = np.random.default_rng(7)
    xs = np.stack([np.array([2.5 * np.cos(0.3 * k), -0.7 * np.sin(0.3 * k)])
                   for k in range(H)]).astype(np.float32)
    us = rng.uniform(-3, 3, (H, 1)).astype(np.float32)
    jacs = jax.vmap(lambda x, u: (
        jax.jacobian(_f_disc, argnums=0)(x, u),
        jax.jacobian(_f_disc, argnums=1)(x, u)))
    A2, B2 = jacs(jnp.asarray(xs), jnp.asarray(us))
    u_prev2 = np.array([0.37], np.float32)

    sd_rel = relinearize(sd0, A2, B2, u_prev=u_prev2)

    plant2 = LTVPlant(A=np.asarray(A2), B=np.asarray(B2),
                      E=np.asarray(spec0.plant.E),
                      C=np.asarray(spec0.plant.C), name="p2")
    spec2 = dataclasses.replace(spec0, plant=plant2, u_prev=u_prev2)
    sd_fresh = stagewise_dual(spec2, theta_floor=5.0, band=sd0.band)

    _assert_duals_match(sd_rel, sd_fresh)


def test_relinearize_under_jit_matches_eager():
    from pqp_for_mpc_tpu.models.stagewise import relinearize, stagewise_dual

    H = 8
    spec = _pendulum_spec(H)
    sd0 = stagewise_dual(spec, theta_floor=5.0)
    A = np.asarray(spec.plant.A) * 1.01
    B = np.asarray(spec.plant.B) * 0.99
    eager = relinearize(sd0, A, B)
    jitted = jax.jit(lambda a, b: relinearize(sd0, a, b))(A, B)
    _assert_duals_match(eager, jitted, atol=1e-6, rtol=1e-6)


def test_relinearize_infinite_du_max_no_nan():
    """+inf du_max (slew bounds disabled) must not poison u_prev via
    the old inf-minus-inf Kp recovery (ADVICE r3 low): u_prev now lives
    on StagewiseDual."""
    from pqp_for_mpc_tpu.models.stagewise import relinearize, stagewise_dual

    H = 6
    u_prev = np.array([0.5], np.float32)
    spec = _pendulum_spec(H, du_max=np.inf, u_prev=u_prev)
    sd0 = stagewise_dual(spec, theta_floor=5.0)
    np.testing.assert_allclose(np.asarray(sd0.u_prev), u_prev)

    sd2 = relinearize(sd0, np.asarray(spec.plant.A),
                      np.asarray(spec.plant.B))
    np.testing.assert_allclose(np.asarray(sd2.u_prev), u_prev)
    for leaf in jax.tree_util.tree_leaves(sd2):
        assert not np.isnan(np.asarray(leaf)).any()
    # the slew rows stay disabled (+inf bound), not NaN
    assert np.isposinf(np.asarray(sd2.Kp[2])).all()
    assert np.isposinf(np.asarray(sd2.Kp[3])).all()


def test_rti_rollout_swings_up_pendulum():
    """20-step smoke: every QP certifies and |theta| shrinks (the
    ADVICE r3 medium item: rti.py had no automated coverage)."""
    from pqp_for_mpc_tpu.models import RTIController

    ctrl = RTIController(_f_disc, _pendulum_spec(16), cfg=_cfg(),
                         sqp_iters=2)
    out = ctrl.rollout(np.array([2.5, 0.0], np.float32), 20)
    assert out["converged"].all()
    assert abs(out["x"][-1, 0]) < 1.25   # halfway down from 2.5 rad
    assert abs(out["x"][-1, 0]) < abs(out["x"][4, 0])
    # feasibility is certified to max(erc*Kp, eac) = 1.2e-3 (the
    # reference's relative test, PQP_CPU.c:632-641)
    assert np.abs(out["u"]).max() <= 12.0 + 1.5e-3


def test_rti_step_matches_rollout():
    """The eager step() path and the compiled rollout() must produce
    the same closed loop (same warm-start threading)."""
    from pqp_for_mpc_tpu.models import RTIController

    x0 = np.array([1.2, -0.3], np.float32)
    steps = 6
    ctrl = RTIController(_f_disc, _pendulum_spec(12), cfg=_cfg())
    out = ctrl.rollout(x0, steps)

    ctrl.reset()
    x = jnp.asarray(x0)
    for t in range(steps):
        u0, res = ctrl.step(x)
        x = _f_disc(x, u0)
        np.testing.assert_allclose(np.asarray(u0), out["u"][t],
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x), out["x"][t],
                                   atol=1e-5, rtol=1e-5)


def test_controller_uprev_kp_rows_stay_in_sync():
    """The stagewise controller moves the slew anchor by rewriting Kp
    rows; the stored u_prev field must move with them so a later
    relinearize (which reads the field) keeps the moved bounds
    (code-review r4 finding: stale-anchor silent revert)."""
    from pqp_for_mpc_tpu.models import MPCController
    from pqp_for_mpc_tpu.models.stagewise import relinearize

    spec = _pendulum_spec(8)
    ctrl = MPCController(spec, backend="stagewise")
    up = np.array([0.73], np.float32)
    sd = ctrl._sd_with_uprev(up)
    np.testing.assert_allclose(np.asarray(sd.u_prev), up, atol=1e-6)
    sd2 = relinearize(sd, np.asarray(spec.plant.A),
                      np.asarray(spec.plant.B))
    # rebuilt Kp rows reflect the MOVED anchor: Kp[2,0]-Kp[3,0] = 2 up
    got = 0.5 * (np.asarray(sd2.Kp[2, 0]) - np.asarray(sd2.Kp[3, 0]))
    np.testing.assert_allclose(got, up, atol=1e-5)
