"""Production-stack composition (VERDICT r4 item 6).

One compiled scan runs the full production loop — augmented-KF
estimation, offset-free targets, robust tube tightening, and
known-disturbance preview — on a disturbed plant, and the claims made
separately by each feature's own tests hold COMPOSED:

* the realized output respects the ORIGINAL bound under a worst-case
  admissible process disturbance (robust_spec's guarantee),
* the loop settles offset-free at the reference despite a constant
  unmeasured input disturbance (OffsetFreeController's guarantee),
* the previewed known disturbance is compensated (preview's guarantee),
* every step certifies (retry_cold's guarantee).

This converts README's "every controller feature applies unchanged to a
tightened spec" from a claim into a regression guarantee.
"""

import numpy as np

import pytest


def _plant():
    """Double integrator with a REAL disturbance channel (E = B here,
    so previewed disturbances are exactly cancellable — the residual
    tracking ripple is the R-weighted optimum, not a defect)."""
    from pqp_for_mpc_tpu.models.plants import LinearPlant
    dt = 0.1
    return LinearPlant(A=np.array([[1, dt], [0, 1]], np.float32),
                       B=np.array([[0.5 * dt * dt], [dt]], np.float32),
                       E=np.array([[0.005], [0.1]], np.float32),
                       C=np.array([[1.0, 0.0]], np.float32),
                       name="di_e")


def _spec(r=0.95):
    from pqp_for_mpc_tpu.models import MPCSpec
    return MPCSpec(plant=_plant(), horizon=20,
                   Qy=np.eye(1, dtype=np.float32),
                   R=0.05 * np.eye(1, dtype=np.float32),
                   r=np.array([r], np.float32),
                   u_min=np.array([-3.0], np.float32),
                   u_max=np.array([3.0], np.float32),
                   du_max=np.array([3.0], np.float32),
                   y_max=np.array([1.0], np.float32))


W_BOX = np.array([0.003, 0.012])
STEPS = 80


def _disturbances(steps=STEPS, H=20):
    """Worst-case-style admissible process noise (box-corner blocks,
    switching faster than the estimator absorbs) + a known sinusoid
    forecast + a constant unmeasured input disturbance."""
    t = np.arange(steps)
    blocks = np.where((t // 8) % 2 == 0, 1.0, -1.0)[:, None]
    w_seq = (blocks * W_BOX[None, :]).astype(np.float32)
    d_fc = 0.5 * np.sin(0.15 * np.arange(steps + H))[:, None]
    return w_seq, d_fc.astype(np.float32), np.array([0.4], np.float32)


def test_production_stack_holds_all_guarantees():
    from pqp_for_mpc_tpu.models import OffsetFreeController, robust_spec

    w_seq, d_fc, d_true = _disturbances()
    # design box inflated 1.3x over the true |w| bound: the tube is
    # re-anchored from the ESTIMATE each step, so estimation error
    # (the KF's lag on the block-switching w) consumes part of the
    # margin — covering it by inflation is the standard practice
    # (measured: 1.0x margin leaves max y = 0.9989, razor thin)
    # r = 0.92 keeps the reference BELOW the tightened bound floor
    # (~0.934 at 1.3x margins) so offset-free settling stays exact;
    # the nominal-violation contrast below uses the spicier r = 0.95
    tight = robust_spec(_spec(0.92), 1.3 * W_BOX)
    ctrl = OffsetFreeController(tight, kind="input", retry_cold=True)
    out = ctrl.rollout_jit(np.zeros(2, np.float32), STEPS, d_true,
                           w_seq=w_seq, d_forecast=d_fc)
    y = out["x"][:, 0]

    # every step certified (retry_cold composes through the tightening)
    assert out["converged"].all()
    # robust: the ORIGINAL output bound holds under the admissible
    # worst-case disturbance for the WHOLE trajectory
    assert y.max() <= 1.0 + 1e-4, y.max()
    # offset-free: the constant unmeasured input disturbance is
    # estimated and rejected — mean output over a full preview period
    # sits at the reference
    # (d_hat legitimately swings +-0.12 WITH the block disturbance —
    # the input-kind model sees w ~ B * delta as an input equivalent —
    # so the pin is its mean over a full +/- block period)
    np.testing.assert_allclose(out["d_hat"][-16:].mean(), d_true,
                               atol=0.02)
    assert abs(y[-42:].mean() - 0.92) < 0.02, y[-42:].mean()
    # the loop still tracks usefully (margins did not freeze it)
    assert y[-42:].min() > 0.82


def test_nominal_stack_violates_where_tightened_does_not():
    """Same loop WITHOUT the tube tightening: the worst-case
    disturbance pushes the output over the original bound — the
    tightening is load-bearing in the composition, not decorative."""
    from pqp_for_mpc_tpu.models import OffsetFreeController

    w_seq, d_fc, d_true = _disturbances()
    ctrl = OffsetFreeController(_spec(), kind="input", retry_cold=True)
    out = ctrl.rollout_jit(np.zeros(2, np.float32), STEPS, d_true,
                           w_seq=w_seq, d_forecast=d_fc)
    assert out["converged"].all()
    assert out["x"][:, 0].max() > 1.0 + 3e-3, out["x"][:, 0].max()


def test_preview_earns_its_place_in_the_stack():
    """Composed tracking error with the forecast fed is measurably
    smaller than with the same disturbance unannounced (folded into
    the realized truth but invisible to the solver)."""
    from pqp_for_mpc_tpu.models import OffsetFreeController, robust_spec

    w_seq, d_fc, d_true = _disturbances()
    tight = robust_spec(_spec(0.92), 1.3 * W_BOX)
    E = np.array([[0.005], [0.1]])

    ctrl = OffsetFreeController(tight, kind="input", retry_cold=True)
    with_fc = ctrl.rollout_jit(np.zeros(2, np.float32), STEPS, d_true,
                               w_seq=w_seq, d_forecast=d_fc)
    # unannounced: the same E @ d enters the truth as extra w
    w_plus = w_seq + (d_fc[:STEPS] @ E.T).astype(np.float32)
    no_fc = ctrl.rollout_jit(np.zeros(2, np.float32), STEPS, d_true,
                             w_seq=w_plus)
    r = 0.92
    rms = lambda y: float(np.sqrt(((y[-42:, 0] - r) ** 2).mean()))
    assert rms(with_fc["x"]) < 0.6 * rms(no_fc["x"]), \
        (rms(with_fc["x"]), rms(no_fc["x"]))


def test_composition_on_stagewise_backend():
    """The same composed stack rides the stage-wise backend (the
    (H, ny)-schedule support landed this round) — certified, bound
    respected."""
    from pqp_for_mpc_tpu.models import OffsetFreeController, robust_spec

    w_seq, d_fc, d_true = _disturbances()
    tight = robust_spec(_spec(0.92), 1.3 * W_BOX)
    ctrl = OffsetFreeController(tight, kind="input", retry_cold=True,
                                backend="stagewise")
    out = ctrl.rollout_jit(np.zeros(2, np.float32), STEPS, d_true,
                           w_seq=w_seq, d_forecast=d_fc)
    y = out["x"][:, 0]
    assert out["converged"].all()
    assert y.max() <= 1.0 + 1e-3, y.max()
    assert abs(y[-42:].mean() - 0.92) < 0.02
