"""Steady-state Kalman filtering for output-feedback MPC.

The reference assumes the full state arrives by file (``x.txt``,
PQP_CPU.c:757-930).  Real plants expose measurements ``y = C x + v``;
closing the MPC loop then needs a state estimator.  This module
provides the standard LTI answer — the steady-state (asymptotic)
Kalman filter — in the framework's house style:

* the GAIN is computed ONCE per plant on the HOST in float64 (value
  iteration on the filter DARE, same split as :func:`condense` /
  :func:`~pqp_for_mpc_tpu.models.mpc.dare_terminal_weight`: build
  accuracy is f64, device work is f32);
* the per-step update is pure jnp — one tiny matmul chain — so it
  composes into the same ``lax.scan`` closed loops as the controllers
  (an output-feedback rollout is ONE compiled graph: estimate →
  solve → actuate → measure).

Predict/correct form (current estimator):

    x_pred = A x_hat + B u
    x_hat+ = x_pred + L (y_next - C x_pred)

with ``L = P C' (C P C' + Rv)^-1`` and ``P`` the unique stabilizing
solution of the filter DARE
``P = A (P - P C'(C P C'+Rv)^-1 C P) A' + Qw``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu.models.plants import LinearPlant


def filter_dare(A, C, Qw, Rv, max_iters: int = 10_000,
                tol: float = 1e-12) -> np.ndarray:
    """Steady-state one-step prediction covariance ``P (ns, ns)`` —
    float64 value iteration on the filter DARE
    ``P = A (P - P C'(C P C'+Rv)^-1 C P) A' + Qw`` (host-side, once
    per plant).  Single source of truth for :func:`kalman_gain` and
    the MHE arrival priors (models/mhe.py); raises on non-convergence
    instead of silently returning a miscalibrated prior."""
    A = np.asarray(A, np.float64)
    C = np.asarray(C, np.float64)
    Qw = np.asarray(Qw, np.float64)
    Rv = np.asarray(Rv, np.float64)
    P = Qw.copy()
    for _ in range(max_iters):
        S = C @ P @ C.T + Rv
        K = np.linalg.solve(S, C @ P).T          # P C' S^-1
        P_next = A @ (P - K @ C @ P) @ A.T + Qw
        P_next = 0.5 * (P_next + P_next.T)
        if np.abs(P_next - P).max() <= tol * max(1.0, np.abs(P).max()):
            return P_next
        P = P_next
    raise ValueError("filter DARE value iteration did not converge "
                     "(undetectable (A, C)?)")


def kalman_gain(plant: LinearPlant, Qw, Rv,
                max_iters: int = 10_000,
                tol: float = 1e-12) -> np.ndarray:
    """Steady-state Kalman gain ``L (ns, ny)`` for
    ``x+ = A x + B u + w``, ``y = C x + v`` with ``cov(w) = Qw``,
    ``cov(v) = Rv`` (:func:`filter_dare` + one solve).  LTI only."""
    A = np.asarray(plant.A, np.float64)
    C = np.asarray(plant.C, np.float64)
    if A.ndim != 2:
        raise ValueError("kalman_gain needs an LTI plant")
    Rv = np.asarray(Rv, np.float64)
    P = filter_dare(A, C, Qw, Rv, max_iters=max_iters, tol=tol)
    S = C @ P @ C.T + Rv
    return np.linalg.solve(S, C @ P).T.astype(np.float32)


class KalmanFilter:
    """Steady-state Kalman filter with a jittable :meth:`step`.

    ``step(x_hat, u, y_next) -> x_hat_next`` is pure jnp and traceable:
    drop it into the same ``lax.scan`` as a controller step for a fully
    compiled output-feedback loop (see
    tests/test_estimator.py::test_output_feedback_closed_loop).
    """

    def __init__(self, plant: LinearPlant, Qw, Rv,
                 L: Optional[np.ndarray] = None):
        self.plant = plant
        self.L = jnp.asarray(L if L is not None
                             else kalman_gain(plant, Qw, Rv), jnp.float32)
        self._A = jnp.asarray(plant.A, jnp.float32)
        self._B = jnp.asarray(plant.B, jnp.float32)
        self._E = jnp.asarray(plant.E, jnp.float32)
        self._C = jnp.asarray(plant.C, jnp.float32)

    def step(self, x_hat: jax.Array, u: jax.Array,
             y_next: jax.Array,
             d: Optional[jax.Array] = None) -> jax.Array:
        """One predict/correct update (see module docstring).  ``d``:
        optional KNOWN disturbance through the plant's E channel
        (disturbance-preview loops feed the previewed value here so the
        prediction does not misattribute it to estimation error)."""
        x_pred = self._A @ x_hat + self._B @ u
        if d is not None:
            x_pred = x_pred + self._E @ d
        return x_pred + self.L @ (y_next - self._C @ x_pred)
