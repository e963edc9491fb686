"""Differentiable QP solving — gradients THROUGH the PQP solution.

New capability with no reference counterpart (the reference is a C
executable): because the solver lives inside JAX, we can expose the
optimal ``U*(Qp, Fp, Gp, Kp)`` as a differentiable function via implicit
differentiation of the KKT conditions at the converged active set,
enabling learning-based MPC (tuning cost weights / models by gradient
descent through the closed loop).

Math.  At the solution with active set ``A = {i : y*_i > 0}``::

    Qp U* + Fp + Gp_A' y_A = 0
    Gp_A U*               = Kp_A

Differentiating and eliminating with a masked KKT matrix (inactive rows
replaced by an identity block so shapes stay static)::

    K = [[Qp,        Gp' D_a],
         [D_a Gp,    -(I - D_a)]],     D_a = diag(active mask)

the VJP of ``U*`` w.r.t. each input is a single linear solve with ``K'``
(symmetric here).  This is the standard OptNet/implicit-diff construction
expressed with static shapes for jit/vmap.

The forward pass is NOT differentiated through the 300-iteration
multiplicative loop (which would be slow and numerically useless);
``custom_vjp`` swaps in the one-linear-solve backward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu.config import SolverConfig
from pqp_for_mpc_tpu.dual import dualize
from pqp_for_mpc_tpu.problem import PrimalQP
from pqp_for_mpc_tpu.solver import solve_batched


def _solve_forward_impl(Qp, Qp_inv, Fp, Gp, Kp, cfg: SolverConfig):
    Mp = jnp.zeros(Fp.shape[1:] or (), jnp.float32)
    primal = PrimalQP(Qp=Qp, Qp_inv=Qp_inv, Fp=Fp, Mp=Mp, Gp=Gp, Kp=Kp)
    dual = dualize(primal, theta_floor=cfg.theta_floor,
                   precision=cfg.precision)
    res = solve_batched(primal, dual, cfg=cfg)
    squeeze = Fp.ndim == 1
    U = res.U[:, 0] if squeeze else res.U
    Y = res.Y[:, 0] if squeeze else res.Y
    return U, Y


def _kkt_matrix(Qp, Gp, active):
    """Masked KKT matrix, static shape (M+N, M+N)."""
    M = Qp.shape[0]
    N = Gp.shape[0]
    Da = jnp.diag(active)
    top = jnp.concatenate([Qp, Gp.T @ Da], axis=1)
    bot = jnp.concatenate([Da @ Gp,
                           -(jnp.eye(N, dtype=Qp.dtype) - Da)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def solve_qp_implicit(Qp, Fp, Gp, Kp, cfg: SolverConfig = SolverConfig(),
                      active_tol: float = 1e-6):
    """Differentiable ``U*(Qp, Fp, Gp, Kp)`` for a single instance
    (vmap for batches).  Forward = the PQP solver; backward = one masked
    KKT solve.  ``active_tol`` thresholds ``y*`` for the active set."""
    Qp_inv = jnp.linalg.inv(Qp)
    U, _ = _solve_forward_impl(Qp, Qp_inv, Fp, Gp, Kp, cfg)
    return U


def _fwd(Qp, Fp, Gp, Kp, cfg, active_tol):
    Qp_inv = jnp.linalg.inv(Qp)
    U, Y = _solve_forward_impl(Qp, Qp_inv, Fp, Gp, Kp, cfg)
    return U, (Qp, Fp, Gp, Kp, U, Y)


def _bwd(cfg, active_tol, saved, gU):
    Qp, Fp, Gp, Kp, U, Y = saved
    M = Qp.shape[0]
    active = (Y > active_tol).astype(Qp.dtype)
    K = _kkt_matrix(Qp, Gp, active)
    rhs = jnp.concatenate([gU, jnp.zeros(Gp.shape[0], Qp.dtype)])
    # Least-squares (min-norm) solve: the active rows of Gp can be
    # linearly dependent at degenerate vertices (e.g. a box bound and a
    # slew bound active simultaneously), making K singular — a plain
    # solve then poisons the whole gradient with NaN.  The min-norm
    # solution is the standard regularized choice at such points.
    ridge = 1e-6 * jnp.eye(K.shape[0], dtype=K.dtype)
    z = jnp.linalg.solve(K @ K.T + ridge, K @ rhs)
    dU = z[:M]
    dlam = z[M:] * active          # only active multipliers move
    yA = Y * active
    # standard OptNet-style gradients:
    gQp = -0.5 * (jnp.outer(dU, U) + jnp.outer(U, dU))
    gFp = -dU
    gGp = -(jnp.outer(dlam, U) + jnp.outer(yA, dU))
    gKp = dlam
    return gQp, gFp, gGp, gKp


solve_qp_implicit.defvjp(_fwd, _bwd)
