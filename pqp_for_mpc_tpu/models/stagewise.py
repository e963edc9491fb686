"""Sparse (non-condensed) stage-wise PQP for long horizons.

The condensed formulation (models/mpc.py, mirroring the reference's
precomputed blocks, PQP_CPU.c:757-930) densifies at O((H*nu)^2): the
dual Hessian ``Qd = Gp Qp^-1 Gp'`` is a dense (4*H*nu)^2 matrix (the
reference hard-wires pHorizon=1 to dodge this, PQP_CPU.c:13-17).  This
module runs the SAME PQP algorithm with O(H) memory and O(H) work per
iteration by never materializing Qp, Qp^-1 or Qd:

* ``Qp^-1 v`` is an unconstrained LQR solve — a Riccati-factored
  backward/forward pair of ``lax.scan``s over stages (the classic
  banded-KKT elimination, expressed TPU-natively as scans with
  ``(ns, B)`` carries so every step is a small MXU matmul over the
  batch);
* ``Qd Y = G Qp^-1 (G' Y)`` where G (box + slew rows, the layout of
  models/mpc.py input_constraints) is applied as shifts/sign-flips;
* the PQP multiplicative update needs the ELEMENTWISE split
  ``Qd = Qd^+ - Qd^-`` — the one object that seems to force a dense
  Qd.  It does not: with ``Qd = W W'`` (W = G L^-T), Cauchy-Schwarz
  gives ``|Qd_ij| <= r_i r_j`` for ``r_i = ||w_i||_2 = sqrt(Qd_ii)``,
  so

      P = (r r' + Qd)/2 + diag(theta),  N = (r r' - Qd)/2 + diag(theta)

  is an elementwise-nonnegative split with ``P - N = Qd`` whose
  matvecs are a rank-1 term ``r (r'Y)`` plus one ``Qd Y`` apply —
  fully matrix-free.  ``N`` has an exactly zero diagonal
  (``Qd_ii = r_i^2``), and ``theta_i = max(rowsum(N)_i, floor)``
  dominates the reference's ``rowsum(Qd^-)`` rule (PQP_CPU.c:503-519)
  since ``N >= Qd^-`` elementwise, so the update keeps the PQP
  monotonicity guarantee; the looser split damps the update (slower
  per-iteration contraction), which the projected-gradient
  acceleration (``accel_every``, exact and matrix-free) compensates.

Cross-checks: matches the condensed solver's U* on the same MPCSpec
(tests/test_stagewise.py) at H <= 50; scales to H = 512 with memory
linear in H.

**Temporal parallelization** (``pscan``): every stage recursion here
(Riccati backward adjoint, forward rollout, forcing adjoint) is a
composition of affine maps ``x -> M_k x + c_k``, and affine composition
is associative — so each depth-H ``lax.scan`` has an equivalent
O(log H)-depth ``lax.associative_scan`` (Sarkka & Garcia-Fernandez,
"Temporal parallelization of dynamic programming and linear quadratic
control", IEEE TAC 2021).  On TPU this converts the per-PQP-iteration
KKT solve from 2H latency-bound tiny-matmul steps into ~log2(H) rounds
of batched ``(H, ns, ns)`` einsums that ride the MXU.
``solve_stagewise(pscan=None)`` auto-enables it at H >= 64.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pqp_for_mpc_tpu.config import SolverConfig
from pqp_for_mpc_tpu.models.mpc import MPCSpec
from pqp_for_mpc_tpu.problem import _pytree_dataclass
from pqp_for_mpc_tpu.solver import SolveResult


@_pytree_dataclass(meta_fields=("H", "ns", "nu", "ny"))
class StagewiseFactor:
    """Riccati factorization of the stage-wise primal Hessian Qp (the
    implicit analog of the reference's one-time Gauss_Jordan inverse,
    PQP_CPU.c:251-326): time-varying gains such that ``Qp^-1 v`` is one
    backward + one forward scan."""

    A: jax.Array        # (ns, ns)
    Bm: jax.Array       # (ns, nu)
    E: jax.Array        # (ns, nd)
    C: jax.Array        # (ny, ns)
    Qy: jax.Array       # (ny, ny)
    R: jax.Array        # (nu, nu)
    r: jax.Array        # (ny,)
    K: jax.Array        # (H, nu, ns)   feedback gains
    Hinv: jax.Array     # (H, nu, nu)   (R + B'P_{k+1}B)^-1
    W: jax.Array        # (H, ns, nu)   P_{k+1} B Hinv_k
    H: int = 0
    ns: int = 0
    nu: int = 0
    ny: int = 0


def riccati_factor(spec: MPCSpec) -> StagewiseFactor:
    """Backward Riccati recursion for the stage costs
    ``sum_{k=1..H} |C x_k - r|^2_Qy + sum_k |u_k|^2_R`` (the tracking
    cost of models/mpc.py).  O(H) scan of small dense ops."""
    plant = spec.plant
    A = jnp.asarray(plant.A, jnp.float32)
    B = jnp.asarray(plant.B, jnp.float32)
    E = jnp.asarray(plant.E, jnp.float32)
    C = jnp.asarray(plant.C, jnp.float32)
    Qy = jnp.asarray(spec.Qy, jnp.float32)
    R = jnp.asarray(spec.R, jnp.float32)
    # Reference cost convention (models/mpc.py): J = sum (y-r)'Qy(y-r)
    # + u'Ru = 1/2 U'Qp U + Fp'U + 1/2 Mp, i.e. Qp = 2*(Su'Qbar Su +
    # Rbar).  The Riccati recursion therefore runs on the DOUBLED stage
    # weights so kkt_solve applies the reference's Qp^-1 exactly;
    # Qy/R are stored unscaled for cost evaluation.
    Qt = 2.0 * (C.T @ Qy @ C)                            # (ns, ns)
    R2 = 2.0 * R

    def step(P, _):
        # P = P_{k+1}; emit gains for stage k
        BtP = B.T @ P
        Hk = R2 + BtP @ B
        Hinv = jnp.linalg.inv(Hk)
        K = Hinv @ BtP @ A
        W = P @ B @ Hinv
        P_new = Qt + A.T @ P @ A - A.T @ P @ B @ K
        P_new = 0.5 * (P_new + P_new.T)   # keep symmetric
        return P_new, (K, Hinv, W)

    with jax.default_matmul_precision("highest"):
        _, (K, Hinv, W) = lax.scan(step, Qt, None, length=spec.horizon)
    # scan emitted k = H-1 .. 0; store in forward order
    K = K[::-1]
    Hinv = Hinv[::-1]
    W = W[::-1]
    return StagewiseFactor(A=A, Bm=B, E=E, C=C, Qy=Qy, R=R,
                           r=jnp.asarray(spec.r, jnp.float32),
                           K=K, Hinv=Hinv, W=W, H=spec.horizon,
                           ns=plant.n_state, nu=plant.n_input,
                           ny=C.shape[0])


def _affine_cumulative(Ms: jax.Array, cs: jax.Array, precision=None):
    """Inclusive :func:`lax.associative_scan` of affine maps
    ``x -> M_i x + c_i`` along axis 0: position ``i`` holds the
    composition of steps ``0..i`` (step 0 applied first).

    This is the temporal-parallelization primitive (Sarkka &
    Garcia-Fernandez, IEEE TAC 2021: LQR/Kalman recursions are
    compositions of affine maps, and affine-map composition is
    associative): a depth-H sequential recursion becomes log2(H)
    rounds of batched ``(H, n, n)`` einsums — MXU-friendly instead of
    latency-bound.  ``Ms (H, n, n)``, ``cs (H, n, B)``."""
    def comb(a, b):
        Ma, ca = a
        Mb, cb = b
        M = jnp.einsum("...ij,...jk->...ik", Mb, Ma, precision=precision)
        c = jnp.einsum("...ij,...jb->...ib", Mb, ca,
                       precision=precision) + cb
        return (M, c)
    return lax.associative_scan(comb, (Ms, cs))


def _carry_in(ccum: jax.Array) -> jax.Array:
    """Exclusive-from-inclusive for a zero initial carry: the carry each
    step SEES is the previous step's cumulative value."""
    return jnp.concatenate([jnp.zeros_like(ccum[:1]), ccum[:-1]], axis=0)


def kkt_solve(f: StagewiseFactor, v: jax.Array,
              precision=lax.Precision.HIGHEST,
              pscan: bool = False) -> jax.Array:
    """``u = Qp^-1 v`` via the Riccati factor: minimize
    ``1/2 u'Qp u - v'u`` (dynamics from x0 = 0).  v, u: (H, nu, B).

    ``pscan=True`` replaces the two depth-H sequential scans with
    O(log H)-depth associative scans over the SAME affine recursions
    (backward: ``p_j = A'(I - W_j B') p_{j+1} + A' W_j v_j``; forward:
    ``x_{k+1} = (A - B K_k) x_k + B kff_k``) — identical math, float32
    association order differs.  This is the hot-loop transform for long
    horizons: one PQP iteration calls this once, and at H = 512 the
    sequential version is 1024 latency-bound tiny-matmul steps.
    """
    A, B = f.A, f.Bm

    if pscan:
        prec = precision
        eye = jnp.eye(f.ns, dtype=v.dtype)
        WBt = jnp.einsum("hij,kj->hik", f.W, B, precision=prec)
        Mb = jnp.einsum("ij,hjk->hik", A.T, eye - WBt, precision=prec)
        Wv = jnp.einsum("hij,hjb->hib", f.W, v, precision=prec)
        cb = jnp.einsum("ij,hjb->hib", A.T, Wv, precision=prec)
        _, crev = _affine_cumulative(Mb[::-1], cb[::-1], prec)
        p_in = _carry_in(crev)[::-1]                 # p_{j+1} at stage j
        t = jnp.einsum("ji,hjb->hib", B, p_in, precision=prec) - v
        kff = -jnp.einsum("hij,hjb->hib", f.Hinv, t, precision=prec)
        Mf = A[None] - jnp.einsum("ij,hjk->hik", B, f.K, precision=prec)
        cf = jnp.einsum("ij,hjb->hib", B, kff, precision=prec)
        _, cx = _affine_cumulative(Mf, cf, prec)
        x_in = _carry_in(cx)                         # x_k at stage k
        return -jnp.einsum("hij,hjb->hib", f.K, x_in,
                           precision=prec) + kff

    mm = lambda a, b: jnp.matmul(a, b, precision=precision)

    def back(p, inp):
        K, Hinv, W, vk = inp
        t = mm(B.T, p) - vk                      # (nu, B)
        kff = -mm(Hinv, t)
        p_new = mm(A.T, p - mm(W, t))
        return p_new, kff

    B_ = v.shape[-1]
    p0 = jnp.zeros((f.ns, B_), v.dtype)
    _, kff = lax.scan(back, p0, (f.K[::-1], f.Hinv[::-1], f.W[::-1],
                                 v[::-1]))
    kff = kff[::-1]                              # (H, nu, B)

    def fwd(x, inp):
        K, kf = inp
        u = -mm(K, x) + kf
        x_new = mm(A, x) + mm(B, u)
        return x_new, u

    x0 = jnp.zeros((f.ns, B_), v.dtype)
    _, u = lax.scan(fwd, x0, (f.K, kff))
    return u


def rollout_states(f: StagewiseFactor, x0: jax.Array, u: jax.Array,
                   dseq: Optional[jax.Array] = None,
                   precision=lax.Precision.HIGHEST,
                   pscan: bool = False) -> jax.Array:
    """States x_1..x_H from x0 under inputs u (H, nu, B): (H, ns, B)."""
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)
    B_ = u.shape[-1]
    if dseq is None:
        dseq = jnp.zeros((f.H, f.E.shape[1], B_), u.dtype)

    if pscan:
        cs = (jnp.einsum("ij,hjb->hib", f.Bm, u, precision=precision)
              + jnp.einsum("ij,hjb->hib", f.E, dseq, precision=precision))
        Ms = jnp.broadcast_to(f.A, (f.H, f.ns, f.ns))
        Mcum, ccum = _affine_cumulative(Ms, cs, precision)
        return jnp.einsum("hij,jb->hib", Mcum, x0,
                          precision=precision) + ccum

    def step(x, inp):
        uk, dk = inp
        x_new = mm(f.A, x) + mm(f.Bm, uk) + mm(f.E, dk)
        return x_new, x_new

    _, xs = lax.scan(step, x0, (u, dseq))
    return xs


# ---------------------------------------------------------------------------
# Constraint operators: rows [up; lo; slew+; slew-], the exact layout of
# models/mpc.py input_constraints (N = 4*H*nu, reference PQP_CPU.c:941).

def _g_apply(U):
    """G U for U (H, nu, B) -> (4, H, nu, B)."""
    TU = U - jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    return jnp.stack([U, -U, TU, -TU], axis=0)


def _gt_apply(Y):
    """G' Y for Y (4, H, nu, B) -> (H, nu, B)."""
    up, lo, sp, sn = Y[0], Y[1], Y[2], Y[3]
    d = sp - sn
    Ttd = d - jnp.concatenate([d[1:], jnp.zeros_like(d[:1])], axis=0)
    return up - lo + Ttd


@_pytree_dataclass(meta_fields=("n_con",))
class StagewiseDual:
    """Matrix-free dual-geometry bundle: everything the PQP loop needs
    that depends only on (plant, costs, horizon)."""

    factor: StagewiseFactor
    r_vec: jax.Array      # (4, H, nu)  Cauchy-Schwarz radii sqrt(Qd_ii)
    theta: jax.Array      # (4, H, nu)
    Kp: jax.Array         # (4, H, nu)
    n_con: int = 0


def _flat(Y):
    """(4, H, nu, B) -> (N, B)."""
    s = Y.shape
    return Y.reshape(s[0] * s[1] * s[2], s[3])


def _unflat(Y, H, nu):
    return Y.reshape(4, H, nu, Y.shape[-1])


def stagewise_dual(spec: MPCSpec, theta_floor: float = 5.0,
                   pscan: bool = False) -> StagewiseDual:
    """Build the matrix-free dual geometry: Riccati factor, the radii
    ``r_i = sqrt((G Qp^-1 G')_ii)`` (one batched kkt_solve over all
    distinct constraint vectors), and theta from the exact rowsum of the
    rank-1 split's negative part."""
    if spec.y_min is not None or spec.y_max is not None:
        raise NotImplementedError(
            "stage-wise path currently covers the reference's constraint "
            "class (input box + slew); output constraints need the "
            "condensed path")
    f = riccati_factor(spec)
    H, nu = f.H, f.nu
    M = H * nu

    # Distinct constraint directions: unit vectors e_{k,j} (box rows) and
    # differences e_{k,j} - e_{k-1,j} (slew rows; k=0 reduces to e_{0,j}).
    # One batched solve computes Qp^-1 g for all of them.
    eye = jnp.eye(M, dtype=jnp.float32).reshape(H, nu, M)
    # slew ROW k's direction is e_k - e_{k-1} = T' e_k (columnwise
    # up-shift difference), not T e_k
    diff = eye - jnp.concatenate(
        [eye[1:], jnp.zeros_like(eye[:1])], axis=0)  # (H, nu, M)
    G_all = jnp.concatenate([eye, diff], axis=-1)    # (H, nu, 2M)
    Z = kkt_solve(f, G_all, pscan=pscan)             # (H, nu, 2M)
    # r^2 = g' Qp^-1 g
    flat_g = G_all.reshape(M, 2 * M)
    flat_z = Z.reshape(M, 2 * M)
    r2 = jnp.sum(flat_g * flat_z, axis=0)            # (2M,)
    r_box = jnp.sqrt(jnp.maximum(r2[:M], 0.0)).reshape(H, nu)
    r_slew = jnp.sqrt(jnp.maximum(r2[M:], 0.0)).reshape(H, nu)
    r_vec = jnp.stack([r_box, r_box, r_slew, r_slew], axis=0)

    # theta_i = max(rowsum(N)_i, floor),
    # rowsum(N) = (r_i * sum(r) - (Qd 1)_i) / 2, matrix-free.
    ones = jnp.ones((4, H, nu, 1), jnp.float32)
    qd1 = _g_apply(kkt_solve(f, _gt_apply(ones),
                             pscan=pscan))[..., 0]   # (4, H, nu)
    rowsum_N = 0.5 * (r_vec * jnp.sum(r_vec) - qd1)
    theta = jnp.maximum(rowsum_N, theta_floor)

    umax = jnp.broadcast_to(jnp.asarray(spec.u_max, jnp.float32), (H, nu))
    umin = jnp.broadcast_to(jnp.asarray(spec.u_min, jnp.float32), (H, nu))
    dmax = jnp.broadcast_to(jnp.asarray(spec.du_max, jnp.float32), (H, nu))
    uprev = jnp.zeros(nu, jnp.float32) if spec.u_prev is None else \
        jnp.asarray(spec.u_prev, jnp.float32)
    e1u = jnp.zeros((H, nu), jnp.float32).at[0].set(uprev)
    Kp = jnp.stack([umax, -umin, dmax + e1u, dmax - e1u], axis=0)
    return StagewiseDual(factor=f, r_vec=r_vec, theta=theta, Kp=Kp,
                         n_con=4 * M)


def _forcing(dual: StagewiseDual, x0, dseq, prec, pscan: bool = False):
    """Per-instance forcing: Fp (H, nu, B), Mp (B,), Fd splits, Md.

    Fp_k = B' mu_{k+1} with the adjoint recursion
    mu_j = C'Qy(C xbar_j - r) + A' mu_{j+1} over the free response
    xbar (inputs = 0); Mp = sum_j |C xbar_j - r|^2_Qy; then
    Fd = Kp + G Qp^-1 Fp and Md = Fp'Qp^-1 Fp - Mp exactly as
    computeFd/computeMd (PQP_CPU.c:456-479)."""
    f = dual.factor
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    B_ = x0.shape[-1]
    zeros_u = jnp.zeros((f.H, f.nu, B_), jnp.float32)
    xbar = rollout_states(f, x0, zeros_u, dseq, prec, pscan)  # (H, ns, B)
    # outputs per stage: (H, ny, B)
    ybar = jax.vmap(lambda x: mm(f.C, x))(xbar)
    e = ybar - f.r[None, :, None]
    # doubled weights: Fp = 2 Su'Qbar err, Mp = 2 sum |err|^2 (the
    # reference's 1/2 U'QpU + Fp'U + 1/2 Mp convention, see
    # riccati_factor)
    Qe = 2.0 * jax.vmap(lambda v: mm(f.Qy, v))(e)          # (H, ny, B)
    Mp = jnp.sum(e * Qe, axis=(0, 1))                      # (B,)

    if pscan:
        # mu_new = A' mu + C' Qe_k, emitted AFTER the update: the
        # inclusive cumulative IS mu_new at every (reversed) stage
        cs = jnp.einsum("ji,hjb->hib", f.C, Qe[::-1], precision=prec)
        Ms = jnp.broadcast_to(f.A.T, (f.H, f.ns, f.ns))
        _, mu = _affine_cumulative(Ms, cs, prec)
        Fp = jnp.einsum("ji,hjb->hib", f.Bm, mu, precision=prec)[::-1]
    else:
        def adj(mu, inp):
            # scanning j = H..1 with mu = mu_{j+1}; Fp_{j-1} = B' mu_j,
            # so update mu FIRST, then emit
            Qe_k = inp
            mu_new = mm(f.C.T, Qe_k) + mm(f.A.T, mu)
            return mu_new, mm(f.Bm.T, mu_new)

        mu0 = jnp.zeros((f.ns, B_), jnp.float32)
        _, Fp_rev = lax.scan(adj, mu0, Qe[::-1])
        Fp = Fp_rev[::-1]                                  # (H, nu, B)

    QiF = kkt_solve(f, Fp, prec, pscan)
    Md = jnp.sum(Fp * QiF, axis=(0, 1)) - Mp               # (B,)
    Fd = _flat(dual.Kp[..., None] + _g_apply(QiF))         # (N, B)
    return Fp, Mp, Fd, Md


@partial(jax.jit, static_argnames=("cfg", "pscan", "retry_cold"))
def solve_stagewise(dual: StagewiseDual, x0: jax.Array,
                    dseq: Optional[jax.Array] = None,
                    Y0: Optional[jax.Array] = None,
                    cfg: SolverConfig = SolverConfig(),
                    pscan: Optional[bool] = None,
                    retry_cold: bool = False) -> SolveResult:
    """Run the PQP dual iteration matrix-free over a batch of initial
    states.  ``x0``: (ns,) or (ns, B); ``dseq``: optional (H, nd, B).
    Returns a :class:`SolveResult` with ``U (H*nu, B)``, ``Y (N, B)``.

    Semantics mirror :func:`pqp_for_mpc_tpu.solver.solve_batched` (same
    four-part terminate, masked lanes, divergence freeze); only the
    linear algebra is implicit.

    ``pscan`` selects the temporal-parallel (associative-scan) KKT
    recursions; ``None`` = auto (on for H >= 64, where the depth-H
    sequential scans dominate the iteration latency).
    """
    f = dual.factor
    H, nu = f.H, f.nu
    if pscan is None:
        pscan = H >= 64
    prec = lax.Precision.HIGHEST if cfg.precision == "highest" else None
    x0 = x0 if x0.ndim == 2 else x0[:, None]
    B = x0.shape[1]
    N = dual.n_con

    Fp, Mp, Fd, Md = _forcing(dual, x0, dseq, prec, pscan)
    Fdp = jnp.maximum(Fd, 0.0)
    Fdn = jnp.maximum(-Fd, 0.0)
    r_col = _flat(dual.r_vec[..., None])                   # (N, 1)
    th_col = _flat(dual.theta[..., None])
    kp_col = _flat(dual.Kp[..., None])
    kp_slack = kp_col + jnp.maximum(cfg.erc * kp_col, cfg.eac)

    def qd_apply(Yf):
        """Qd Y, flat (N, B) -> (N, B)."""
        Y4 = _unflat(Yf, H, nu)
        return _flat(_g_apply(kkt_solve(f, _gt_apply(Y4), prec,
                                        pscan)))

    def update(Yf):
        qdY = qd_apply(Yf)
        s = jnp.sum(r_col * Yf, axis=0, keepdims=True)     # (1, B)
        rank1 = r_col * s
        PY = 0.5 * (rank1 + qdY) + th_col * Yf
        NY = 0.5 * (rank1 - qdY) + th_col * Yf
        num = NY + Fdn
        den = PY + Fdp
        if cfg.den_eps:
            den = jnp.maximum(den, cfg.den_eps)
        return (num / den) * Yf

    def accel(Yf, done):
        """Exact projected-gradient accel (matrix-free; no bound)."""
        grad = qd_apply(Yf) + Fd
        p = jnp.where((Yf > 0.0) | (grad < 0.0), -grad, 0.0)
        pQp = jnp.sum(p * qd_apply(p), axis=0)
        alpha = jnp.where(pQp > 0,
                          jnp.sum(p * p, axis=0)
                          / jnp.maximum(pQp, 1e-30), 0.0)
        Yn = jnp.maximum(Yf + alpha[None, :] * p, 0.0)
        fY = 0.5 * jnp.sum(Yf * (grad + Fd), axis=0)
        fYn = (0.5 * jnp.sum(Yn * qd_apply(Yn), axis=0)
               + jnp.sum(Fd * Yn, axis=0))
        keep = (fYn <= fY) & ~done
        return jnp.where(keep[None, :], Yn, Yf)

    def recover(Yf):
        """U = -Qp^-1(Fp + G'Y): (H, nu, B)."""
        t = Fp + _gt_apply(_unflat(Yf, H, nu))
        return -kkt_solve(f, t, prec, pscan)

    def check(Yf):
        U = recover(Yf)
        GU = _flat(_g_apply(U))
        feas = jnp.all(GU <= kp_slack, axis=0)
        qdY = qd_apply(Yf)
        Jd = (0.5 * jnp.sum(Yf * qdY, axis=0)
              + jnp.sum(Fd * Yf, axis=0) + 0.5 * Md)
        # Jp via the definition 1/2 U'QpU + Fp'U + 1/2 Mp, with QpU
        # evaluated from the identity QpU = -(Fp + G'Y*)... NOT valid off
        # the solution; use the stage-cost rollout instead (numerically
        # identical, O(H)):
        xs = rollout_states(f, jnp.zeros_like(x0), U, None, prec,
                            pscan)
        # 1/2 U'Qp U with Qp = 2*(Su'Qbar Su + Rbar) equals the
        # UNSCALED stage quadratic of the zero-x0 rollout
        ysU = jax.vmap(lambda x: jnp.matmul(f.C, x, precision=prec))(xs)
        quad = jnp.sum(ysU * jax.vmap(
            lambda v: jnp.matmul(f.Qy, v, precision=prec))(ysU),
            axis=(0, 1))
        Ru = jax.vmap(lambda v: jnp.matmul(f.R, v, precision=prec))(U)
        quad = quad + jnp.sum(U * Ru, axis=(0, 1))
        Jp = quad + jnp.sum(Fp * U, axis=(0, 1)) + 0.5 * Mp
        if cfg.gap_from_complementarity:
            # Jp(U(Y)) + Jd(Y) = Y'(Qd Y + Fd) exactly (the Mp/Md
            # constants cancel; SolverConfig.gap_from_complementarity).
            # The matrix-free path gains even more than the condensed
            # one: its explicit Jp additionally carries the stage-cost
            # rollout's accumulation noise.
            gap = jnp.sum(Yf * (qdY + Fd), axis=0)
            weak = gap > 0.0
        else:
            gap = Jp + Jd
            weak = Jp > -Jd
        fail = (~feas | (gap > cfg.eaj)
                | (gap / jnp.abs(Jd) > cfg.erj))
        if cfg.strict_weak_duality:
            fail = fail | weak
        return ~fail, U, feas, Jp, Jd

    warm = Y0 is not None
    if Y0 is None:
        Y0 = jnp.full((N, B), cfg.y0, jnp.float32)
    else:
        # mirror solve_batched's warm-start semantics: a single warm
        # start seeds the whole batch; a mismatched batch is an error
        # (silently recycling lane 0 would be a quiet wrong answer)
        if Y0.shape[1] == 1 and B > 1:
            Y0 = jnp.broadcast_to(Y0, (N, B))
        elif Y0.shape[1] != B:
            raise ValueError(
                f"warm start batch {Y0.shape[1]} != instance batch {B}")
    k = cfg.check_every

    def run_updates(Y, done):
        if not cfg.accel_every:
            def body(_, Yc):
                return jnp.where(done[None, :], Yc, update(Yc))
            return lax.fori_loop(0, k, body, Y)

        def chunk(_, Yc):
            def body(_, Yc2):
                return jnp.where(done[None, :], Yc2, update(Yc2))
            Yc = lax.fori_loop(0, cfg.accel_every, body, Yc)
            return accel(Yc, done)
        return lax.fori_loop(0, k // cfg.accel_every, chunk, Y)

    def cond(state):
        Y, done, h, iters, div = state
        return jnp.logical_and(~jnp.all(done), h <= cfg.max_iters)

    def body(state):
        Y, done, h, iters, div = state
        ok, _, _, _, _ = check(Y)
        bad = ~jnp.all(jnp.isfinite(Y), axis=0) & ~done
        newly = ok & ~done & ~bad
        iters = jnp.where(newly | bad, h, iters)
        done = done | ok | bad
        div = div | bad
        Y = run_updates(Y, done)
        return (Y, done, h + jnp.int32(k), iters, div)

    def solve_once(Y0f):
        done0 = jnp.zeros((B,), bool)
        it0 = jnp.zeros((B,), jnp.int32)
        div0 = jnp.zeros((B,), bool)
        Y, done, h, iters, div = lax.while_loop(
            cond, body, (Y0f, done0, jnp.int32(1), it0, div0))

        ok, U, feas, Jp, Jd = check(Y)
        bad = ~jnp.all(jnp.isfinite(Y), axis=0)
        newly_bad = bad & ~done
        div = div | newly_bad
        newly = ok & ~done & ~bad
        iters = jnp.where(newly | newly_bad, h, iters)
        done = done | ok | bad
        iters = jnp.where(done, iters, h)
        return SolveResult(U=U.reshape(H * nu, B), Y=Y, iters=iters,
                           converged=done & ~div, feasible=feas,
                           Jp=Jp, Jd=Jd, diverged=div)

    if retry_cold and warm:
        from pqp_for_mpc_tpu.solver import retry_cold_solve
        Y_cold = jnp.full((N, B), cfg.y0, jnp.float32)
        return retry_cold_solve(solve_once, Y0, Y_cold)
    return solve_once(Y0)
