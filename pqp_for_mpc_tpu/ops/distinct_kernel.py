"""Whole-solve Pallas kernel for batches of fully DISTINCT instances.

The shared-geometry kernel (:mod:`pqp_for_mpc_tpu.ops.solve_kernel`)
exploits one ``(N, N)`` Qd shared by every lane; the reference's own
benchmark workload is the opposite shape — one random geometry per
instance (testing/test_generator.c:997-998).  Before this kernel such
batches took the XLA einsum path, which re-streams every instance's
``(N, N)`` splits from HBM on EVERY iteration (``~2*B*N^2*4`` bytes/iter);
here each instance's geometry is DMA'd into VMEM exactly once and ALL of
its iterations + convergence checks + primal recovery run in-kernel —
a ~``2 x iterations``-fold cut in HBM traffic, plus true per-instance
early exit (the einsum path keeps streaming a converged lane's matrices
until the whole batch finishes).

Design notes (TPU-first):

* grid = (B,): one instance per grid step.  Pallas double-buffers the
  input blocks, so instance ``b+1``'s matrices stream from HBM while
  instance ``b`` solves — the DMA is hidden behind ~hundreds of
  iterations of compute.
* ROW-VECTOR layout inside the kernel: the iterate lives as an
  ``(8, N)`` row-replicated panel, so each matvec is
  ``(8, N) @ (N, N)`` — the natural f32 MXU pass shape.  This works
  because every matrix it right-multiplies is SYMMETRIC:
  ``Qd = Gp Qp^-1 Gp'`` is symmetric, hence so are its elementwise
  splits ``max(0, +/-Qd)`` and the diagonal-theta additions
  (computeQdp_theta/computeQdn_theta, PQP_CPU.c:524-537), and
  ``Qp``/``Qp_inv`` are symmetric by construction.  Only ``Gp`` is not —
  it is passed in both orientations.
* all vector state lives in VMEM scratch; the in-kernel while loop
  carries only f32 scalars (h, state, iters) — large vector carries
  miscompile or fail to legalize in Mosaic (see solve_kernel.py).

Same lane-state codes as the shared kernel: 0 = hit max_iters,
1 = certified by the in-kernel four-part check, 2 = stall-frozen at a
fixed point, (no padding code — the grid is exactly B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqp_for_mpc_tpu.ops.kernels import (_LANE, _SUBLANE, _round_up,
                                         VMEM_LIMIT_BYTES)

#: operand budget for ONE instance's matrices (double-buffered by the
#: pipeline, hence half the shared kernel's 40 MiB).  Instances beyond
#: it use the STREAMED whole-solve kernel
#: (:mod:`pqp_for_mpc_tpu.ops.distinct_tiled_kernel`) — per-instance
#: Qd_hat slabs hand-DMA'd from HBM, validated at N=4096.
DISTINCT_OPERAND_BUDGET = 20 * 1024 * 1024


def distinct_fits_vmem(n: int, m: int,
                       budget: int = DISTINCT_OPERAND_BUDGET) -> bool:
    """Do one instance's matrices (3 Qd-splits, Gp both ways, Qp twice)
    fit the per-step operand budget?"""
    n8 = _round_up(max(n, _SUBLANE), _SUBLANE)
    nl = _round_up(max(n, _LANE), _LANE)
    m8 = _round_up(max(m, _SUBLANE), _SUBLANE)
    ml = _round_up(max(m, _LANE), _LANE)
    mats = (3 * n8 * nl + n8 * ml + m8 * nl + 2 * m8 * ml) * 4
    return mats <= budget


def _kernel(cfg_tuple, qdn_ref, qdp_ref, qd_ref, gp_ref, gpt_ref, qp_ref,
            qpi_ref, fp_ref, fd_ref, fdp_ref, fdn_ref, kps_ref, mp_ref,
            md_ref, y0_ref, y_out, u_out, it_out, st_out, y_scr):
    (max_iters, check_every, accel_every, eaj, erj, strict, den_eps,
     precision) = cfg_tuple
    qdn = qdn_ref[0]
    qdp = qdp_ref[0]
    qd = qd_ref[0]
    gp = gp_ref[0]          # (N, M)
    gpt = gpt_ref[0]        # (M, N) = Gp'
    qp = qp_ref[0]
    qpi = qpi_ref[0]
    fp = fp_ref[0]          # (8, M) row-replicated
    fd = fd_ref[0]
    fdp = fdp_ref[0]
    fdn = fdn_ref[0]
    kps = kps_ref[0]

    f32 = jnp.float32
    # precision matters inside Mosaic: f32 jnp.dot otherwise lowers to
    # fast (bf16-pass) MXU matmuls; the multiplicative update amplifies
    # that error into divergence on ill-conditioned instances (verified
    # on v5e: default precision diverged 5/8 random instances the XLA
    # highest-precision path solves, HIGHEST matches it bit-for-bit on
    # iteration counts).  cfg.precision picks the tradeoff.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                               precision=prec)

    # IMPORTANT (Mosaic): every reduced quantity below is a FULL reduce
    # to a scalar (SREG) — lane-dim-1 tensors such as (8, 1) keepdims
    # reductions silently miscompile inside scf.while on hardware (the
    # same pathology family as the 1-row carries documented in
    # solve_kernel.py; verified: the keepdims formulation passes
    # interpret mode but corrupts most lanes on a v5e).  Rows are
    # 8x-replicated, so full sums are divided by 8.
    inv8 = f32(1.0 / _SUBLANE)
    mp = jnp.sum(mp_ref[0]) * f32(1.0 / (_SUBLANE * 128))   # scalar
    md = jnp.sum(md_ref[0]) * f32(1.0 / (_SUBLANE * 128))

    def one_update(y):
        # row form of updateY2+updY (PQP_CPU.c:603-618): y' Qdn = (Qdn y)'
        # by symmetry of the splits
        num = dot(y, qdn) + fdn
        den = dot(y, qdp) + fdp
        if den_eps:
            den = jnp.maximum(den, den_eps)
        return (num / den) * y

    def accel(y):
        grad = dot(y, qd) + fd
        p = jnp.where((y > 0.0) | (grad < 0.0), -grad, 0.0)
        pQp = jnp.sum(p * dot(p, qd)) * inv8                   # scalar
        alpha = jnp.where(pQp > 0,
                          jnp.sum(p * p) * inv8
                          / jnp.maximum(pQp, 1e-30), 0.0)
        yn = jnp.maximum(y + alpha * p, 0.0)
        fY = 0.5 * jnp.sum(y * (grad + fd)) * inv8
        fYn = (0.5 * jnp.sum(yn * dot(yn, qd))
               + jnp.sum(fd * yn)) * inv8
        return jnp.where(jnp.broadcast_to(fYn <= fY, y.shape), yn, y)

    def check(y):
        """Four-part terminate (PQP_CPU.c:673-687) in row form.
        Returns (ok scalar bool, u (8, M))."""
        u = -dot(dot(y, gp) + fp, qpi)
        gpu = dot(u, gpt)
        nviol = jnp.sum(jnp.where(gpu > kps, f32(1.0), f32(0.0)))  # scalar
        jd = ((0.5 * jnp.sum(y * dot(y, qd)) + jnp.sum(fd * y)) * inv8
              + 0.5 * md)
        jp = ((0.5 * jnp.sum(u * dot(u, qp)) + jnp.sum(fp * u)) * inv8
              + 0.5 * mp)
        gap = jp + jd
        fail = ((nviol > 0.0) | (gap > eaj) | (gap / jnp.abs(jd) > erj))
        if strict:
            fail = fail | (jp > -jd)
        return jnp.logical_not(fail), u

    n_chunks = max(1, check_every // max(accel_every, 1)) \
        if accel_every else 1

    y_scr[:] = y0_ref[0]

    def body(carry):
        h, st, it = carry
        y = y_scr[:]
        done, _ = check(y)
        st = jnp.where(done, f32(1.0), st)
        it = jnp.where(done, h, it)
        if accel_every:
            def chunk(_, yc):
                yc = lax.fori_loop(0, accel_every,
                                   lambda _, z: one_update(z), yc)
                return accel(yc)
            y_new = lax.fori_loop(0, n_chunks, chunk, y)
        else:
            y_new = lax.fori_loop(0, check_every,
                                  lambda _, z: one_update(z), y)
        # stall freeze: bit-identical iterate after a whole block is a
        # fixed point; if its check just failed it will fail forever
        stalled = jnp.sum(jnp.abs(y_new - y)) == 0.0
        frozen = jnp.logical_and(jnp.logical_not(done), stalled)
        st = jnp.where(frozen, f32(2.0), st)
        it = jnp.where(frozen, h + f32(check_every), it)
        y_scr[:] = jnp.where(jnp.broadcast_to(done, y.shape), y, y_new)
        return (h + f32(check_every), st, it)

    def cond(carry):
        h, st, _ = carry
        return jnp.logical_and(st == 0.0, h <= f32(max_iters))

    h, st, it = lax.while_loop(cond, body, (f32(1.0), f32(0.0), f32(0.0)))

    y = y_scr[:]
    ok, u = check(y)
    newly = jnp.logical_and(ok, st == 0.0)
    st = jnp.where(newly, f32(1.0), st)
    it = jnp.where(jnp.logical_or(newly, st == 0.0), h, it)
    y_out[0] = y
    u_out[0] = u
    it_out[0] = jnp.broadcast_to(it, it_out.shape[1:])
    st_out[0] = jnp.broadcast_to(st, st_out.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every", "accel_every",
                              "eaj", "erj", "strict", "den_eps",
                              "precision", "interpret"))
def fused_full_solve_distinct(Qdn_theta, Qdp_theta, Qd, Gp, Qp, Qp_inv,
                              Fp, Fd, Fdp, Fdn, Kp_slack, Mp, Md, Y0,
                              *, max_iters: int, check_every: int,
                              accel_every: int = 0, eaj: float = 1e-6,
                              erj: float = 1e-6, strict: bool = True,
                              den_eps: float = 1e-30,
                              precision: str = "highest",
                              interpret: bool = False):
    """One-launch whole solve for B distinct instances.

    Shapes: matrices ``(B, N, N)`` / ``(B, N, M)`` / ``(B, M, M)``
    (leading batch), vectors ``(M, B)`` / ``(N, B)`` (trailing batch),
    scalars ``(B,)``.  ``Kp_slack`` is the pre-slackened threshold,
    ``(N, B)`` or ``(N, 1)``.
    Returns ``(Y (N, B), U (M, B), iters (B,) int32, state (B,) f32)``.
    """
    B, N, _ = Qd.shape
    M = Gp.shape[2]
    n8 = _round_up(max(N, _SUBLANE), _SUBLANE)
    nl = _round_up(max(N, _LANE), _LANE)
    m8 = _round_up(max(M, _SUBLANE), _SUBLANE)
    ml = _round_up(max(M, _LANE), _LANE)
    # the kernel right-multiplies rows by the matrices, so the CONTRACTED
    # (sublane) dim needs only 8-padding, but Mosaic lays (r, c) VMEM
    # tiles at (8, 128) quanta regardless — pad both to their quanta with
    # fixed-point semantics and let the row layout do the rest
    if not distinct_fits_vmem(N, M):
        raise ValueError(
            f"fused_full_solve_distinct: N={N}, M={M} exceed the per-step "
            "VMEM operand budget; use solve_batched's einsum path")
    dn8, dnl = n8 - N, nl - N
    dm8, dml = m8 - M, ml - M
    f32 = jnp.float32

    def pad_sym(A, rpad, cpad, diag):
        """(B, r, c) -> padded, identity (or 0) on the pad diagonal."""
        if not (rpad or cpad):
            return A
        out = jnp.pad(A, ((0, 0), (0, rpad), (0, cpad)))
        if diag:
            k = min(rpad, cpad)
            r = A.shape[1] + jnp.arange(k)
            out = out.at[:, r, r].set(diag)
        return out

    # Square matrices must be padded to (max(n8, needed-sublane), nl)
    # with matching row/col semantics.  Since they are contracted on
    # sublanes AND indexed on lanes, pad square to (nl, nl) so row and
    # column coordinates agree (pad coords: identity for the splits,
    # zero elsewhere).
    Qdn_p = pad_sym(Qdn_theta, dnl, dnl, 1.0)
    Qdp_p = pad_sym(Qdp_theta, dnl, dnl, 1.0)
    Qd_p = pad_sym(Qd, dnl, dnl, 0.0)
    Qp_p = pad_sym(Qp, dml, dml, 0.0)
    Qpi_p = pad_sym(Qp_inv, dml, dml, 1.0)
    Gp_p = jnp.pad(Gp, ((0, 0), (0, dnl), (0, dml)))
    GpT_p = jnp.swapaxes(Gp_p, 1, 2)

    def row8(v, width, dpad, fill):
        """(width, B) or (width,) -> (B, 8, width+dpad) row-replicated."""
        v2 = jnp.broadcast_to(v.reshape(width, -1), (width, B))
        v2 = jnp.pad(v2.T, ((0, 0), (0, dpad)), constant_values=fill)
        return jnp.broadcast_to(v2[:, None, :], (B, _SUBLANE, width + dpad))

    Fp_r = row8(Fp, M, dml, 0.0)
    Fd_r = row8(Fd, N, dnl, 0.0)
    Fdp_r = row8(Fdp, N, dnl, 0.0)
    Fdn_r = row8(Fdn, N, dnl, 0.0)
    Kps_r = row8(Kp_slack, N, dnl, jnp.inf)
    Y0_r = row8(Y0, N, dnl, 1.0)
    scal = lambda s: jnp.broadcast_to(
        s.reshape(B, 1, 1).astype(f32), (B, _SUBLANE, _LANE))
    Mp_r = scal(Mp)
    Md_r = scal(Md)

    grid = (B,)
    blk = lambda r, c: pl.BlockSpec((1, r, c), lambda b: (b, 0, 0),
                                    memory_space=pltpu.VMEM)

    cfg_tuple = (max_iters, check_every, accel_every, eaj, erj, strict,
                 den_eps, precision)
    y, u, iters, st = pl.pallas_call(
        functools.partial(_kernel, cfg_tuple),
        grid=grid,
        in_specs=[blk(nl, nl), blk(nl, nl), blk(nl, nl),
                  blk(nl, ml), blk(ml, nl), blk(ml, ml), blk(ml, ml),
                  blk(_SUBLANE, ml), blk(_SUBLANE, nl), blk(_SUBLANE, nl),
                  blk(_SUBLANE, nl), blk(_SUBLANE, nl), blk(_SUBLANE, _LANE),
                  blk(_SUBLANE, _LANE), blk(_SUBLANE, nl)],
        out_specs=[blk(_SUBLANE, nl), blk(_SUBLANE, ml),
                   blk(_SUBLANE, _LANE), blk(_SUBLANE, _LANE)],
        out_shape=[jax.ShapeDtypeStruct((B, _SUBLANE, nl), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, ml), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, _LANE), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, _LANE), f32)],
        scratch_shapes=[pltpu.VMEM((_SUBLANE, nl), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(Qdn_p, Qdp_p, Qd_p, Gp_p, GpT_p, Qp_p, Qpi_p, Fp_r, Fd_r, Fdp_r,
      Fdn_r, Kps_r, Mp_r, Md_r, Y0_r)
    return (y[:, 0, :N].T, u[:, 0, :M].T,
            iters[:, 0, 0].astype(jnp.int32), st[:, 0, 0])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def solve_fused_distinct(primal, dual, Y0=None, cfg=None,
                         interpret: bool = False):
    """Drop-in analog of ``solve_batched`` for distinct-geometry batches
    in one Pallas launch.  ``dual.Qd`` must be ``(B, N, N)``
    (:func:`pqp_for_mpc_tpu.dual.dualize_distinct`); shared primal
    geometry is broadcast.  Returns a ``SolveResult``."""
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.solver import (SolveResult, _as2d, costs,
                                        feasibility, termination_fail)

    cfg = cfg or SolverConfig()
    if dual.Qd.ndim != 3:
        raise ValueError("solve_fused_distinct needs Qd (B, N, N); use "
                         "solve_fused for shared geometry")
    B, N, _ = dual.Qd.shape
    M = primal.Gp.shape[-1]
    bcast3 = lambda A, r, c: (A if A.ndim == 3
                              else jnp.broadcast_to(A, (B, r, c)))
    Gp_b = bcast3(primal.Gp, N, M)
    Qp_b = bcast3(primal.Qp, M, M)
    Qpi_b = bcast3(primal.Qp_inv, M, M)
    Fp2 = jnp.broadcast_to(_as2d(primal.Fp), (M, B))
    Fd2 = jnp.broadcast_to(_as2d(dual.Fd), (N, B))
    Mp2 = jnp.broadcast_to(jnp.atleast_1d(primal.Mp), (B,))
    Md2 = jnp.broadcast_to(jnp.atleast_1d(dual.Md), (B,))
    if Y0 is None:
        Y0 = jnp.full((N, B), cfg.y0, jnp.float32)
    else:
        Y0 = _as2d(Y0)
        if Y0.shape[1] == 1 and B > 1:
            Y0 = jnp.broadcast_to(Y0, (N, B))
        elif Y0.shape[1] != B:
            raise ValueError(
                f"warm start batch {Y0.shape[1]} != instance batch {B}")
    kp_slack = primal.Kp + jnp.maximum(cfg.erc * primal.Kp, cfg.eac)
    kp_slack = jnp.broadcast_to(kp_slack.reshape(N, -1), (N, B))

    Y, U, iters, lane_state = fused_full_solve_distinct(
        dual.Qdn_theta, dual.Qdp_theta, dual.Qd, Gp_b, Qp_b, Qpi_b,
        Fp2, Fd2, jnp.broadcast_to(_as2d(dual.Fdp), (N, B)),
        jnp.broadcast_to(_as2d(dual.Fdn), (N, B)), kp_slack, Mp2, Md2, Y0,
        max_iters=cfg.max_iters, check_every=cfg.check_every,
        accel_every=cfg.accel_every, eaj=cfg.eaj, erj=cfg.erj,
        strict=cfg.strict_weak_duality, den_eps=cfg.den_eps,
        precision=cfg.precision, interpret=interpret)
    prec = lax.Precision.HIGHEST if cfg.precision == "highest" else None
    feas = feasibility(primal, U, cfg.erc, cfg.eac, prec)
    Jp, Jd = costs(primal, dual, Y, U, prec)
    div = ~jnp.all(jnp.isfinite(Y), axis=0)
    cert = lane_state == 1.0
    stalled = lane_state == 2.0
    fail = termination_fail(feas, Jp, Jd, cfg)
    conv = (cert | (stalled & ~fail)) & ~div
    return SolveResult(U=U, Y=Y, iters=iters, converged=conv,
                       feasible=feas, Jp=Jp, Jd=Jd, diverged=div)
