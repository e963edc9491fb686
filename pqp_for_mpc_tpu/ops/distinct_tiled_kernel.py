"""Streamed whole-solve kernel for DISTINCT-geometry instances beyond
VMEM residency (VERDICT r2 task 7).

:mod:`pqp_for_mpc_tpu.ops.distinct_kernel` keeps one instance's whole
geometry resident in VMEM per grid step — capped at ~20 MiB/instance
(N ≈ 1100).  Larger distinct instances previously fell back to the XLA
einsum path, which re-streams every instance's materialized ``(N, N)``
splits from HBM on EVERY iteration (``2·B·N²·4`` bytes/iter) with no
per-instance early exit.  This kernel streams each instance's UNSPLIT
``Qd_hat = Qd + diag(θ)`` (half the bytes — the splits are
reconstructed on the VPU per slab, ops/tiled_kernel.py's trick) through
double-buffered ``make_async_copy`` chains inside an in-kernel while
loop — one grid step per instance, checks/early-exit/recovery included,
exactly :mod:`pqp_for_mpc_tpu.ops.tiled_solve_kernel`'s structure in
the distinct kernel's ROW-VECTOR layout:

* the iterate is an ``(8, N)`` row-replicated panel; every matvec is
  ``(8, bn) @ (bn, n_pad)`` against the streamed slab, accumulated over
  row blocks — legal because all right-multiplied matrices are
  symmetric (the splits of the symmetric Qd; Qp/Qp⁻¹), and ``Gp`` rides
  in both orientations inside the per-instance stream;
* one stream pass per UPDATE accumulates both relu-split matvecs; the
  CHECK pass accumulates ``Y'Qd_hat`` (for the costs/gap) and ``Y'Gp``
  (for the recovery) in the same sweep, then re-streams ``Gp`` for the
  feasibility rows;
* per-instance early exit stops that instance's HBM stream entirely —
  the einsum path keeps streaming a converged lane's 67 MB Hessian
  until the whole batch finishes.

The per-instance stream is arranged as ONE combined HBM array
``[Qd_hat | Gp] (B, n_pad, n_pad + m_pad)`` so the update and check
passes share a single DMA chain (the update pass simply ignores the Gp
columns — a ~``m/n`` bandwidth overhead traded for never stalling the
pipeline on a second chain; for the constraint families here m/n ≤ 1/3
and the einsum path it replaces streams 2× regardless).

Same lane-state codes as the other whole-solve kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqp_for_mpc_tpu.ops.kernels import _LANE, _SUBLANE, _round_up, \
    VMEM_LIMIT_BYTES

#: row-slab height (ops/tiled_kernel.py's swept f32 optimum)
BLOCK_N = 128

#: row-slab height for the bfloat16 UPDATE stream (the 2-byte slab
#: halves DMA per row; round-5 sweep on the solve_mixed distinct
#: N=2048/B=8 workload: bn=128 → 1.261 s, 256 → 1.194 (+5.5%),
#: 512 → 1.196 — same stale-f32-sweep lesson as
#: tiled_kernel.MAX_BLOCK_N_BF16)
BLOCK_N_BF16 = 256


def _kernel(cfg_tuple, dims,
            stream_hbm, qp_ref, qpi_ref, theta_ref,
            fp_ref, fd_ref, fdn_ref, fdp_ref, kps_ref, mp_ref, md_ref,
            y0_ref,
            y_out, u_out, it_out, st_out,
            y_scr, num_scr, den_scr, u_scr, slab, sem):
    (max_iters, check_every, accel, eaj, erj, strict, den_eps,
     precision, gap_comp) = cfg_tuple
    bn, nblocks, n_pad, m_pad = dims
    f32 = jnp.float32
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                               precision=prec)
    b_id = pl.program_id(0)
    inv8 = f32(1.0 / _SUBLANE)
    mp = jnp.sum(mp_ref[0]) * f32(1.0 / (_SUBLANE * _LANE))    # scalar
    md = jnp.sum(md_ref[0]) * f32(1.0 / (_SUBLANE * _LANE))

    def dma(slot, i):
        return pltpu.make_async_copy(
            stream_hbm.at[b_id, pl.ds(i * bn, bn), :], slab.at[slot],
            sem.at[slot])

    def stream(body):
        dma(0, 0).start()

        def lb(i, _):
            slot = i % 2

            @pl.when(i + 1 < nblocks)
            def _():
                dma((i + 1) % 2, i + 1).start()

            dma(slot, i).wait()
            body(i, slab[slot])
            return None

        lax.fori_loop(0, nblocks, lb, None, unroll=False)

    def update_sweep():
        """One multiplicative update: accumulate both relu-split row
        matvecs over the streamed slabs, then the elementwise update."""
        num_scr[:] = jnp.zeros_like(num_scr)
        den_scr[:] = jnp.zeros_like(den_scr)

        def blk(i, s):
            q = s[:, :n_pad]                    # (bn, n_pad) Qd_hat rows
            yblk = y_scr[:, pl.ds(i * bn, bn)]  # (8, bn)
            num_scr[:] = num_scr[:] + dot(yblk, jnp.maximum(-q, 0.0))
            den_scr[:] = den_scr[:] + dot(yblk, jnp.maximum(q, 0.0))

        stream(blk)
        y = y_scr[:]
        th = theta_ref[0]                       # (8, n_pad) row-replicated
        num = num_scr[:] + th * y + fdn_ref[0]
        den = den_scr[:] + fdp_ref[0]
        if den_eps:
            den = jnp.maximum(den, den_eps)
        return (num / den) * y                  # (8, n_pad)

    def check():
        """Four-part verdict in row form.  Returns (ok scalar, gap-side
        bookkeeping written to u_scr)."""
        num_scr[:] = jnp.zeros_like(num_scr)    # reuse: Y' Qd_hat
        den_scr[:] = jnp.zeros_like(den_scr)    # reuse: [Y'Gp | 0]

        def blk(i, s):
            q = s[:, :n_pad]
            g = s[:, n_pad:]                    # (bn, m_pad) Gp rows
            yblk = y_scr[:, pl.ds(i * bn, bn)]
            num_scr[:] = num_scr[:] + dot(yblk, q)
            den_scr[:, :m_pad] = den_scr[:, :m_pad] + dot(yblk, g)

        stream(blk)
        y = y_scr[:]
        th = theta_ref[0]
        qdy = num_scr[:] - th * y               # (8, n_pad) = Y'Qd rows
        u = -dot(den_scr[:, :m_pad] + fp_ref[0], qpi_ref[0])   # (8, m_pad)
        u_scr[:] = u

        # feasibility: re-stream Gp for Gp U rows, count violations
        def blk2(i, s):
            g = s[:, n_pad:]                    # (bn, m_pad)
            gu = dot(u, g.T)                    # (8, bn)
            kps = kps_ref[0, :, pl.ds(i * bn, bn)]
            num_scr[:, pl.ds(i * bn, bn)] = \
                jnp.where(gu > kps, f32(1.0), f32(0.0))

        # qdy must be consumed before num_scr is reused for violations
        s1 = jnp.sum(y * qdy) * inv8                         # Y'QdY
        s2 = jnp.sum(fd_ref[0] * y) * inv8                   # Fd'Y
        stream(blk2)
        nviol = jnp.sum(num_scr[:]) * inv8
        jd = 0.5 * s1 + s2 + 0.5 * md
        jp = (0.5 * jnp.sum(u * dot(u, qp_ref[0])) * inv8
              + jnp.sum(fp_ref[0] * u) * inv8 + 0.5 * mp)
        if gap_comp:
            gap = s1 + s2
            weak_fail = gap > 0.0
        else:
            gap = jp + jd
            weak_fail = jp > -jd
        fail = ((nviol > 0.0) | (gap > eaj) | (gap / jnp.abs(jd) > erj))
        if strict:
            fail = fail | weak_fail
        return jnp.logical_not(fail)

    def qd_row(x):
        """``x Qd`` (row form) via one stream pass.  ``x`` is a VALUE,
        staged through ``den_scr`` (free during the accel step) because
        Mosaic cannot lower dynamic_slice on values, only on refs;
        ``num_scr`` accumulates."""
        den_scr[:] = x
        num_scr[:] = jnp.zeros_like(num_scr)

        def blk(i, s):
            q = s[:, :n_pad]
            num_scr[:] = num_scr[:] + dot(den_scr[:, pl.ds(i * bn, bn)],
                                          q)

        stream(blk)
        return num_scr[:] - theta_ref[0] * den_scr[:]

    def accel_step(y):
        """The corrected projected-gradient accel (solver.accel_step)
        in row form: three stream passes (grad, p'Qd p, safeguard) —
        the price of acceleration beyond VMEM residency.  Runs at the
        check cadence (accel_every == check_every), matching the XLA
        path's chunk ordering so trajectories agree."""
        fd = fd_ref[0]
        grad = qd_row(y) + fd
        p = jnp.where((y > 0.0) | (grad < 0.0), -grad, 0.0)
        pQp = jnp.sum(p * qd_row(p)) * inv8
        alpha = jnp.where(pQp > 0,
                          jnp.sum(p * p) * inv8
                          / jnp.maximum(pQp, 1e-30), 0.0)
        yn = jnp.maximum(y + alpha * p, 0.0)
        fY = 0.5 * jnp.sum(y * (grad + fd)) * inv8
        fYn = (0.5 * jnp.sum(yn * qd_row(yn)) + jnp.sum(fd * yn)) * inv8
        return jnp.where(jnp.broadcast_to(fYn <= fY, y.shape), yn, y)

    y_scr[:] = y0_ref[0]
    u_scr[:] = jnp.zeros_like(u_scr)

    def body(carry):
        h, st, it = carry
        ok = check()
        st = jnp.where(ok, f32(1.0), st)
        it = jnp.where(ok, h, it)

        def upd(_, yprev):
            y_scr[:] = update_sweep()
            return y_scr[:]

        y_old = y_scr[:]
        y_new = lax.fori_loop(0, check_every, upd, y_old)
        if accel:
            y_scr[:] = y_new          # qd_row streams read y via closure
            y_new = accel_step(y_new)
        stalled = jnp.sum(jnp.abs(y_new - y_old)) == 0.0
        frozen = jnp.logical_and(jnp.logical_not(ok), stalled)
        st = jnp.where(frozen, f32(2.0), st)
        it = jnp.where(frozen, h + f32(check_every), it)
        # a just-certified instance must keep its at-check iterate
        y_scr[:] = jnp.where(jnp.broadcast_to(ok, y_old.shape),
                             y_old, y_new)
        return (h + f32(check_every), st, it)

    def cond(carry):
        h, st, _ = carry
        return jnp.logical_and(st == 0.0, h <= f32(max_iters))

    h, st, it = lax.while_loop(cond, body,
                               (f32(1.0), f32(0.0), f32(0.0)))

    ok = check()                               # refresh U/diagnostics
    newly = jnp.logical_and(ok, st == 0.0)
    st = jnp.where(newly, f32(1.0), st)
    it = jnp.where(jnp.logical_or(newly, st == 0.0), h, it)
    y_out[0] = y_scr[:]
    u_out[0] = u_scr[:]
    it_out[0] = jnp.broadcast_to(it, it_out.shape[1:])
    st_out[0] = jnp.broadcast_to(st, st_out.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every", "accel",
                              "eaj", "erj", "strict", "den_eps",
                              "precision", "gap_comp", "interpret"))
def fused_full_solve_distinct_tiled(Qd, theta, Gp, Qp, Qp_inv,
                                    Fp, Fd, Fdp, Fdn, Kp_slack, Mp, Md,
                                    Y0, *, max_iters: int,
                                    check_every: int, accel: bool = False,
                                    eaj: float = 1e-6,
                                    erj: float = 1e-6,
                                    strict: bool = True,
                                    den_eps: float = 1e-30,
                                    precision: str = "highest",
                                    gap_comp: bool = False,
                                    interpret: bool = False):
    """One-launch whole solve for B distinct instances with per-instance
    streamed geometry.  ``Qd (B, N, N)``, ``theta (N, B)`` or ``(B, N)``?
    — ``theta`` is per-instance ``(B, N)``; matrices carry the leading
    batch, vectors the trailing one (same contract as
    ``fused_full_solve_distinct``).  Returns
    ``(Y (N, B), U (M, B), iters (B,), state (B,))``."""
    B, N, _ = Qd.shape
    M = Gp.shape[2]
    bn = BLOCK_N
    n_pad = _round_up(_round_up(max(N, _LANE), _LANE), bn)
    m_pad = _round_up(max(M, _LANE), _LANE)
    dn, dm = n_pad - N, m_pad - M
    f32 = jnp.float32

    # Qd_hat with θ folded on a 0-clamped diagonal, then the combined
    # per-instance stream [Qd_hat | Gp]; padded coords are exact fixed
    # points with zero coupling (see tiled_solve_kernel.py)
    diag = jnp.diagonal(Qd, axis1=1, axis2=2)             # (B, N)
    r = jnp.arange(N)
    qdhat = Qd.at[:, r, r].set(jnp.maximum(diag, 0.0) + theta)
    qdhat = jnp.pad(qdhat, ((0, 0), (0, dn), (0, dn)))
    if dn:
        rp = N + jnp.arange(dn)
        qdhat = qdhat.at[:, rp, rp].set(1.0)
    Gp_p = jnp.pad(Gp, ((0, 0), (0, dn), (0, dm)))
    stream = jnp.concatenate([qdhat, Gp_p], axis=2)       # (B, np, np+mp)

    def pad_mm(A):
        A = A if A.ndim == 3 else jnp.broadcast_to(A, (B,) + A.shape)
        out = jnp.pad(A, ((0, 0), (0, dm), (0, dm)))
        if dm:
            rp = M + jnp.arange(dm)
            out = out.at[:, rp, rp].set(1.0)
        return out

    Qp_p = pad_mm(Qp)
    Qpi_p = pad_mm(Qp_inv)

    def row8(v, width, dpad, fill):
        v2 = jnp.broadcast_to(v.reshape(width, -1), (width, B))
        v2 = jnp.pad(v2.T, ((0, 0), (0, dpad)), constant_values=fill)
        return jnp.broadcast_to(v2[:, None, :],
                                (B, _SUBLANE, width + dpad))

    theta_r = jnp.broadcast_to(
        jnp.pad(theta, ((0, 0), (0, dn)), constant_values=1.0)[:, None, :],
        (B, _SUBLANE, n_pad))
    Fp_r = row8(Fp, M, dm, 0.0)
    Fd_r = row8(Fd, N, dn, 0.0)
    Fdp_r = row8(Fdp, N, dn, 0.0)
    Fdn_r = row8(Fdn, N, dn, 0.0)
    Kps_r = row8(Kp_slack, N, dn, jnp.inf)
    Y0_r = row8(Y0, N, dn, 1.0)
    scal = lambda s: jnp.broadcast_to(
        s.reshape(B, 1, 1).astype(f32), (B, _SUBLANE, _LANE))

    grid = (B,)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    blk = lambda r_, c: pl.BlockSpec((1, r_, c), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM)

    cfg_tuple = (max_iters, check_every, accel, eaj, erj, strict,
                 den_eps, precision, gap_comp)
    dims = (bn, n_pad // bn, n_pad, m_pad)
    y, u, iters, st = pl.pallas_call(
        functools.partial(_kernel, cfg_tuple, dims),
        grid=grid,
        in_specs=[hbm, blk(m_pad, m_pad), blk(m_pad, m_pad),
                  blk(_SUBLANE, n_pad), blk(_SUBLANE, m_pad),
                  blk(_SUBLANE, n_pad), blk(_SUBLANE, n_pad),
                  blk(_SUBLANE, n_pad), blk(_SUBLANE, n_pad),
                  blk(_SUBLANE, _LANE), blk(_SUBLANE, _LANE),
                  blk(_SUBLANE, n_pad)],
        out_specs=[blk(_SUBLANE, n_pad), blk(_SUBLANE, m_pad),
                   blk(_SUBLANE, _LANE), blk(_SUBLANE, _LANE)],
        out_shape=[jax.ShapeDtypeStruct((B, _SUBLANE, n_pad), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, m_pad), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, _LANE), f32),
                   jax.ShapeDtypeStruct((B, _SUBLANE, _LANE), f32)],
        scratch_shapes=[pltpu.VMEM((_SUBLANE, n_pad), f32),   # y
                        pltpu.VMEM((_SUBLANE, n_pad), f32),   # num
                        pltpu.VMEM((_SUBLANE, n_pad), f32),   # den/v
                        pltpu.VMEM((_SUBLANE, m_pad), f32),   # u
                        pltpu.VMEM((2, BLOCK_N, n_pad + m_pad), f32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(stream, Qp_p, Qpi_p, theta_r, Fp_r, Fd_r, Fdn_r, Fdp_r, Kps_r,
      scal(Mp), scal(Md), Y0_r)
    return (y[:, 0, :N].T, u[:, 0, :M].T,
            iters[:, 0, 0].astype(jnp.int32), st[:, 0, 0])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def solve_fused_distinct_tiled(primal, dual, Y0=None, cfg=None,
                               interpret: bool = False):
    """Drop-in analog of
    :func:`pqp_for_mpc_tpu.ops.distinct_kernel.solve_fused_distinct` for
    instances beyond the VMEM-resident budget: per-instance geometry is
    streamed from HBM, one launch for the whole batch.
    ``cfg.accel_every`` must be 0 (same tradeoff as
    :mod:`pqp_for_mpc_tpu.ops.tiled_solve_kernel`)."""
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.solver import (SolveResult, _as2d,
                                        complementarity_gap, costs,
                                        feasibility, termination_fail)

    cfg = cfg or SolverConfig()
    if cfg.accel_every not in (0, cfg.check_every):
        raise ValueError(
            "solve_fused_distinct_tiled supports accel_every in "
            "{0, check_every} (the accel runs at the check cadence; "
            "each step costs three extra Hessian streams)")
    if dual.Qd.ndim != 3:
        raise ValueError("solve_fused_distinct_tiled needs Qd (B, N, N)")
    B, N, _ = dual.Qd.shape
    M = primal.Gp.shape[-1]
    bcast3 = lambda A, r, c: (A if A.ndim == 3
                              else jnp.broadcast_to(A, (B, r, c)))
    # dualize_distinct's theta is (B, N); a shared (N,) theta broadcasts
    theta_b = (jnp.broadcast_to(dual.theta.reshape(1, N), (B, N))
               if dual.theta.ndim == 1 else dual.theta)
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
    kp_slack = primal.Kp + jnp.maximum(cfg.erc * primal.Kp, cfg.eac)
    kp_slack = jnp.broadcast_to(kp_slack.reshape(N, -1), (N, B))

    Y, U, iters, lane_state = fused_full_solve_distinct_tiled(
        dual.Qd, theta_b, bcast3(primal.Gp, N, M),
        bcast3(primal.Qp, M, M), bcast3(primal.Qp_inv, M, M),
        Fp2, Fd2, jnp.broadcast_to(_as2d(dual.Fdp), (N, B)),
        jnp.broadcast_to(_as2d(dual.Fdn), (N, B)), kp_slack, Mp2, Md2,
        Y0, max_iters=cfg.max_iters, check_every=cfg.check_every,
        accel=cfg.accel_every > 0,
        eaj=cfg.eaj, erj=cfg.erj, strict=cfg.strict_weak_duality,
        den_eps=cfg.den_eps, precision=cfg.precision,
        gap_comp=cfg.gap_from_complementarity, interpret=interpret)
    prec = lax.Precision.HIGHEST if cfg.precision == "highest" else None
    feas = feasibility(primal, U, cfg.erc, cfg.eac, prec)
    Jp, Jd = costs(primal, dual, Y, U, prec)
    div = ~jnp.all(jnp.isfinite(Y), axis=0)
    cert = lane_state == 1.0
    gap = (complementarity_gap(dual, Y, prec)
           if cfg.gap_from_complementarity else None)
    fail = termination_fail(feas, Jp, Jd, cfg, gap)
    conv = (cert | ~fail) & ~div
    return SolveResult(U=U, Y=Y, iters=iters, converged=conv,
                       feasible=feas, Jp=Jp, Jd=Jd, diverged=div)


# ---------------------------------------------------------------------------
# Streamed UPDATE kernel (distinct geometry): solve_mixed's bulk engine
# ---------------------------------------------------------------------------

def _upd_kernel(den_eps, precision, bn, nblocks, sym_theta,
                qdhat_ref, theta_ref, fdn_ref, fdp_ref, y0_ref,
                out_ref, y_scr, num_scr, den_scr):
    t = pl.program_id(1)
    i = pl.program_id(2)
    f32 = jnp.float32
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    mdt = qdhat_ref.dtype
    dot = lambda a, b: jnp.dot(a.astype(mdt), b,
                               preferred_element_type=f32,
                               precision=None if mdt == jnp.bfloat16
                               else prec)

    @pl.when(jnp.logical_and(t == 0, i == 0))
    def _init():
        y_scr[:] = y0_ref[0]

    @pl.when(i == 0)
    def _zero():
        num_scr[:] = jnp.zeros_like(num_scr)
        den_scr[:] = jnp.zeros_like(den_scr)

    q = qdhat_ref[0]                       # (bn, n_pad) streamed slab
    yblk = y_scr[:, pl.ds(i * bn, bn)]     # (8, bn) row form
    num_scr[:] = num_scr[:] + dot(yblk, jnp.maximum(-q, 0))
    den_scr[:] = den_scr[:] + dot(yblk, jnp.maximum(q, 0))

    @pl.when(i == nblocks - 1)
    def _apply():
        y = y_scr[:]
        th = theta_ref[0]
        tY = th * y
        num = num_scr[:] + tY + fdn_ref[0]
        if sym_theta:
            # bf16 mode: θ NOT folded into the streamed matrix — the
            # same f32 θ term rides both sides so the split identity of
            # the ONE rounded matrix holds exactly (solve_mixed's
            # consistency rule, ops/tiled_kernel.py)
            den = den_scr[:] + tY + fdp_ref[0]
        else:
            # f32 mode: θ folded into the clamped diagonal on the den
            # side (relu(Qd_hat) carries it), mirrored out of num
            den = den_scr[:] + fdp_ref[0]
        if den_eps:
            den = jnp.maximum(den, den_eps)
        ynew = (num / den) * y
        y_scr[:] = ynew
        out_ref[0] = ynew


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "interpret", "den_eps",
                                    "precision", "dtype"))
def fused_pqp_iterations_distinct_tiled(Qd, theta, Fdn, Fdp, Y,
                                        num_iters: int,
                                        interpret: bool = False,
                                        den_eps: float = 0.0,
                                        precision: str = "highest",
                                        dtype: str = "float32"):
    """``num_iters`` PQP updates for B DISTINCT instances with each
    instance's Hessian streamed from HBM slab-by-slab — the distinct
    twin of :func:`pqp_for_mpc_tpu.ops.tiled_kernel.fused_pqp_iterations_tiled`
    and the bulk-phase engine :func:`pqp_for_mpc_tpu.solver.solve_mixed`
    rides for 3-D ``Qd`` (``cfg.use_pallas``).

    ``Qd (B, N, N)``, ``theta (B, N)``, panels ``(N, B)``.  The iterate
    lives in VMEM as an ``(8, N)`` row-replicated panel per instance
    (the distinct kernels' layout: every matvec is ``(8, bn) @
    (bn, n_pad)`` against the streamed slab, legal because the splits of
    the symmetric Qd are symmetric).

    ``dtype="bfloat16"`` streams each instance's matrix in bfloat16 —
    HALF the f32 stream's bytes and a QUARTER of the einsum path's two
    materialized bf16 splits — under solve_mixed's consistency rules:
    the 0-clamped Qd is rounded ONCE, θ stays OUT of the matrix (the
    same f32 term on both update sides) and is raised to dominate the
    ROUNDED negative rowsums per instance.
    """
    B, N, _ = Qd.shape
    bf16_mode = dtype == "bfloat16"
    n_pad0 = _round_up(max(N, _LANE), _LANE)
    # the bigger bf16 slab only when it tiles the lane-padded N exactly
    # — otherwise the raised n_pad quantum inflates the per-iteration
    # stream by more than the slab win (round-5 review finding: N=1152
    # at bn=256 would pad to 1280, +23% bytes)
    bn = (BLOCK_N_BF16 if bf16_mode and n_pad0 % BLOCK_N_BF16 == 0
          else BLOCK_N)
    n_pad = _round_up(n_pad0, bn)
    dn = n_pad - N
    f32 = jnp.float32

    diag = jnp.diagonal(Qd, axis1=1, axis2=2)
    r = jnp.arange(N)
    if bf16_mode:
        qdhat = Qd.at[:, r, r].set(jnp.maximum(diag, 0.0)) \
            .astype(jnp.bfloat16)
        theta = jnp.maximum(
            theta,
            jnp.sum(jnp.maximum(-qdhat.astype(f32), 0.0), axis=2))
        qdhat = jnp.pad(qdhat, ((0, 0), (0, dn), (0, dn)))
        # padded coords: Qd row 0, θ = 1, forcing 0, Y = 1 — exact fixed
        # point under the symmetric-θ update (num = den = θ·y)
    else:
        qdhat = Qd.at[:, r, r].set(jnp.maximum(diag, 0.0)
                                   + theta)
        qdhat = jnp.pad(qdhat, ((0, 0), (0, dn), (0, dn)))
        if dn:
            rp = N + jnp.arange(dn)
            qdhat = qdhat.at[:, rp, rp].set(1.0)
    theta_r = jnp.broadcast_to(
        jnp.pad(theta.astype(f32), ((0, 0), (0, dn)),
                constant_values=1.0)[:, None, :], (B, _SUBLANE, n_pad))

    def row8(v, fill):
        v2 = jnp.pad(v.T, ((0, 0), (0, dn)), constant_values=fill)
        return jnp.broadcast_to(v2[:, None, :], (B, _SUBLANE, n_pad))

    Fdn_r = row8(jnp.broadcast_to(Fdn, (N, B)), 0.0)
    Fdp_r = row8(jnp.broadcast_to(Fdp, (N, B)), 0.0)
    Y_r = row8(Y, 1.0)

    nblocks = n_pad // bn
    grid = (B, num_iters, nblocks)
    slab = pl.BlockSpec((1, bn, n_pad), lambda b, t, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, _SUBLANE, n_pad), lambda b, t, i: (b, 0, 0),
                       memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_upd_kernel, den_eps, precision, bn, nblocks,
                          bf16_mode),
        grid=grid,
        in_specs=[slab, row, row, row, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((B, _SUBLANE, n_pad), f32),
        scratch_shapes=[pltpu.VMEM((_SUBLANE, n_pad), f32),
                        pltpu.VMEM((_SUBLANE, n_pad), f32),
                        pltpu.VMEM((_SUBLANE, n_pad), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_pad * n_pad * num_iters,
            bytes_accessed=(B * n_pad * n_pad * num_iters
                            * (2 if bf16_mode else 4)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qdhat, theta_r, Fdn_r, Fdp_r, Y_r)
    return out[:, 0, :N].T
