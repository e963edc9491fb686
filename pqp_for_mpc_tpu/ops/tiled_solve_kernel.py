"""HBM-tiled WHOLE-SOLVE Pallas kernel: full convergence-checked PQP
solves in ONE launch for N beyond VMEM residency (VERDICT r2 task 5).

For N ≳ 1800 the split matrices cannot live in VMEM, so round 2's
structure was: Pallas tiled UPDATE kernel (``ops/tiled_kernel.py``,
streaming ``Qd_hat = Qd + diag(θ)`` for half the XLA path's HBM bytes)
relaunched from an XLA ``lax.while_loop`` that ran the four-part check
(``terminate``, PQP_CPU.c:673-687) between kernel calls — every check a
fresh set of XLA launches re-reading Qd and Gp from HBM with no control
over the schedule, and no way to stop streaming early.

This kernel moves the ENTIRE solve inside one ``pallas_call``:

* the iteration axis is NOT a grid dimension (a TPU grid has a fixed
  trip count — no early exit).  Instead the kernel body runs a
  ``lax.while_loop`` whose every sweep hand-streams ``Qd_hat`` (and, in
  check sweeps, ``Gp``) from HBM with double-buffered
  ``pltpu.make_async_copy`` chains — the inputs are bound with
  ``memory_space=ANY`` so they never leave HBM;
* each round = one CHECK pass (recover U, feasibility, costs/gap,
  verdict — the same four-part semantics as ``solver.check_terminate``,
  honoring ``gap_from_complementarity``) + ``check_every`` UPDATE
  passes with per-lane done masks, Jacobi ping-pong between two VMEM
  iterate panels;
* the while loop exits as soon as every lane is certified / stalled /
  diverged-frozen — the HBM stream STOPS, which a grid cannot do.

HBM traffic per round: ``(k + 1)·N² + 2·N·M`` bytes versus the XLA
orchestration's ``2k·N²`` (two materialized splits per update) plus the
check's own reads — and the early exit multiplies the saving by the
fraction of the iteration budget not needed.  This beats the
reference's fusion ceiling (one update's two matvecs in one launch,
``matrixMultiplyCuda_computeupdateY2``, PQP_Fusion.cu:772-846) in its
last remaining regime: a CUDA grid cannot carry an iterate across
launches, let alone a convergence decision.

Restrictions: shared geometry, ``check_every`` EVEN (the Jacobi
ping-pong must return to the primary panel at round boundaries),
``accel_every`` either 0 or ``check_every`` — the projected-gradient
accel runs in-kernel at the check cadence at the price of three extra
Hessian streams per step (gradient, curvature ``p'Qd p``, safeguard).
``M`` (primal dim) must fit VMEM residency for Qp/Qp⁻¹ — true for the
constraint families here (N = 3…4·M).
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

#: operand budget for THIS kernel's resident set (the scoped limit is
#: VMEM_LIMIT_BYTES; the streamed matrices never count against it)
TILED_SOLVE_BUDGET = 80 * 1024 * 1024

#: row-slab height — ops/tiled_kernel.py's sweep found 128 wins or ties
BLOCK_N = 128


def tiled_solve_batch_block(n_pad: int, m_pad: int, b: int,
                            budget: int = TILED_SOLVE_BUDGET) -> int:
    """Largest lane-multiple batch block whose resident set fits:
    Qp/Qp⁻¹, the double-buffered Qd_hat/Gp slabs, θ, six (n_pad, bb)
    panels (×2 pipeline buffers), four m-panels, and the scratch
    (3 n-panels + 2 m-panels)."""
    fixed = (2 * m_pad * m_pad            # Qp, Qp_inv
             + 2 * BLOCK_N * n_pad        # Qd_hat slab, double-buffered
             + 2 * BLOCK_N * m_pad        # Gp slab, double-buffered
             + 2 * n_pad * _LANE) * 4     # θ block (pipeline-buffered)
    avail = budget - fixed
    if avail <= 0:
        return 0
    per_lane = ((6 * n_pad + 4 * m_pad + 6 * _SUBLANE) * 2
                + 3 * n_pad + 2 * m_pad + 4 * _SUBLANE) * 4
    bb = (avail // per_lane) // _LANE * _LANE
    return max(0, min(bb, _round_up(max(b, _LANE), _LANE), 512))


def _kernel(cfg_tuple, dims,
            qdhat_hbm, gp_hbm, qp_ref, qpi_ref, theta_ref,
            fp_ref, fd_ref, fdn_ref, fdp_ref, kps_ref, mp_ref, md_ref,
            y0_ref, valid_ref,
            y_out, u_out, it_out, st_out,
            ya, yb, qdy, v_scr, u_scr, st_scr, it_scr, diff_scr,
            qslab, gslab, qsem, gsem):
    (max_iters, check_every, accel, eaj, erj, strict, den_eps,
     precision, gap_comp) = cfg_tuple
    bn, nblocks, n_pad, m_pad = dims
    f32 = jnp.float32
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                               precision=prec)
    NB = ya.shape
    row = lambda r: r[0:1, :]
    full8 = lambda x: jnp.broadcast_to(x, (_SUBLANE, NB[1]))

    def qdma(slot, i):
        return pltpu.make_async_copy(
            qdhat_hbm.at[pl.ds(i * bn, bn), :], qslab.at[slot],
            qsem.at[slot])

    def gdma(slot, i):
        return pltpu.make_async_copy(
            gp_hbm.at[pl.ds(i * bn, bn), :], gslab.at[slot],
            gsem.at[slot])

    def stream(body, with_gp):
        """Double-buffered loop over the ``nblocks`` row slabs; ``body``
        gets (block index, Qd_hat slab value[, Gp slab value])."""
        qdma(0, 0).start()
        if with_gp:
            gdma(0, 0).start()

        def lb(i, _):
            slot = i % 2

            @pl.when(i + 1 < nblocks)
            def _():
                qdma((i + 1) % 2, i + 1).start()
                if with_gp:
                    gdma((i + 1) % 2, i + 1).start()

            qdma(slot, i).wait()
            if with_gp:
                gdma(slot, i).wait()
                body(i, qslab[slot], gslab[slot])
            else:
                body(i, qslab[slot])
            return None

        lax.fori_loop(0, nblocks, lb, None, unroll=False)

    def update_pass(y_in, y_out_ref, last):
        done_row = row(st_scr[:]) > 0.0

        def blk(i, q):
            y = y_in[:]
            yblk = y_in[pl.ds(i * bn, bn), :]
            th = theta_ref[pl.ds(i * bn, bn), 0:1]
            fdn = fdn_ref[pl.ds(i * bn, bn), :]
            fdp = fdp_ref[pl.ds(i * bn, bn), :]
            # on-the-fly splits of Qd_hat (see ops/tiled_kernel.py)
            num = dot(jnp.maximum(-q, 0.0), y) + th * yblk + fdn
            den = dot(jnp.maximum(q, 0.0), y) + fdp
            if den_eps:
                den = jnp.maximum(den, den_eps)
            new = jnp.where(jnp.broadcast_to(done_row, yblk.shape),
                            yblk, (num / den) * yblk)
            y_out_ref[pl.ds(i * bn, bn), :] = new

            @pl.when(last)
            def _():
                # stall detection: Σ|Y_{t+1} - Y_t| == 0 on the final
                # sweep of the round => exact fixed point
                diff_scr[:] = diff_scr[:] + full8(
                    jnp.sum(jnp.abs(new - yblk), axis=0, keepdims=True))

        stream(blk, with_gp=False)

    def check_pass(h):
        """Four-part verdict at the CURRENT iterate (always in ``ya``):
        stream Qd_hat+Gp once (Qd·Y rows + Gp'Y accumulation), recover
        U, stream Gp once more for feasibility, then the reductions."""
        v_scr[:] = jnp.zeros_like(v_scr)

        def blk_a(i, q, g):
            y = ya[:]
            yblk = ya[pl.ds(i * bn, bn), :]
            th = theta_ref[pl.ds(i * bn, bn), 0:1]
            qdy[pl.ds(i * bn, bn), :] = dot(q, y) - th * yblk
            v_scr[:] = v_scr[:] + dot(g.T, yblk)

        stream(blk_a, with_gp=True)
        u = -dot(qpi_ref[:], v_scr[:] + fp_ref[:])        # (m_pad, bb)
        u_scr[:] = u

        diff_scr[:] = jnp.zeros_like(diff_scr)            # reuse: viol

        def blk_b(i, q, g):
            gu = dot(g, u)
            kps = kps_ref[pl.ds(i * bn, bn), :]
            diff_scr[:] = diff_scr[:] + full8(
                jnp.sum((gu > kps).astype(f32), axis=0, keepdims=True))

        stream(blk_b, with_gp=True)
        feas = row(diff_scr[:]) == 0.0                    # (1, bb)

        y = ya[:]
        s1 = jnp.sum(y * qdy[:], axis=0, keepdims=True)   # Y'QdY
        s2 = jnp.sum(fd_ref[:] * y, axis=0, keepdims=True)
        jd = 0.5 * s1 + s2 + 0.5 * row(md_ref[:])
        jp = (0.5 * jnp.sum(u * dot(qp_ref[:], u), axis=0, keepdims=True)
              + jnp.sum(fp_ref[:] * u, axis=0, keepdims=True)
              + 0.5 * row(mp_ref[:]))
        if gap_comp:
            gap = s1 + s2
            weak_fail = gap > 0.0
        else:
            gap = jp + jd
            weak_fail = jp > -jd
        fail = (jnp.logical_not(feas) | (gap > eaj)
                | (gap / jnp.abs(jd) > erj))
        if strict:
            fail = fail | weak_fail
        ok = jnp.logical_not(fail)

        st = row(st_scr[:])
        it = row(it_scr[:])
        newly = ok & (st == 0.0)
        it = jnp.where(newly, h, it)
        st = jnp.where(newly, f32(1.0), st)
        st_scr[:] = full8(st)
        it_scr[:] = full8(it)

    def qd_col(x):
        """``Qd x`` via one Qd_hat stream pass; result lands in qdy
        (overwritten by the next check pass anyway).  ``x`` is a VALUE,
        staged through ``yb`` (free during the accel step — the round's
        fresh iterate sits in ``ya``) because Mosaic cannot lower
        dynamic_slice on values, only on refs."""
        yb[:] = x

        def blk(i, q):
            th = theta_ref[pl.ds(i * bn, bn), 0:1]
            qdy[pl.ds(i * bn, bn), :] = \
                dot(q, yb[:]) - th * yb[pl.ds(i * bn, bn), :]

        stream(blk, with_gp=False)
        return qdy[:]

    def accel_step(y, done_row):
        """The corrected projected-gradient accel (solver.accel_step):
        three stream passes per step, run at the check cadence
        (accel_every == check_every) to match the XLA path's chunk
        ordering."""
        fd = fd_ref[:]
        grad = qd_col(y) + fd
        p = jnp.where((y > 0.0) | (grad < 0.0), -grad, 0.0)
        pQp = jnp.sum(p * qd_col(p), axis=0, keepdims=True)
        alpha = jnp.where(pQp > 0,
                          jnp.sum(p * p, axis=0, keepdims=True)
                          / jnp.maximum(pQp, 1e-30), 0.0)
        yn = jnp.maximum(y + alpha * p, 0.0)
        fY = 0.5 * jnp.sum(y * (grad + fd), axis=0, keepdims=True)
        fYn = (0.5 * jnp.sum(yn * qd_col(yn), axis=0, keepdims=True)
               + jnp.sum(fd * yn, axis=0, keepdims=True))
        keep = (fYn <= fY) & jnp.logical_not(done_row)
        yn = jnp.where(jnp.broadcast_to(keep, y.shape), yn, y)
        # accel movement counts against the stall detector
        diff_scr[:] = diff_scr[:] + full8(
            jnp.sum(jnp.abs(yn - y), axis=0, keepdims=True))
        return yn

    # --- init (per batch block; scratch is not carried across grid) ---
    ya[:] = y0_ref[:]
    st_scr[:] = jnp.where(valid_ref[:] == 0.0, f32(3.0), f32(0.0))
    it_scr[:] = jnp.zeros_like(it_scr)
    u_scr[:] = jnp.zeros_like(u_scr)

    def body(carry):
        h, _ = carry
        check_pass(h)
        diff_scr[:] = jnp.zeros_like(diff_scr)

        def upd(j, _):
            last = j == check_every - 1

            @pl.when(j % 2 == 0)
            def _():
                update_pass(ya, yb, last)

            @pl.when(j % 2 == 1)
            def _():
                update_pass(yb, ya, last)

            return None

        lax.fori_loop(0, check_every, upd, None)
        # check_every is even => the fresh iterate is back in ya
        if accel:
            ya[:] = accel_step(ya[:], row(st_scr[:]) > 0.0)
        st = row(st_scr[:])
        stalled = (row(diff_scr[:]) == 0.0) & (st == 0.0)
        it = jnp.where(stalled, h + f32(check_every), row(it_scr[:]))
        st = jnp.where(stalled, f32(2.0), st)
        st_scr[:] = full8(st)
        it_scr[:] = full8(it)
        unsolved = jnp.sum((st == 0.0).astype(f32))
        return (h + f32(check_every), unsolved)

    def cond(carry):
        h, unsolved = carry
        return jnp.logical_and(unsolved > 0.0, h <= f32(max_iters))

    h, _ = lax.while_loop(cond, body, (f32(1.0), f32(1.0)))

    # final check so exit diagnostics (U, verdict) reflect the returned
    # iterate even for max_iters lanes — mirrors solve_batched's tail
    st0 = row(st_scr[:])
    check_pass(h)
    st = row(st_scr[:])
    it = jnp.where(st0 > 0.0, row(it_scr[:]),
                   jnp.where(st > 0.0, row(it_scr[:]), h))
    it_scr[:] = full8(it)

    y_out[:] = ya[:]
    u_out[:] = u_scr[:]
    it_out[:] = it_scr[:]
    st_out[:] = st_scr[:]


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every", "accel",
                              "eaj", "erj", "strict", "den_eps",
                              "precision", "gap_comp", "interpret",
                              "block_b"))
def fused_full_solve_tiled(Qd, theta, Gp, Qp, Qp_inv, Fp, Fd, Fdp, Fdn,
                           Kp_slack, Mp, Md, Y0, *,
                           max_iters: int, check_every: int,
                           accel: bool = False,
                           eaj: float = 1e-6, erj: float = 1e-6,
                           strict: bool = True, den_eps: float = 1e-30,
                           precision: str = "highest",
                           gap_comp: bool = False,
                           interpret: bool = False,
                           block_b: int | None = None):
    """Whole-solve launch with the Hessian streamed from HBM.  Takes the
    UNSPLIT ``Qd (N, N)`` + ``theta (N,)`` (the splits are reconstructed
    on the VPU per slab; at N=4096 each materialized split would be
    67 MB).  Returns ``(Y, U, iters, lane_state)`` with the same state
    codes as :func:`pqp_for_mpc_tpu.ops.solve_kernel.fused_full_solve`.
    """
    if check_every % 2:
        raise ValueError("fused_full_solve_tiled needs even check_every "
                         "(Jacobi ping-pong round alignment)")
    N, B = Y0.shape
    M = Fp.shape[0]
    bn = BLOCK_N
    n_pad = _round_up(_round_up(max(N, _LANE), _LANE), bn)
    m_pad = _round_up(max(M, _LANE), _LANE)
    bb = block_b if block_b is not None else \
        tiled_solve_batch_block(n_pad, m_pad, B)
    if bb <= 0:
        raise ValueError(
            f"fused_full_solve_tiled: no batch block fits VMEM for "
            f"N={N}, M={M}")
    b_pad = _round_up(_round_up(max(B, _LANE), _LANE), bb)
    dn, dm, db = n_pad - N, m_pad - M, b_pad - B
    f32 = jnp.float32

    # Qd_hat: θ folded onto a 0-clamped diagonal (ops/tiled_kernel.py);
    # padded dual coords are exact fixed points (diag 1, θ 1, forcing 0,
    # Y 1) with zero coupling and can never violate (Kp slack +inf).
    diag = jnp.diagonal(Qd)
    qdhat = Qd.at[jnp.arange(N), jnp.arange(N)].set(
        jnp.maximum(diag, 0.0) + theta)
    if dn:
        qdhat = jnp.zeros((n_pad, n_pad), f32).at[:N, :N].set(qdhat)
        qdhat = qdhat.at[jnp.arange(N, n_pad),
                         jnp.arange(N, n_pad)].set(1.0)
    theta_p = jnp.pad(theta.astype(f32), (0, dn), constant_values=1.0)
    theta_bc = jnp.broadcast_to(theta_p[:, None], (n_pad, _LANE))
    Gp_p = jnp.zeros((n_pad, m_pad), f32).at[:N, :M].set(Gp) \
        if (dn or dm) else Gp

    def pad_mm(A):
        if not dm:
            return A
        out = jnp.zeros((m_pad, m_pad), f32).at[:M, :M].set(A)
        return out.at[jnp.arange(M, m_pad), jnp.arange(M, m_pad)].set(1.0)

    Qp_p = pad_mm(Qp)
    Qpi_p = pad_mm(Qp_inv)
    Fp_p = jnp.pad(Fp, ((0, dm), (0, db)))
    Fd_p = jnp.pad(Fd, ((0, dn), (0, db)))
    Fdp_p = jnp.pad(Fdp, ((0, dn), (0, db)))
    Fdn_p = jnp.pad(Fdn, ((0, dn), (0, db)))
    Kps_p = jnp.pad(jnp.broadcast_to(Kp_slack.reshape(N, -1), (N, B)),
                    ((0, dn), (0, db)), constant_values=jnp.inf)
    row8 = lambda v: jnp.broadcast_to(
        jnp.pad(v.reshape(1, B), ((0, 0), (0, db))), (_SUBLANE, b_pad))
    Mp_p = row8(Mp)
    Md_p = row8(Md)
    Y0_p = jnp.pad(Y0, ((0, dn), (0, db)), constant_values=1.0)
    valid = jnp.broadcast_to(
        jnp.pad(jnp.ones((1, B), f32), ((0, 0), (0, db))),
        (_SUBLANE, b_pad))

    grid = (b_pad // bb,)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
    panel = lambda r: pl.BlockSpec((r, bb), lambda b: (0, b),
                                   memory_space=pltpu.VMEM)

    cfg_tuple = (max_iters, check_every, accel, eaj, erj, strict,
                 den_eps, precision, gap_comp)
    dims = (bn, n_pad // bn, n_pad, m_pad)
    y, u, iters, state = pl.pallas_call(
        functools.partial(_kernel, cfg_tuple, dims),
        grid=grid,
        in_specs=[hbm, hbm, rep(m_pad, m_pad), rep(m_pad, m_pad),
                  rep(n_pad, _LANE), panel(m_pad), panel(n_pad),
                  panel(n_pad), panel(n_pad), panel(n_pad),
                  panel(_SUBLANE), panel(_SUBLANE), panel(n_pad),
                  panel(_SUBLANE)],
        out_specs=[panel(n_pad), panel(m_pad), panel(_SUBLANE),
                   panel(_SUBLANE)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, b_pad), f32),
                   jax.ShapeDtypeStruct((m_pad, b_pad), f32),
                   jax.ShapeDtypeStruct((_SUBLANE, b_pad), f32),
                   jax.ShapeDtypeStruct((_SUBLANE, b_pad), f32)],
        scratch_shapes=[pltpu.VMEM((n_pad, bb), f32),      # ya
                        pltpu.VMEM((n_pad, bb), f32),      # yb
                        pltpu.VMEM((n_pad, bb), f32),      # qdy
                        pltpu.VMEM((m_pad, bb), f32),      # v
                        pltpu.VMEM((m_pad, bb), f32),      # u
                        pltpu.VMEM((_SUBLANE, bb), f32),   # state
                        pltpu.VMEM((_SUBLANE, bb), f32),   # iters
                        pltpu.VMEM((_SUBLANE, bb), f32),   # diff/viol
                        pltpu.VMEM((2, BLOCK_N, n_pad), f32),
                        pltpu.VMEM((2, BLOCK_N, m_pad), f32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(qdhat, Gp_p, Qp_p, Qpi_p, theta_bc, Fp_p, Fd_p, Fdn_p, Fdp_p,
      Kps_p, Mp_p, Md_p, Y0_p, valid)
    return (y[:N, :B], u[:M, :B], iters[0, :B].astype(jnp.int32),
            state[0, :B])


@functools.partial(jax.jit, static_argnames=("cfg", "interpret",
                                             "block_b"))
def solve_fused_tiled(primal, dual, Y0=None, cfg=None,
                      interpret: bool = False,
                      block_b: int | None = None):
    """Drop-in analog of :func:`pqp_for_mpc_tpu.ops.solve_kernel.solve_fused`
    for N beyond VMEM residency: whole solve in one launch, Hessian
    streamed from HBM.  ``cfg.accel_every`` must be 0 (module
    docstring); ``check_every`` must be even."""
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.solver import (SolveResult, _as2d,
                                        complementarity_gap, costs,
                                        feasibility, termination_fail)

    cfg = cfg or SolverConfig()
    if cfg.accel_every not in (0, cfg.check_every):
        raise ValueError(
            "solve_fused_tiled supports accel_every in {0, check_every} "
            "(the accel runs at the check cadence; each step costs "
            "three extra Hessian streams)")
    if dual.Qd.ndim != 2:
        raise ValueError("solve_fused_tiled requires shared Qd geometry")
    N = dual.n_con
    Fd2 = _as2d(dual.Fd)
    B = Fd2.shape[1]
    if Y0 is None:
        Y0 = jnp.full((N, B), cfg.y0, jnp.float32)
    else:
        Y0 = _as2d(Y0)
        if Y0.shape[1] == 1 and B > 1:
            Y0 = jnp.broadcast_to(Y0, (N, B))
        B = max(B, Y0.shape[1])
    M = primal.Gp.shape[1]
    Fp2 = jnp.broadcast_to(_as2d(primal.Fp), (M, B))
    Fd2 = jnp.broadcast_to(Fd2, (N, B))
    Mp2 = jnp.broadcast_to(jnp.atleast_1d(primal.Mp), (B,))
    Md2 = jnp.broadcast_to(jnp.atleast_1d(dual.Md), (B,))
    kp_slack = primal.Kp + jnp.maximum(cfg.erc * primal.Kp, cfg.eac)

    Y, U, iters, lane_state = fused_full_solve_tiled(
        dual.Qd, dual.theta, primal.Gp, primal.Qp, primal.Qp_inv, Fp2,
        Fd2, jnp.broadcast_to(_as2d(dual.Fdp), (N, B)),
        jnp.broadcast_to(_as2d(dual.Fdn), (N, B)), kp_slack, Mp2, Md2,
        Y0, max_iters=cfg.max_iters, check_every=cfg.check_every,
        accel=cfg.accel_every > 0,
        eaj=cfg.eaj, erj=cfg.erj, strict=cfg.strict_weak_duality,
        den_eps=cfg.den_eps, precision=cfg.precision,
        gap_comp=cfg.gap_from_complementarity, interpret=interpret,
        block_b=block_b)
    prec = (lax.Precision.HIGHEST if cfg.precision == "highest" else None)
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
