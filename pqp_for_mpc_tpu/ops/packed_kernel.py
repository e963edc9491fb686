"""Multi-problem MXU packing for the whole-solve kernel.

The whole-solve kernel (:mod:`pqp_for_mpc_tpu.ops.solve_kernel`) is bound
by MXU systolic occupancy on small duals: the example problem's N=28 pads
to 32, filling only 32 of the array's 128-deep contraction dimension —
the measured roofline position is ~17% of f32 peak (DESIGN.md §3).  The
lane dimension is already saturated by batch-on-lanes, so the residual
4x sits on the SUBLANE/contraction axis.

This kernel recovers it by packing ``G = 128 // n_pad`` independent
problem instances of the SAME geometry along the contraction axis:

* matrices become ``kron(I_G, A)`` — block-diagonal with G identical
  copies, e.g. the example's (32, 32) splits become (128, 128);
* each packed lane column holds G stacked instances; the batch shrinks
  ``B -> B/G`` while every matvec becomes a full-depth
  ``(128, 128) @ (128, bb)`` MXU op.  The zero off-diagonal blocks ride
  inside the systolic array for free — passes through the array are what
  cost time, and there are now G× fewer of them.

The hard part is that the four-part termination test, the stall freeze
and the acceleration step are PER-INSTANCE reductions: a plain
``sum(axis=0)`` over a packed column would mix G instances.  All
reductions become segment reductions expressed as tiny MXU matmuls with
the 0/1 segment-indicator matrix ``E (G, G·n_pad)`` (built in-kernel from
``broadcasted_iota``; rows g >= G are zero so padded segments are inert),
and per-segment verdicts are broadcast back to rows with ``E^T``.  Lane
state (0 active / 1 certified / 2 stalled / 3 padding — same codes as
solve_kernel.py) and iteration stamps live at segment granularity in
``(seg8, bb)`` VMEM scratch.

The packing transform itself (kron of the matrices, panel restacking
``(N, B) -> (G·n_pad, B/G)``) is plain XLA outside the kernel, fused into
the same jit.

Reference anchor: this is the TPU answer to the "small-matrix efficiency"
ceiling of SURVEY §7.2 — the reference's CUDA variants never face it
because a 32-thread-wide GEMV simply underfills nothing on a scalar SM,
while a 128x128 systolic array makes K-occupancy a first-class concern.
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
from pqp_for_mpc_tpu.ops.solve_kernel import (MAX_SOLVE_BLOCK_B,
                                              VMEM_OPERAND_BUDGET)


def pack_factor(n: int) -> int:
    """How many instances of dual dimension ``n`` fit the 128-deep MXU
    contraction axis.  1 means packing buys nothing (use solve_fused)."""
    n_pad = _round_up(max(n, _SUBLANE), _SUBLANE)
    return max(1, _LANE // n_pad)


def _seg_mats(G: int, seg8: int, n_pad: int, np_: int):
    """Segment indicator E (seg8, np_) and its transpose, as f32 iota
    comparisons (Mosaic-friendly constants, no operand traffic).
    E[g, i] = 1 iff i // n_pad == g and g < G."""
    rows = lax.broadcasted_iota(jnp.int32, (seg8, np_), 0)
    cols = lax.broadcasted_iota(jnp.int32, (seg8, np_), 1)
    E = jnp.where((cols // n_pad == rows) & (rows < G), 1.0, 0.0)
    return E, E.T


def _kernel(cfg_tuple, dims, qdn_ref, qdp_ref, qd_ref, gp_ref, qp_ref,
            qpi_ref, fp_ref, fd_ref, fdp_ref, fdn_ref, kps_ref, mp_ref,
            md_ref, y0_ref, valid_ref, y_out, u_out, it_out, st_out,
            y_scr, st_scr, it_scr):
    (max_iters, check_every, accel_every, eaj, erj, strict, den_eps,
     precision, gap_comp) = cfg_tuple
    G, seg8, n_pad, m_pad = dims
    NP = G * n_pad
    MP = G * m_pad
    f32 = jnp.float32

    qdn = qdn_ref[:]
    qdp = qdp_ref[:]
    qd = qd_ref[:]
    gp = gp_ref[:]
    qp = qp_ref[:]
    qpi = qpi_ref[:]
    fp = fp_ref[:]
    fd = fd_ref[:]
    fdp = fdp_ref[:]
    fdn = fdn_ref[:]
    kps = kps_ref[:]

    En, EnT = _seg_mats(G, seg8, n_pad, NP)
    Em, _ = _seg_mats(G, seg8, m_pad, MP)

    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                               precision=prec)
    # segment reductions: always full-f32 passes — they certify
    # convergence, and E is 0/1 so there is nothing to round anyway
    hdot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)
    seg_n = lambda x: hdot(En, x)          # (NP, bb) -> (seg8, bb)
    seg_m = lambda x: hdot(Em, x)
    rep_n = lambda s: hdot(EnT, s)         # (seg8, bb) -> (NP, bb)

    def one_update(y, done_full):
        num = dot(qdn, y) + fdn
        den = dot(qdp, y) + fdp
        if den_eps:
            den = jnp.maximum(den, den_eps)
        yn = (num / den) * y
        return jnp.where(done_full, y, yn)

    def accel(y, done_seg):
        grad = dot(qd, y) + fd
        p = jnp.where((y > 0.0) | (grad < 0.0), -grad, 0.0)
        pQp = seg_n(p * dot(qd, p))                       # (seg8, bb)
        alpha = jnp.where(pQp > 0,
                          seg_n(p * p) / jnp.maximum(pQp, 1e-30), 0.0)
        yn = jnp.maximum(y + rep_n(alpha) * p, 0.0)
        fY = 0.5 * seg_n(y * (grad + fd))
        fYn = 0.5 * seg_n(yn * dot(qd, yn)) + seg_n(fd * yn)
        keep = (fYn <= fY) & jnp.logical_not(done_seg)
        return jnp.where(rep_n(keep.astype(f32)) > 0.5, yn, y)

    mp_row = mp_ref[:]        # (seg8, bb) per-segment scalars
    md_row = md_ref[:]

    def check(y):
        u = -dot(qpi, dot(gp.T, y) + fp)                  # (MP, bb)
        gpu = dot(gp, u)
        nviol = seg_n((gpu > kps).astype(f32))
        feas = nviol == 0.0
        s1 = seg_n(y * dot(qd, y))                        # Y'QdY per seg
        s2 = seg_n(fd * y)                                # Fd'Y per seg
        jd = 0.5 * s1 + s2 + 0.5 * md_row
        jp = 0.5 * seg_m(u * dot(qp, u)) + seg_m(fp * u) + 0.5 * mp_row
        if gap_comp:
            # complementarity gap Y'(Qd Y + Fd) per segment
            # (SolverConfig.gap_from_complementarity)
            gap = s1 + s2
            weak_fail = gap > 0.0
        else:
            gap = jp + jd
            weak_fail = jp > -jd
        fail = (jnp.logical_not(feas) | (gap > eaj)
                | (gap / jnp.abs(jd) > erj))
        if strict:
            fail = fail | weak_fail
        return jnp.logical_not(fail), u                   # (seg8, bb)

    n_chunks = max(1, check_every // max(accel_every, 1)) \
        if accel_every else 1

    # Same scalar-only while carry as solve_kernel.py (Mosaic miscompiles
    # scf.while with vector carries); all vector state in VMEM scratch.
    y_scr[:] = y0_ref[:]
    st_scr[:] = jnp.where(valid_ref[:] == 0.0, f32(3.0), f32(0.0))
    it_scr[:] = jnp.zeros_like(st_scr)

    def body(carry):
        h, _ = carry
        y = y_scr[:]
        st = st_scr[:]                                    # (seg8, bb)
        it = it_scr[:]
        done_seg = st > 0.0
        ok_seg, _ = check(y)
        newly = ok_seg & jnp.logical_not(done_seg)
        it = jnp.where(newly, h, it)
        st = jnp.where(newly, f32(1.0), st)
        done_seg = done_seg | ok_seg
        done_full = rep_n(done_seg.astype(f32)) > 0.5
        y_prev = y
        if accel_every:
            def chunk(_, yc):
                yc = lax.fori_loop(
                    0, accel_every,
                    lambda _, z: one_update(z, done_full), yc)
                return accel(yc, done_seg)
            y = lax.fori_loop(0, n_chunks, chunk, y)
        else:
            y = lax.fori_loop(0, check_every,
                              lambda _, z: one_update(z, done_full), y)
        # per-segment stall freeze (see solve_kernel.py)
        stalled = seg_n(jnp.abs(y - y_prev)) == 0.0
        newly_stalled = stalled & (st == 0.0)
        it = jnp.where(newly_stalled, h + f32(check_every), it)
        st = jnp.where(newly_stalled, f32(2.0), st)
        y_scr[:] = y
        st_scr[:] = st
        it_scr[:] = it
        unsolved = jnp.sum((st == 0.0).astype(f32))
        return (h + f32(check_every), unsolved)

    def cond(carry):
        h, unsolved = carry
        return jnp.logical_and(unsolved > 0.0, h <= f32(max_iters))

    h, _ = lax.while_loop(cond, body, (f32(1.0), f32(1.0)))

    y = y_scr[:]
    st = st_scr[:]
    it = it_scr[:]
    ok_seg, u = check(y)
    newly = ok_seg & (st == 0.0)
    it = jnp.where(newly, h, it)
    st = jnp.where(newly, f32(1.0), st)
    it = jnp.where(st > 0.0, it, h)
    y_out[:] = y
    u_out[:] = u
    it_out[:] = it
    st_out[:] = st


def packed_batch_block(G: int, n_pad: int, m_pad: int, b_pack: int,
                       budget: int = VMEM_OPERAND_BUDGET) -> int:
    """Packed-column block size under the VMEM operand budget (same
    accounting as solve_kernel_batch_block with NP/MP-sized panels; the
    vreg cap is per packed column, which carries G lanes' rows)."""
    NP, MP = G * n_pad, G * m_pad
    seg8 = _round_up(G, _SUBLANE)
    mats = (3 * NP * NP + NP * MP + 2 * MP * MP) * 4
    avail = budget - mats
    if avail <= 0:
        return 0
    # per-segment scalar tiles are (seg8, bb) — seg8 can exceed
    # _SUBLANE when G > 8 — and two of the three scratch buffers are
    # (seg8, bb), not (NP, bb) (ADVICE r2 #4)
    per_col = (2 * MP + 6 * NP + 5 * seg8) * 4 * 2 \
        + (NP + 2 * seg8) * 4
    bb = avail // per_col
    bb = (bb // _LANE) * _LANE
    vreg_cap = max(_LANE, (256 * 1024 // (3 * NP)) // _LANE * _LANE)
    return max(0, min(bb, b_pack, MAX_SOLVE_BLOCK_B, vreg_cap))


def _pack_panel(X, n_pad, G, Bc, row_fill=0.0, col_fill=0.0):
    """(N, B) -> (G*n_pad, Bc): instance g of packed column c is original
    lane g*Bc + c (contiguous batch groups), rows padded to n_pad."""
    N, B = X.shape
    Xp = jnp.pad(X, ((0, n_pad - N), (0, 0)), constant_values=row_fill)
    Xp = jnp.pad(Xp, ((0, 0), (0, G * Bc - B)), constant_values=col_fill)
    return Xp.reshape(n_pad, G, Bc).transpose(1, 0, 2).reshape(
        G * n_pad, Bc)


def _unpack_panel(P, n_pad, G, N, B):
    """Inverse of :func:`_pack_panel` (drops padding)."""
    Bc = P.shape[1]
    X = P.reshape(G, n_pad, Bc).transpose(1, 0, 2).reshape(
        n_pad, G * Bc)
    return X[:N, :B]


def _pad_sq(A, size, diag):
    n = A.shape[0]
    if size == n:
        return A
    out = jnp.zeros((size, size), jnp.float32).at[:n, :n].set(A)
    if diag:
        out = out.at[jnp.arange(n, size), jnp.arange(n, size)].set(diag)
    return out


@functools.partial(
    jax.jit, static_argnames=("max_iters", "check_every", "accel_every",
                              "eaj", "erj", "strict", "den_eps",
                              "precision", "gap_comp", "interpret",
                              "block_b"))
def fused_full_solve_packed(Qdn_theta, Qdp_theta, Qd, Gp, Qp, Qp_inv,
                            Fp, Fd, Fdp, Fdn, Kp_slack, Mp, Md, Y0,
                            *, max_iters: int, check_every: int,
                            accel_every: int = 0, eaj: float = 1e-6,
                            erj: float = 1e-6, strict: bool = True,
                            den_eps: float = 1e-30, gap_comp: bool = False,
                            precision: str = "highest",
                            interpret: bool = False,
                            block_b: int | None = None):
    """Whole-solve kernel with G instances packed per lane column.

    Same contract as :func:`pqp_for_mpc_tpu.ops.solve_kernel.fused_full_solve`
    (shared geometry, per-lane ``Kp_slack`` allowed); requires the dual
    dimension to pack (``pack_factor(N) > 1``), else raises.
    """
    N, B = Y0.shape
    M = Fp.shape[0]
    n_pad = _round_up(max(N, _SUBLANE), _SUBLANE)
    m_pad = _round_up(max(M, _SUBLANE), _SUBLANE)
    G = _LANE // n_pad
    if G <= 1:
        raise ValueError(
            f"fused_full_solve_packed: N={N} pads to {n_pad} which does "
            "not pack (G=1); use fused_full_solve")
    seg8 = _round_up(G, _SUBLANE)
    NP, MP = G * n_pad, G * m_pad

    # packed columns: pad B to G * Bc with Bc lane-aligned and divisible
    # into batch blocks
    Bc = _round_up(-(-B // G), _LANE)
    bb = block_b if block_b is not None else \
        packed_batch_block(G, n_pad, m_pad, Bc)
    if bb <= 0:
        raise ValueError(
            f"fused_full_solve_packed: N={N}, M={M}, G={G} exceed the "
            "VMEM operand budget; use solve_fused")
    Bc = _round_up(Bc, bb)
    f32 = jnp.float32

    eyeG = jnp.eye(G, dtype=f32)
    kron = lambda A: jnp.kron(eyeG, A)
    # padded dual/primal coords: identity diagonal + zero forcing (exact
    # update fixed points contributing 0 to every segment reduction —
    # same scheme as fused_full_solve)
    Qdn_p = kron(_pad_sq(Qdn_theta, n_pad, 1.0))
    Qdp_p = kron(_pad_sq(Qdp_theta, n_pad, 1.0))
    Qd_p = kron(_pad_sq(Qd, n_pad, 0.0))
    Gp_p = kron(jnp.zeros((n_pad, m_pad), f32).at[:N, :M].set(Gp)
                if (n_pad != N or m_pad != M) else Gp)
    Qp_p = kron(_pad_sq(Qp, m_pad, 1.0))
    Qpi_p = kron(_pad_sq(Qp_inv, m_pad, 1.0))

    pack_n = functools.partial(_pack_panel, n_pad=n_pad, G=G, Bc=Bc)
    Fp_p = _pack_panel(Fp, m_pad, G, Bc)
    Fd_p = pack_n(Fd)
    Fdp_p = pack_n(Fdp)
    Fdn_p = pack_n(Fdn)
    Kps_p = pack_n(jnp.broadcast_to(Kp_slack.reshape(N, -1), (N, B)),
                   row_fill=jnp.inf, col_fill=jnp.inf)
    Y0_p = pack_n(Y0, row_fill=1.0, col_fill=1.0)

    def seg_row(v):  # (B,) per-instance scalars -> (seg8, Bc)
        vp = jnp.pad(v.reshape(1, B), ((0, 0), (0, G * Bc - B)))
        return jnp.pad(vp.reshape(G, Bc), ((0, seg8 - G), (0, 0)))

    Mp_p = seg_row(Mp)
    Md_p = seg_row(Md)
    valid = seg_row(jnp.ones((B,), f32))

    grid = (Bc // bb,)
    rep = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
    panel = lambda r: pl.BlockSpec((r, bb), lambda b: (0, b),
                                   memory_space=pltpu.VMEM)

    cfg_tuple = (max_iters, check_every, accel_every, eaj, erj, strict,
                 den_eps, precision, gap_comp)
    y, u, iters, st = pl.pallas_call(
        functools.partial(_kernel, cfg_tuple, (G, seg8, n_pad, m_pad)),
        grid=grid,
        in_specs=[rep(NP, NP), rep(NP, NP), rep(NP, NP), rep(NP, MP),
                  rep(MP, MP), rep(MP, MP),
                  panel(MP), panel(NP), panel(NP), panel(NP),
                  panel(NP), panel(seg8), panel(seg8), panel(NP),
                  panel(seg8)],
        out_specs=[panel(NP), panel(MP), panel(seg8), panel(seg8)],
        out_shape=[jax.ShapeDtypeStruct((NP, Bc), f32),
                   jax.ShapeDtypeStruct((MP, Bc), f32),
                   jax.ShapeDtypeStruct((seg8, Bc), f32),
                   jax.ShapeDtypeStruct((seg8, Bc), f32)],
        scratch_shapes=[pltpu.VMEM((NP, bb), f32),
                        pltpu.VMEM((seg8, bb), f32),
                        pltpu.VMEM((seg8, bb), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(Qdn_p, Qdp_p, Qd_p, Gp_p, Qp_p, Qpi_p, Fp_p, Fd_p, Fdp_p, Fdn_p,
      Kps_p, Mp_p, Md_p, Y0_p, valid)

    Y = _unpack_panel(y, n_pad, G, N, B)
    U = _unpack_panel(u, m_pad, G, M, B)
    iters_b = iters[:G].reshape(G * Bc)[:B].astype(jnp.int32)
    st_b = st[:G].reshape(G * Bc)[:B]
    return Y, U, iters_b, st_b


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def solve_fused_packed(primal, dual, Y0=None, cfg=None,
                       interpret: bool = False):
    """Drop-in analog of :func:`pqp_for_mpc_tpu.ops.solve_kernel.solve_fused`
    using the contraction-packed kernel.  Shared-geometry batches with
    ``pack_factor(N) > 1`` only."""
    from pqp_for_mpc_tpu.config import SolverConfig
    from pqp_for_mpc_tpu.solver import (SolveResult, _as2d, costs,
                                        feasibility, termination_fail)

    cfg = cfg or SolverConfig()
    if dual.Qd.ndim != 2:
        raise ValueError("solve_fused_packed requires shared Qd geometry")
    N = dual.n_con
    Fd2 = _as2d(dual.Fd)
    B = Fd2.shape[1]
    if Y0 is None:
        Y0 = jnp.full((N, B), cfg.y0, jnp.float32)
    else:
        Y0 = _as2d(Y0)
        if Y0.shape[1] == 1 and B > 1:
            Y0 = jnp.broadcast_to(Y0, (N, B))
        elif B > 1 and Y0.shape[1] != B:
            raise ValueError(
                f"warm start batch {Y0.shape[1]} != instance batch {B}")
        B = max(B, Y0.shape[1])
    Fp2 = jnp.broadcast_to(_as2d(primal.Fp), (primal.Gp.shape[1], B))
    Fd2 = jnp.broadcast_to(Fd2, (N, B))
    Mp2 = jnp.broadcast_to(jnp.atleast_1d(primal.Mp), (B,))
    Md2 = jnp.broadcast_to(jnp.atleast_1d(dual.Md), (B,))
    kp_slack = primal.Kp + jnp.maximum(cfg.erc * primal.Kp, cfg.eac)
    if kp_slack.ndim == 2 and kp_slack.shape[1] not in (1, B):
        raise ValueError(
            f"Kp batch {kp_slack.shape[1]} != instance batch {B}")

    Y, U, iters, lane_state = fused_full_solve_packed(
        dual.Qdn_theta, dual.Qdp_theta, dual.Qd, primal.Gp, primal.Qp,
        primal.Qp_inv, Fp2,
        Fd2, jnp.broadcast_to(_as2d(dual.Fdp), (N, B)),
        jnp.broadcast_to(_as2d(dual.Fdn), (N, B)), kp_slack, Mp2, Md2, Y0,
        max_iters=cfg.max_iters, check_every=cfg.check_every,
        accel_every=cfg.accel_every, eaj=cfg.eaj, erj=cfg.erj,
        strict=cfg.strict_weak_duality, den_eps=cfg.den_eps,
        precision=cfg.precision,
        gap_comp=cfg.gap_from_complementarity, interpret=interpret)
    prec = (lax.Precision.HIGHEST if cfg.precision == "highest" else None)
    feas = feasibility(primal, U, cfg.erc, cfg.eac, prec)
    Jp, Jd = costs(primal, dual, Y, U, prec)
    div = ~jnp.all(jnp.isfinite(Y), axis=0)
    cert = lane_state == 1.0
    # rescue verdict honors cfg.gap_from_complementarity (ADVICE r2 #1)
    from pqp_for_mpc_tpu.solver import complementarity_gap
    gap = (complementarity_gap(dual, Y, prec)
           if cfg.gap_from_complementarity else None)
    fail = termination_fail(feas, Jp, Jd, cfg, gap)
    conv = (cert | ~fail) & ~div
    return SolveResult(U=U, Y=Y, iters=iters, converged=conv,
                       feasible=feas, Jp=Jp, Jd=Jd, diverged=div)
