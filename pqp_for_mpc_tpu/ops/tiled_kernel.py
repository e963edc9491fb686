"""HBM-tiled PQP update kernel for N beyond VMEM capacity.

The resident kernels (:func:`pqp_for_mpc_tpu.ops.kernels.fused_pqp_iterations`,
the whole-solve kernels) require both split matrices ``Qd^± + θ`` to fit
in VMEM — true up to N ≈ 1800.  Beyond that (the reference's largest
fixture is N=1500, ``testing/sample test/test1.txt``; a TPU-first design
should keep going) the matrices live in HBM and each iteration is
necessarily bandwidth-bound: the whole Hessian must stream through VMEM
once per update.

The TPU-native trick here is to stream HALF the bytes the XLA path does.
XLA's update (:func:`pqp_for_mpc_tpu.solver.pqp_update`) multiplies by the
two materialized splits, reading ``2·N²·4`` bytes/iteration from HBM —
and it cannot do better, because XLA does not fuse elementwise producers
into dot *operands*.  This kernel streams the single combined matrix

    ``Qd_hat = Qd + diag(θ)``        (N² · 4 bytes/iteration)

slab-by-slab and reconstructs both splits on the VPU in VMEM::

    Qd^+ + θ·I  =  relu(Qd_hat)              (diag: Qd_ii + θ_i ≥ 0)
    Qd^- + θ·I  =  relu(-Qd_hat) + θ·I       (θ·I applied as θ_i · y_i)

which is exact whenever ``diag(Qd) ≥ 0`` — guaranteed by construction
since ``Qd = Gp Qp⁻¹ Gp'`` is PSD (computeQd, PQP_CPU.c:440-443); the
wrapper clamps the diagonal at 0 so float-noise negatives cannot flip a
relu (the clamp perturbs entries only at round-off scale).  The relu
costs ``2·bn·N`` VPU ops per slab against ``4·bn·N·B`` MXU flops — noise.

Grid layout: ``(batch_blocks, num_iters, row_blocks)``, all sequential
("arbitrary") — TPU grids execute in order on the core, which is what
makes cross-row-block iteration dependencies expressible at all (a CUDA
grid cannot do this in one launch; the reference's fusion ceiling is one
update, PQP_Fusion.cu:772-846).  The iterate ping-pongs between two VMEM
scratch panels (read the full old Y, write the new rows) because the
update needs the complete previous iterate — a Jacobi sweep, not
Gauss-Seidel.  Qd_hat row slabs are re-streamed every iteration by the
BlockSpec index map; Pallas double-buffers the fetch behind the current
slab's matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqp_for_mpc_tpu.ops.kernels import (_LANE, _SUBLANE, _round_up,
                                         VMEM_BUDGET, VMEM_LIMIT_BYTES)

#: row-slab cap (f32 stream).  Swept on v5e at N=4096/highest-precision:
#: B=128: bn=128 → 16.4 TF, 256 → 16.4, 512 → 12.3, 1024 → 13.8,
#: 2048 → 14.8 (XLA path: 12.8); B=256: bn=128 → 21.6 TF, 256 → 15.0,
#: 512 → 17.8 (XLA: 19.2).  Smaller slabs pipeline the HBM stream behind
#: the MXU better; 128 wins or ties every config.
MAX_BLOCK_N = 128

#: row-slab cap for the bfloat16 stream: the 2-byte slab halves the DMA
#: per row, so the r2 f32 optimum is stale there — round-5 sweep on the
#: solve_mixed N=4096/B=128 workload: bn=128 → 0.530 s, 256 → 0.494,
#: 512 → 0.484 (+9.5%), 1024 → 0.572 (regresses).  Grid-step fixed cost
#: amortizes over the bigger slab until the slab DMA outgrows the
#: double-buffer window.
MAX_BLOCK_N_BF16 = 512


def pick_tiled_blocks(n: int, b: int,
                      budget: int = VMEM_BUDGET,
                      max_block_n: int = MAX_BLOCK_N,
                      slab_bytes: int = 4) -> tuple[int, int]:
    """Choose ``(block_n, block_b)`` so the working set fits ``budget``:
    the double-buffered ``(bn, n_pad)`` Qd_hat slab, two full ``(n_pad,
    bb)`` Y scratch panels, the double-buffered Y0 input block, and the
    small forcing/θ/out blocks.  ``bn`` is kept a multiple of 128 so the
    padded N (a multiple of ``bn``) stays lane-aligned, and is balanced
    across row blocks to minimize padding waste (streamed bytes scale as
    ``n_pad²``).  Returns ``(0, 0)`` if even the minimum (bn=128, bb=128)
    does not fit — N ≈ 12k at the default budget."""
    n_pad = _round_up(max(n, _LANE), _LANE)
    bb = min(_round_up(max(b, _LANE), _LANE), 2 * _LANE)
    while bb >= _LANE:
        # Y scratch x2 + Y0 block x2 (double-buffered) + out x2
        panels = 6 * n_pad * bb * 4
        avail = budget - panels
        # slab, x2 double-buffered, at the STREAM dtype's width (the
        # bf16 stream fits twice the rows — round-5 review finding:
        # budgeting it at f32 silently halved MAX_BLOCK_N_BF16's win
        # in exactly the large-N regime it targets)
        cap = (avail // (2 * slab_bytes * n_pad)) // _LANE * _LANE
        if cap >= _LANE:
            # choose the bn <= cap that minimizes the final padded N
            # (the kernel re-rounds n_pad up to a bn multiple and
            # streamed bytes scale as n_pad^2 — a bigger slab that
            # overshoots the padding loses more than it amortizes;
            # tie-break toward the bigger slab)
            best_bn, best_pad = _LANE, None
            c = min(cap, max_block_n)
            while c >= _LANE:
                pad = _round_up(n_pad, c) - n_pad
                if best_pad is None or pad < best_pad:
                    best_bn, best_pad = c, pad
                c -= _LANE
            return (best_bn, bb)
        bb //= 2
    return (0, 0)


def _kernel(num_iters, den_eps, precision, bn, sym_theta,
            qdhat_ref, theta_ref,
            fdn_ref, fdp_ref, y0_ref, out_ref, ya_scr, yb_scr):
    t = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(jnp.logical_and(t == 0, i == 0))
    def _init():
        ya_scr[:] = y0_ref[:]

    f32 = jnp.float32
    qdhat = qdhat_ref[:]              # (bn, n_pad) streamed slab
    th = theta_ref[:, 0:1]            # (bn, 1) — θ for this row block
    fdn = fdn_ref[:]
    fdp = fdp_ref[:]
    # precision: see distinct_kernel.py — Mosaic's default f32 dot uses
    # fast bf16 MXU passes; "highest" forces full-f32 passes.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)
    mdt = qdhat.dtype
    dot = lambda a, b: jnp.dot(a, b.astype(mdt),
                               preferred_element_type=f32,
                               precision=None if mdt == jnp.bfloat16
                               else prec)

    def step(y_in_ref, y_out_ref):
        y = y_in_ref[:]                               # full (n_pad, bb)
        yblk = y_in_ref[pl.ds(i * bn, bn), :]         # this block's rows
        if sym_theta:
            # bf16 mode: θ NOT folded into the streamed matrix — both
            # sides carry the same f32 θ term so the split identity of
            # the ONE rounded matrix holds exactly (solve_mixed's
            # consistency requirement; an f32 θ against a rounded
            # θ-in-diagonal would bias the update ratio)
            tY = th * yblk
            num = dot(jnp.maximum(-qdhat, 0), y) + tY + fdn
            den = dot(jnp.maximum(qdhat, 0), y) + tY + fdp
        else:
            # on-the-fly splits of Qd_hat = Qd + θ·I (module docstring)
            num = dot(jnp.maximum(-qdhat, 0), y) + th * yblk + fdn
            den = dot(jnp.maximum(qdhat, 0), y) + fdp
        if den_eps:
            den = jnp.maximum(den, den_eps)
        new = (num / den) * yblk
        y_out_ref[pl.ds(i * bn, bn), :] = new
        # output is a full-column block (index depends only on the batch
        # block) so it is visited contiguously — revisiting a flushed
        # (i, b) output block across iterations is not guaranteed Pallas
        # semantics (strict interpret mode rejects it)
        out_ref[pl.ds(i * bn, bn), :] = new

    # ping-pong on iteration parity: read the complete old iterate, write
    # the new rows (Jacobi); pl.when duplicates the body rather than
    # dynamically indexing scratch (Mosaic-safe).
    @pl.when(t % 2 == 0)
    def _even():
        step(ya_scr, yb_scr)

    @pl.when(t % 2 == 1)
    def _odd():
        step(yb_scr, ya_scr)


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "interpret", "block_n",
                                    "block_b", "den_eps", "precision",
                                    "dtype"))
def fused_pqp_iterations_tiled(Qd: jax.Array, theta: jax.Array,
                               Fdn: jax.Array, Fdp: jax.Array,
                               Y: jax.Array, num_iters: int,
                               interpret: bool = False,
                               block_n: int | None = None,
                               block_b: int | None = None,
                               den_eps: float = 0.0,
                               precision: str = "highest",
                               dtype: str = "float32") -> jax.Array:
    """``num_iters`` PQP updates with the Hessian streamed from HBM.

    Drop-in semantic equivalent of
    :func:`pqp_for_mpc_tpu.ops.kernels.fused_pqp_iterations` for N too
    large for VMEM residency, taking the *unsplit* ``Qd (N, N)`` plus
    ``theta (N,)`` instead of the materialized splits (so the caller
    never has to form them — at N=4096 each split is 67 MB).

    Shapes: ``Qd (N, N)``, ``theta (N,)``, panels ``(N, B)``.
    Exact wrt the XLA path whenever ``diag(Qd) ≥ 0`` (PSD construction);
    the diagonal is clamped at 0 to guard float-noise negatives.

    ``dtype="bfloat16"`` streams the matrix in bfloat16 — HALF the
    HBM bytes of the f32 stream and a QUARTER of the XLA split path:
    the bulk-phase engine of :func:`pqp_for_mpc_tpu.solver.solve_mixed`
    (whose consistency rules apply: the clamped Qd is rounded ONCE with
    θ kept OUT of the matrix and applied as the same f32 term on both
    sides of the update, and θ is raised to dominate the ROUNDED
    negative rowsums).  The iterate stays float32 in VMEM; only the
    matvec operand is cast.
    """
    N, B = Y.shape
    bf16_sel = dtype == "bfloat16"
    bn0, bb0 = pick_tiled_blocks(
        N, B, max_block_n=(MAX_BLOCK_N_BF16 if bf16_sel else MAX_BLOCK_N),
        slab_bytes=(2 if bf16_sel else 4))
    bn = block_n if block_n is not None else bn0
    bb = block_b if block_b is not None else bb0
    if bn <= 0 or bb <= 0:
        raise ValueError(
            f"fused_pqp_iterations_tiled: no block plan fits VMEM for "
            f"N={N}, B={B}")
    # n_pad must tile into both the 128-lane quantum (slab minor dim) and
    # bn row blocks
    n_pad = _round_up(max(N, _LANE), _LANE)
    n_pad = _round_up(n_pad, bn)
    b_pad = _round_up(_round_up(max(B, _LANE), _LANE), bb)
    dn, db = n_pad - N, b_pad - B
    f32 = jnp.float32
    bf16_mode = dtype == "bfloat16"

    diag = jnp.diagonal(Qd)
    if bf16_mode:
        # ONE rounding of the clamped matrix; θ stays out (sym_theta) and
        # is raised to dominate the ROUNDED negative rowsums so the
        # multiplicative update stays monotone for the perturbed problem
        qdhat = Qd.at[jnp.arange(N), jnp.arange(N)].set(
            jnp.maximum(diag, 0.0)).astype(jnp.bfloat16)
        theta = jnp.maximum(
            theta, jnp.sum(jnp.maximum(-qdhat.astype(f32), 0.0), axis=1))
        if dn:
            # padded coords: Qd row = 0, θ = 1, forcing 0, Y = 1 — exact
            # fixed point under the symmetric-θ update (num = den = θ·y)
            qdhat = jnp.zeros((n_pad, n_pad), jnp.bfloat16) \
                .at[:N, :N].set(qdhat)
    else:
        # Qd_hat = Qd + diag(max(diag(Qd), 0) - diag(Qd) + θ): clamp + fold
        qdhat = Qd.at[jnp.arange(N), jnp.arange(N)].set(
            jnp.maximum(diag, 0.0) + theta)
        if dn:
            # padded coords: Qd_hat = I, θ = 1, forcing 0, Y = 1 — exact
            # fixed point (num = θ·y = 1, den = relu(1)·1 = 1) with zero
            # off-diagonal coupling into real coordinates.
            qdhat = jnp.zeros((n_pad, n_pad), f32).at[:N, :N].set(qdhat)
            qdhat = qdhat.at[jnp.arange(N, n_pad),
                             jnp.arange(N, n_pad)].set(1.0)
    theta_p = jnp.pad(theta.astype(f32), (0, dn), constant_values=1.0)
    theta_bc = jnp.broadcast_to(theta_p[:, None], (n_pad, _LANE))
    Fdn_p = jnp.pad(Fdn, ((0, dn), (0, db)))
    Fdp_p = jnp.pad(Fdp, ((0, dn), (0, db)))
    Y_p = jnp.pad(Y, ((0, dn), (0, db)), constant_values=1.0)

    grid = (b_pad // bb, num_iters, n_pad // bn)
    slab = pl.BlockSpec((bn, n_pad), lambda b, t, i: (i, 0),
                        memory_space=pltpu.VMEM)
    th_spec = pl.BlockSpec((bn, _LANE), lambda b, t, i: (i, 0),
                           memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((bn, bb), lambda b, t, i: (i, b),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((n_pad, bb), lambda b, t, i: (0, b),
                        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_iters, den_eps, precision, bn,
                          bf16_mode),
        grid=grid,
        in_specs=[slab, th_spec, rows, rows, full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n_pad, b_pad), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, bb), f32),
                        pltpu.VMEM((n_pad, bb), f32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * n_pad * b_pad * num_iters,
            bytes_accessed=(n_pad * n_pad * num_iters
                            * (2 if bf16_mode else 4)
                            + 4 * n_pad * b_pad * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(qdhat, theta_bc, Fdn_p, Fdp_p, Y_p)
    return out[:N, :B]
