"""Pallas TPU kernels for the PQP hot loop.

The reference's fastest variant fuses the two matvecs and the Fd adds of
one multiplicative update into a single CUDA launch
(``matrixMultiplyCuda_computeupdateY2``, PQP_Fusion.cu:772-846) but still
pays one kernel launch + full HBM round-trip of Y per iteration, because a
CUDA grid cannot synchronize across blocks within a launch.

On TPU we go further: :func:`fused_pqp_iterations` runs ``num_iters``
whole updates inside ONE kernel invocation, keeping both split matrices
(Qd^- + theta, Qd^+ + theta) and the Y panel resident in VMEM the entire
time.  Per grid step the only HBM traffic is the initial matrix/panel load
and the final Y store — everything else is MXU matvecs
(``(N, N) @ (N, Bblk)``) and VPU elementwise work, i.e. the kernel is
compute-bound by design instead of launch/HBM-bound.

Layout: batch on the trailing (lane) dimension.  ``Y (N, B)`` blocks of
``(N, Bblk)`` with ``Bblk`` a multiple of 128 lanes; N padded to the
float32 sublane quantum (8).  Padding is constructed so padded coordinates
are fixed points of the update (identity diagonal, zero forcing, Y=1) and
can never contaminate real lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# float32 tiling quanta (sublane, lane)
_SUBLANE = 8
_LANE = 128

#: Per-core VMEM budget for kernel operands (bytes).  The Mosaic default
#: scoped-vmem limit is 16 MiB, but v5e physically has far more and the
#: limit is raisable via CompilerParams(vmem_limit_bytes=...) — with the
#: raised limit below, an N=1000 fused kernel (8 MiB of matrices) runs
#: fine (measured 1.84 TFLOPs).  Empirically Mosaic's scoped allocation
#: is ~1.8x the naive operand footprint, so budget operands at 40 MiB
#: against a 110 MiB raised limit and count every panel double-buffered.
VMEM_BUDGET = 40 * 1024 * 1024

#: Raised Mosaic scoped-vmem limit passed to every pallas_call.
VMEM_LIMIT_BYTES = 110 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_batch_block(n_pad: int, b_pad: int,
                     budget: int = VMEM_BUDGET) -> int:
    """Largest lane-multiple batch block such that the working set
    (two N x N matrices + 4 panels of N x Bblk, f32, double-buffered panels)
    fits the VMEM budget."""
    mats = 2 * n_pad * n_pad * 4
    avail = budget - mats
    if avail <= 0:
        return 0
    # 5 panels (Fdn, Fdp, Y-in, Y-out, loop carry) x2 for double-buffering
    bb = avail // (10 * n_pad * 4)
    bb = (bb // _LANE) * _LANE
    return max(0, min(bb, b_pad))


def fits_vmem(n: int, budget: int = VMEM_BUDGET) -> bool:
    """Can the fused kernel hold both split matrices plus at least one
    128-lane panel set in VMEM?"""
    n_pad = _round_up(max(n, _SUBLANE), _SUBLANE)
    return pick_batch_block(n_pad, _LANE, budget) >= _LANE


def _iterate_kernel(num_iters, den_eps, precision, qdn_ref, qdp_ref,
                    fdn_ref, fdp_ref, y_ref, out_ref):
    """num_iters multiplicative updates on one (N, Bblk) panel, all in VMEM."""
    qdn = qdn_ref[:]
    qdp = qdp_ref[:]
    fdn = fdn_ref[:]
    fdp = fdp_ref[:]
    # "highest" forces full-f32 MXU passes; the default bf16 passes are
    # fine on well-conditioned problems (the golden example converges
    # identically) but diverge on ill-conditioned random instances —
    # see distinct_kernel.py for the v5e measurement.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest" else None)

    def body(_, y):
        num = jnp.dot(qdn, y, preferred_element_type=jnp.float32,
                      precision=prec) + fdn
        den = jnp.dot(qdp, y, preferred_element_type=jnp.float32,
                      precision=prec) + fdp
        if den_eps:
            den = jnp.maximum(den, den_eps)
        return (num / den) * y

    out_ref[:] = jax.lax.fori_loop(0, num_iters, body, y_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "interpret", "block_b",
                                    "den_eps", "precision"))
def fused_pqp_iterations(Qdn_theta: jax.Array, Qdp_theta: jax.Array,
                         Fdn: jax.Array, Fdp: jax.Array, Y: jax.Array,
                         num_iters: int, interpret: bool = False,
                         block_b: int | None = None,
                         den_eps: float = 0.0,
                         precision: str = "highest") -> jax.Array:
    """Run ``num_iters`` PQP updates ``Y <- Y * (Qdn Y + Fdn)/(Qdp Y + Fdp)``
    in one Pallas kernel.  Shapes: matrices ``(N, N)``, panels ``(N, B)``.

    Returns the updated ``(N, B)`` Y.  Semantically identical to
    ``num_iters`` calls of :func:`pqp_for_mpc_tpu.solver.pqp_update`
    with the same ``den_eps`` (modulo float32 reduction order).
    """
    N, B = Y.shape
    n_pad = _round_up(max(N, _SUBLANE), _SUBLANE)
    b_pad = _round_up(max(B, _LANE), _LANE)

    if block_b is None:
        bb = pick_batch_block(n_pad, b_pad)
    else:
        bb = block_b
    if bb <= 0:
        raise ValueError(
            f"fused_pqp_iterations: N={N} does not fit the VMEM budget; "
            "use the XLA path or the sharded solver")
    # grid must divide evenly: extend b_pad to a multiple of bb
    b_pad = _round_up(b_pad, bb)

    dn = n_pad - N
    db = b_pad - B
    if dn or db:
        # Padded rows/cols: identity diagonal, zero forcing, Y=1 =>
        # padded entries satisfy num=den=1 and stay exactly 1.0 forever.
        eye_pad = jnp.zeros((dn, dn), jnp.float32) + jnp.eye(dn, dtype=jnp.float32)
        pad_mat = lambda A: jnp.block(
            [[A, jnp.zeros((N, dn), A.dtype)],
             [jnp.zeros((dn, N), A.dtype), eye_pad]]) if dn else A
        Qdn_theta = pad_mat(Qdn_theta)
        Qdp_theta = pad_mat(Qdp_theta)
        pad_panel = lambda P, fill: jnp.pad(P, ((0, dn), (0, db)),
                                            constant_values=fill)
        Fdn = pad_panel(Fdn, 0.0)
        Fdp = pad_panel(Fdp, 0.0)
        Y = pad_panel(Y, 1.0)

    grid = (b_pad // bb,)
    mat_spec = pl.BlockSpec((n_pad, n_pad), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    panel_spec = pl.BlockSpec((n_pad, bb), lambda b: (0, b),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_iterate_kernel, num_iters, den_eps, precision),
        grid=grid,
        in_specs=[mat_spec, mat_spec, panel_spec, panel_spec, panel_spec],
        out_specs=panel_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, b_pad), jnp.float32),
        input_output_aliases={4: 0},
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * n_pad * b_pad * num_iters,
            bytes_accessed=(2 * n_pad * n_pad + 4 * n_pad * b_pad) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(Qdn_theta, Qdp_theta, Fdn, Fdp, Y)
    return out[:N, :B]
