"""HBM-tiled update kernel conformance (interpret mode on CPU).

The tiled kernel streams the single combined Qd_hat = Qd + diag(theta)
matrix and reconstructs the PQP splits in VMEM; it must be
trajectory-identical to the XLA `pqp_update` path (which multiplies by
the materialized splits) whenever diag(Qd) >= 0.  Hardware validation of
the same kernel happens in benchmarks/bench_tiled.py + CONFORMANCE.json.
"""

import numpy as np
import pytest


def _random_dual(N, B, seed=0, M=None):
    """Build a DualQP from a random PSD geometry (diag(Qd) >= 0 by
    construction, like the real dual Qd = Gp Qp^-1 Gp')."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    M = M or max(8, N // 3)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.normal(0, 1, (N, M)).astype(np.float32)
    Fp = rng.normal(0, 10, (M, B)).astype(np.float32)
    Kp = rng.uniform(1, 10, (N,)).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp),
                      Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
                      Fp=jnp.asarray(Fp), Mp=jnp.zeros((B,), jnp.float32),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return primal, dualize(primal)


def _xla_updates(dual, Y, iters):
    from pqp_for_mpc_tpu.solver import pqp_update
    for _ in range(iters):
        Y = pqp_update(dual, Y)
    return Y


@pytest.mark.parametrize("N,B,iters,bn,bb", [
    (200, 72, 7, 128, 128),    # padding in both dims, 2 row blocks, odd T
    (256, 300, 8, 128, 128),   # exact N tiling, 3 batch blocks, even T
    (130, 40, 4, 256, 128),    # single row block degenerate case
])
def test_tiled_matches_xla_updates(N, B, iters, bn, bb):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.tiled_kernel import fused_pqp_iterations_tiled
    from pqp_for_mpc_tpu.solver import _as2d

    primal, dual = _random_dual(N, B, seed=N + B)
    Y = jnp.full((N, B), 1000.0, jnp.float32)
    Fdn = jnp.broadcast_to(_as2d(dual.Fdn), (N, B))
    Fdp = jnp.broadcast_to(_as2d(dual.Fdp), (N, B))
    got = fused_pqp_iterations_tiled(dual.Qd, dual.theta, Fdn, Fdp, Y,
                                     num_iters=iters, interpret=True,
                                     block_n=bn, block_b=bb)
    want = _xla_updates(dual, Y, iters)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tiled_matches_resident_kernel():
    """Tiled and VMEM-resident kernels agree on the same problem."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.kernels import fused_pqp_iterations
    from pqp_for_mpc_tpu.ops.tiled_kernel import fused_pqp_iterations_tiled
    from pqp_for_mpc_tpu.solver import _as2d

    N, B = 160, 64
    primal, dual = _random_dual(N, B, seed=3)
    Y = jnp.full((N, B), 1000.0, jnp.float32)
    Fdn = jnp.broadcast_to(_as2d(dual.Fdn), (N, B))
    Fdp = jnp.broadcast_to(_as2d(dual.Fdp), (N, B))
    tiled = fused_pqp_iterations_tiled(dual.Qd, dual.theta, Fdn, Fdp, Y,
                                       num_iters=6, interpret=True,
                                       block_n=128, block_b=128)
    resident = fused_pqp_iterations(dual.Qdn_theta, dual.Qdp_theta,
                                    Fdn, Fdp, Y, num_iters=6,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(resident),
                               rtol=1e-5, atol=1e-5)


def test_solver_dispatches_tiled_beyond_vmem(monkeypatch):
    """solve_batched's Pallas path falls back to the HBM-tiled kernel when
    the splits exceed VMEM residency, and the result matches the XLA path.
    (VMEM budget is monkeypatched down so the test stays small.)"""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops import kernels as _kernels
    from pqp_for_mpc_tpu.solver import solve_batched

    N, B = 192, 16
    primal, dual = _random_dual(N, B, seed=11)
    assert _kernels.fits_vmem(N)
    monkeypatch.setattr(_kernels, "fits_vmem", lambda n, budget=0: False)

    from jax.experimental.pallas import tpu as pltpu

    cfg_x = SolverConfig(max_iters=3000, check_every=16, use_pallas=False)
    cfg_p = SolverConfig(max_iters=3000, check_every=16, use_pallas=True)
    ref = solve_batched(primal, dual, cfg=cfg_x)
    # solve_batched does not plumb interpret=; force it for the CPU backend
    with pltpu.force_tpu_interpret_mode():
        res = solve_batched(primal, dual, cfg=cfg_p)
    # this instance is deliberately slow (some lanes exhaust max_iters);
    # the bar is lane-for-lane PARITY with the XLA path, which is the
    # stronger statement anyway
    assert np.asarray(ref.converged).sum() >= 10
    np.testing.assert_array_equal(np.asarray(res.converged),
                                  np.asarray(ref.converged))
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_pick_tiled_blocks_plans_lane_aligned():
    from pqp_for_mpc_tpu.ops.kernels import _LANE
    from pqp_for_mpc_tpu.ops.tiled_kernel import pick_tiled_blocks

    for n in (1000, 1800, 4096, 6000, 8192):
        bn, bb = pick_tiled_blocks(n, 256)
        assert bn >= _LANE and bn % _LANE == 0
        assert bb >= _LANE and bb % _LANE == 0
        # working set sanity: the chosen plan fits the budget it was given
    # far beyond any plan: must refuse rather than produce a bad plan
    assert pick_tiled_blocks(40000, 256) == (0, 0)


def test_tiled_kernel_bf16_mode_consistent_construction():
    """dtype="bfloat16": the streamed-matrix update must equal the XLA
    emulation of solve_mixed's consistent construction — ONE rounding of
    the (diagonal-clamped) Qd, exact elementwise split, f32 theta
    applied symmetrically, theta raised to dominate the ROUNDED
    negative rowsums."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.tiled_kernel import fused_pqp_iterations_tiled

    rng = np.random.default_rng(0)
    N, B = 160, 8
    Qd = rng.normal(0, 1, (N, N)).astype(np.float32)
    Qd = (Qd + Qd.T) / 2
    np.fill_diagonal(Qd, np.abs(np.diagonal(Qd)))
    theta = np.maximum(np.sum(np.maximum(-Qd, 0), axis=1), 5.0) \
        .astype(np.float32)
    Fdn = rng.uniform(0, 1, (N, B)).astype(np.float32)
    Fdp = rng.uniform(0, 1, (N, B)).astype(np.float32)
    Y0 = rng.uniform(0.5, 2, (N, B)).astype(np.float32)

    out = fused_pqp_iterations_tiled(
        jnp.asarray(Qd), jnp.asarray(theta), jnp.asarray(Fdn),
        jnp.asarray(Fdp), jnp.asarray(Y0), num_iters=5, interpret=True,
        dtype="bfloat16")

    bf = jnp.bfloat16
    Qbf = jnp.asarray(Qd).astype(bf)
    th = jnp.maximum(
        jnp.asarray(theta),
        jnp.sum(jnp.maximum(-Qbf.astype(jnp.float32), 0), axis=1))[:, None]
    Y = jnp.asarray(Y0)
    for _ in range(5):
        yb = Y.astype(bf)
        num = jnp.dot(jnp.maximum(-Qbf, 0), yb,
                      preferred_element_type=jnp.float32) + th * Y + Fdn
        den = jnp.dot(jnp.maximum(Qbf, 0), yb,
                      preferred_element_type=jnp.float32) + th * Y + Fdp
        Y = (num / den) * Y
    np.testing.assert_allclose(np.asarray(out), np.asarray(Y),
                               rtol=1e-5, atol=1e-5)


def test_pick_tiled_blocks_minimizes_stream_padding():
    """The slab choice never inflates the padded N (streamed bytes
    scale as n_pad^2): at awkward N the picker falls back to a smaller
    slab that tiles exactly (round-5 review finding — the bf16 cap of
    512 would otherwise pad N=4224 to 4608, +19% bytes/iter)."""
    from pqp_for_mpc_tpu.ops.kernels import _round_up
    from pqp_for_mpc_tpu.ops.tiled_kernel import pick_tiled_blocks

    # exact multiple: the full bf16 slab is taken
    bn, _ = pick_tiled_blocks(4096, 128, max_block_n=512, slab_bytes=2)
    assert bn == 512
    # awkward N: 4224 = 33*128 — 384 tiles exactly, 512 would pad
    bn, _ = pick_tiled_blocks(4224, 128, max_block_n=512, slab_bytes=2)
    assert _round_up(4224, bn) == 4224, bn
    # f32 path unchanged (its swept optimum is 128)
    bn, _ = pick_tiled_blocks(4096, 128)
    assert bn == 128
    # the bf16 slab budget is 2 bytes/element: at N=8192 the f32-sized
    # budget capped the slab at 256; the dtype-aware one reaches 512
    bn, _ = pick_tiled_blocks(8192, 128, max_block_n=512, slab_bytes=2)
    assert bn == 512
