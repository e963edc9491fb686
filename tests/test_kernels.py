"""Pallas kernel conformance (interpret mode on the CPU backend).

The fused kernels must be trajectory-identical to the XLA solver path:
same iteration counts, same U*, same convergence flags.  On real TPUs
the same kernels are exercised by bench.py and the CLI.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def batched_example(example_data):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize

    rng = np.random.default_rng(0)
    B = 72   # deliberately not a lane multiple: exercises batch padding
    x = np.asarray(example_data.x, np.float32)[:, None] + rng.normal(
        0, 0.3, (29, B)).astype(np.float32)
    primal = example_data.assemble(
        x=jnp.asarray(x), Qp=jnp.linalg.inv(example_data.Qp_inv))
    return primal, dualize(primal), B


def test_fused_iterations_matches_xla_updates(batched_example):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.kernels import fused_pqp_iterations
    from pqp_for_mpc_tpu.solver import _as2d, pqp_update

    primal, dual, B = batched_example
    N = dual.n_con
    Y = jnp.full((N, B), 1000.0, jnp.float32)
    Fdn = jnp.broadcast_to(_as2d(dual.Fdn), (N, B))
    Fdp = jnp.broadcast_to(_as2d(dual.Fdp), (N, B))
    got = fused_pqp_iterations(dual.Qdn_theta, dual.Qdp_theta, Fdn, Fdp,
                               Y, num_iters=10, interpret=True)
    want = Y
    for _ in range(10):
        want = pqp_update(dual, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_full_solve_kernel_matches_solver(batched_example):
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    cfg = SolverConfig(max_iters=5000, check_every=8)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused(primal, dual, cfg=cfg, interpret=True)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_full_solve_kernel_gap_from_complementarity(batched_example):
    """VERDICT r2 task 4: the in-kernel termination test honors
    ``cfg.gap_from_complementarity`` — the production MPC certification
    mode can ride the fast path, with the kernel and the XLA reference
    certifying identical iteration counts under the same estimator."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    cfg = SolverConfig(max_iters=5000, check_every=8,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused(primal, dual, cfg=cfg, interpret=True)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_full_solve_kernel_with_accel(batched_example):
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    # strict_weak_duality off; and the bar is *parity with the XLA path*,
    # not universal convergence — with y0=1 + accel the trajectory can
    # stop where the 1e-6 absolute gap is below one float32 ulp of the
    # O(1e5) costs, so the odd lane legitimately exhausts max_iters in
    # both implementations identically.
    cfg = SolverConfig(max_iters=5000, check_every=4, accel_every=4,
                       y0=1.0, strict_weak_duality=False)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused(primal, dual, cfg=cfg, interpret=True)
    rconv = np.asarray(ref.converged)
    kconv = np.asarray(res.converged)
    # ref-converged lanes must also certify in the kernel, with the same
    # iteration count; the kernel may additionally rescue razor-edge
    # lanes via its stall-freeze + exit-state verdict.
    assert kconv[rconv].all()
    np.testing.assert_array_equal(np.asarray(res.iters)[rconv],
                                  np.asarray(ref.iters)[rconv])
    assert kconv.mean() > 0.9
    assert float(np.asarray(res.iters)[kconv].mean()) <= 60
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_full_solve_kernel_per_lane_kp(batched_example):
    """Per-lane Kp (state-dependent output bounds) rides the whole-solve
    kernel: the slack threshold is streamed as an (N, B) panel and the
    result matches solve_batched lane-for-lane (VERDICT r1 item 4)."""
    import dataclasses

    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    rng = np.random.default_rng(7)
    # vary bounds per lane (keep them >= shared Kp so all lanes stay
    # feasible; tightened lanes exercise a different active set)
    Kp_b = (np.asarray(primal.Kp)[:, None]
            + rng.uniform(0.0, 2.0, (primal.Kp.shape[0], B))
            .astype(np.float32))
    primal_b = dataclasses.replace(primal, Kp=jnp.asarray(Kp_b))
    cfg = SolverConfig(max_iters=5000, check_every=8)
    ref = solve_batched(primal_b, dual, cfg=cfg)
    res = solve_fused(primal_b, dual, cfg=cfg, interpret=True)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_full_solve_rejects_oversized_problem():
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_kernel_batch_block

    # N so large the matrices alone exceed the operand budget
    assert solve_kernel_batch_block(2048, 1024, 128) == 0


def test_solve_kernel_block_limits_batch_padding():
    """The batch block never forces more than ~12.5% padded lanes: the
    grid rounds b_pad up to a block multiple and every padded lane runs
    the full matvec (round-5 review finding — a 1024 block at B=1100
    would have padded 86% of the launch)."""
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_kernel_batch_block

    for n_pad, b in ((256, 1152), (32, 1280), (512, 896), (256, 32768)):
        bb = solve_kernel_batch_block(n_pad, max(8, n_pad // 3), b)
        assert bb >= 128
        assert bb % 128 == 0
        pad = -(-b // bb) * bb - b
        assert pad * 8 <= b or bb == 128, (n_pad, b, bb, pad)
    # exact-multiple workloads keep the full swept cap
    assert solve_kernel_batch_block(32, 8, 8388608) == 16384
