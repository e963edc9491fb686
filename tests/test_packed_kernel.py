"""Conformance of the contraction-packed whole-solve kernel
(ops/packed_kernel.py) against the XLA solver, interpret mode on CPU.

Packing G instances along the MXU contraction axis must not change the
per-instance trajectory at all: the block-diagonal matvec rows of
instance g see exactly instance g's coordinates, and every reduction is
a segment reduction.  So the bar is the same as for solve_fused:
identical iteration counts, matching U*.
"""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def batched_example(example_data):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize

    rng = np.random.default_rng(3)
    B = 70   # not a multiple of G=4 nor of 128: exercises both paddings
    x = np.asarray(example_data.x, np.float32)[:, None] + rng.normal(
        0, 0.3, (29, B)).astype(np.float32)
    primal = example_data.assemble(
        x=jnp.asarray(x), Qp=jnp.linalg.inv(example_data.Qp_inv))
    return primal, dualize(primal), B


def test_pack_factor():
    from pqp_for_mpc_tpu.ops.packed_kernel import pack_factor

    assert pack_factor(28) == 4     # example: n_pad 32 -> G=4
    assert pack_factor(8) == 16
    assert pack_factor(64) == 2
    assert pack_factor(100) == 1    # n_pad 104 > 64: no packing


def test_pack_unpack_roundtrip():
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.packed_kernel import (_pack_panel,
                                                   _unpack_panel)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(28, 70)).astype(np.float32))
    P = _pack_panel(X, n_pad=32, G=4, Bc=128)
    assert P.shape == (128, 128)
    # instance g of packed column c is original lane g*Bc + c
    np.testing.assert_array_equal(np.asarray(P[:28, 5]),
                                  np.asarray(X[:, 5]))
    # lane 128+1 = 129 >= B: batch padding (col_fill)
    np.testing.assert_array_equal(np.asarray(P[32:64, 1]),
                                  np.zeros(32, np.float32))
    back = _unpack_panel(P, n_pad=32, G=4, N=28, B=70)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(X))


def test_packed_solve_matches_solver(batched_example):
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.packed_kernel import solve_fused_packed
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    cfg = SolverConfig(max_iters=5000, check_every=8)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused_packed(primal, dual, cfg=cfg, interpret=True)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_packed_solve_with_accel(batched_example):
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.packed_kernel import solve_fused_packed
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    cfg = SolverConfig(max_iters=5000, check_every=4, accel_every=4,
                       y0=1.0, strict_weak_duality=False)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused_packed(primal, dual, cfg=cfg, interpret=True)
    rconv = np.asarray(ref.converged)
    kconv = np.asarray(res.converged)
    assert kconv[rconv].all()
    np.testing.assert_array_equal(np.asarray(res.iters)[rconv],
                                  np.asarray(ref.iters)[rconv])
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_packed_solve_per_lane_kp(batched_example):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.packed_kernel import solve_fused_packed
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual, B = batched_example
    rng = np.random.default_rng(7)
    Kp_b = (np.asarray(primal.Kp)[:, None]
            + rng.uniform(0.0, 2.0, (primal.Kp.shape[0], B))
            .astype(np.float32))
    primal_b = dataclasses.replace(primal, Kp=jnp.asarray(Kp_b))
    cfg = SolverConfig(max_iters=5000, check_every=8)
    ref = solve_batched(primal_b, dual, cfg=cfg)
    res = solve_fused_packed(primal_b, dual, cfg=cfg, interpret=True)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-3)


def test_packed_rejects_unpackable_n():
    import jax.numpy as jnp
    import pytest as _pytest
    from pqp_for_mpc_tpu.ops.packed_kernel import fused_full_solve_packed

    N, M, B = 130, 64, 128   # n_pad 136 -> G=1
    z = jnp.zeros
    with _pytest.raises(ValueError, match="does not pack"):
        fused_full_solve_packed(
            z((N, N)), z((N, N)), z((N, N)), z((N, M)), z((M, M)),
            z((M, M)), z((M, B)), z((N, B)), z((N, B)), z((N, B)),
            z((N, 1)), z((B,)), z((B,)), jnp.ones((N, B)),
            max_iters=8, check_every=8)
