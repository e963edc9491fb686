"""Streamed distinct-geometry whole-solve kernel (interpret mode).

Must reproduce the einsum path's convergence on distinct batches — the
kernel's target regime (instances beyond the ~20 MiB VMEM-resident
budget) is exercised on hardware by benchmarks/bench_distinct.py
--streamed; interpret mode pins the semantics on sizes spanning
multiple row slabs."""

import numpy as np
import pytest


def _distinct_problem(B, M, N, seed=0):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize_distinct
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    Qps, Gps, Fps, Kps = [], [], [], []
    for _ in range(B):
        L = rng.standard_normal((M, M)).astype(np.float32)
        Qps.append(L @ L.T + M * np.eye(M, dtype=np.float32))
        Gps.append(rng.standard_normal((N, M)).astype(np.float32))
        Fps.append(rng.standard_normal(M).astype(np.float32) * 3)
        Kps.append(rng.uniform(1.0, 8.0, N).astype(np.float32))
    primal = PrimalQP(
        Qp=jnp.asarray(np.stack(Qps)),
        Qp_inv=jnp.asarray(np.stack([np.linalg.inv(q) for q in Qps])
                           .astype(np.float32)),
        Fp=jnp.asarray(np.stack(Fps, axis=1)),
        Mp=jnp.zeros((B,), jnp.float32),
        Gp=jnp.asarray(np.stack(Gps)),
        Kp=jnp.asarray(np.stack(Kps, axis=1)))
    dual = dualize_distinct(primal, materialize_splits=False)
    assert dual.Qdp_theta is None   # large-N contract: splits never built
    return primal, dual


@pytest.mark.parametrize("gap_comp", [False, True])
def test_streamed_distinct_matches_einsum_path(gap_comp):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.dual import dualize_distinct
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import \
        solve_fused_distinct_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    # N=384 spans 3 row slabs
    primal, dual = _distinct_problem(B=4, M=128, N=384)
    cfg = SolverConfig(max_iters=4000, check_every=8,
                       strict_weak_duality=not gap_comp,
                       gap_from_complementarity=gap_comp)
    # reference: the einsum path needs the materialized splits
    dual_full = dualize_distinct(primal)
    ref = solve_batched(primal, dual_full, cfg=cfg)
    res = solve_fused_distinct_tiled(primal, dual, cfg=cfg,
                                     interpret=True)
    assert int(np.asarray(res.converged).sum()) \
        == int(np.asarray(ref.converged).sum()), \
        (res.iters, ref.iters)
    both = np.asarray(res.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(np.asarray(res.U)[:, both],
                               np.asarray(ref.U)[:, both],
                               rtol=1e-4, atol=2e-3)
    it_r, it_k = np.asarray(ref.iters), np.asarray(res.iters)
    assert (it_r == it_k).mean() >= 0.75, (it_r, it_k)


def test_streamed_distinct_per_instance_early_exit():
    """A batch mixing a trivially-warm instance with a cold one: the
    warm instance certifies at its first check (its stream STOPS — the
    einsum path would keep streaming it until the cold one finishes)."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import \
        solve_fused_distinct_tiled
    import jax.numpy as jnp

    primal, dual = _distinct_problem(B=3, M=96, N=256, seed=7)
    cfg = SolverConfig(max_iters=4000, check_every=8,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    cold = solve_fused_distinct_tiled(primal, dual, cfg=cfg,
                                      interpret=True)
    assert bool(np.asarray(cold.converged).all()), cold.stats()
    warm = solve_fused_distinct_tiled(primal, dual, Y0=cold.Y, cfg=cfg,
                                      interpret=True)
    assert (np.asarray(warm.iters) <= 1 + cfg.check_every).all(), \
        warm.iters


def test_streamed_distinct_accel_matches_einsum():
    """In-kernel accel at the check cadence (accel_every ==
    check_every): same solutions and near-identical iteration counts as
    the XLA einsum path with the same cfg."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.dual import dualize_distinct
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import \
        solve_fused_distinct_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual = _distinct_problem(B=4, M=128, N=384, seed=2)
    cfg = SolverConfig(max_iters=4000, check_every=8, accel_every=8,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    ref = solve_batched(primal, dualize_distinct(primal), cfg=cfg)
    res = solve_fused_distinct_tiled(primal, dual, cfg=cfg,
                                     interpret=True)
    assert int(np.asarray(res.converged).sum()) \
        == int(np.asarray(ref.converged).sum())
    both = np.asarray(res.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(np.asarray(res.U)[:, both],
                               np.asarray(ref.U)[:, both],
                               rtol=1e-4, atol=2e-3)
    it_r, it_k = np.asarray(ref.iters), np.asarray(res.iters)
    assert (np.abs(it_r.astype(np.int64) - it_k)
            <= cfg.check_every).mean() >= 0.75, (it_r, it_k)


def test_streamed_distinct_rejects_mismatched_accel():
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import \
        solve_fused_distinct_tiled

    primal, dual = _distinct_problem(B=2, M=32, N=64)
    with pytest.raises(ValueError, match="accel_every"):
        solve_fused_distinct_tiled(
            primal, dual,
            cfg=SolverConfig(check_every=8, accel_every=4),
            interpret=True)


# ---------------------------------------------------------------------------
# Streamed distinct UPDATE kernel (solve_mixed's 3-D bulk engine, round 5)
# ---------------------------------------------------------------------------

def _xla_distinct_updates(Qd, theta, Fdn, Fdp, Y, n, dtype):
    """The reference semantics: solve_mixed's einsum update with the
    kernel's consistency rules (clamped diag; bf16: round once, theta
    raised to the rounded negative rowsums, symmetric f32 theta)."""
    import jax
    import jax.numpy as jnp

    B, N, _ = Qd.shape
    r = jnp.arange(N)
    dg = jnp.maximum(jnp.diagonal(Qd, axis1=1, axis2=2), 0.0)
    Qc = Qd.at[:, r, r].set(dg)
    if dtype == "bfloat16":
        Qb = Qc.astype(jnp.bfloat16)
        th = jnp.maximum(theta, jnp.sum(
            jnp.maximum(-Qb.astype(jnp.float32), 0.0), axis=2))
        Qn, Qp_ = jnp.maximum(-Qb, 0), jnp.maximum(Qb, 0)
        dot = lambda Q, y: jnp.einsum(
            "bij,jb->ib", Q, y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    else:
        th = theta
        Qn, Qp_ = jnp.maximum(-Qc, 0), jnp.maximum(Qc, 0)
        dot = lambda Q, y: jnp.einsum(
            "bij,jb->ib", Q, y, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    y = Y
    for _ in range(n):
        tY = th.T * y
        y = ((dot(Qn, y) + tY + Fdn) / (dot(Qp_, y) + tY + Fdp)) * y
    return y


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_distinct_update_kernel_matches_xla(dtype):
    """The streamed distinct update kernel reproduces the XLA einsum
    update under identical rounding rules, across multiple row slabs
    (N=200 -> two 128-row slabs after padding)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import (
        fused_pqp_iterations_distinct_tiled)

    rng = np.random.default_rng(0)
    B, N = 3, 200
    G = rng.standard_normal((B, N, 24)).astype(np.float32)
    Qd = jnp.asarray(np.einsum("bik,bjk->bij", G, G) * 0.05)
    theta = jnp.asarray(np.maximum(
        np.maximum(-np.asarray(Qd), 0).sum(2), 5.0).astype(np.float32))
    Fdn = jnp.asarray(np.abs(rng.standard_normal((N, B))),
                      jnp.float32)
    Fdp = jnp.asarray(np.abs(rng.standard_normal((N, B))) + 0.5,
                      jnp.float32)
    Y = jnp.asarray(np.abs(rng.standard_normal((N, B))), jnp.float32)

    got = fused_pqp_iterations_distinct_tiled(
        Qd, theta, Fdn, Fdp, Y, num_iters=5, interpret=True, dtype=dtype)
    want = _xla_distinct_updates(Qd, theta, Fdn, Fdp, Y, 5, dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_solve_mixed_distinct_kernel_construction_consistent():
    """solve_mixed's distinct phase-1 problem (clamped-rounded Qd,
    theta from the ROUNDED rowsums) is bit-identical whether a step is
    taken by the kernel or by the XLA accel/floor terms: the kernel's
    internal theta raise must be a no-op on solve_mixed's theta."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    B, N = 2, 160
    G = rng.standard_normal((B, N, 16)).astype(np.float32)
    Qd = jnp.asarray(np.einsum("bik,bjk->bij", G, G) * 0.1)
    r = jnp.arange(N)
    dg = jnp.maximum(jnp.diagonal(Qd, axis1=1, axis2=2), 0.0)
    Qc = Qd.at[:, r, r].set(dg)
    Qb = Qc.astype(jnp.bfloat16)
    # solve_mixed's theta (solver.py): rowsums of the rounded neg part
    rs = jnp.sum(jnp.maximum(-Qb, 0).astype(jnp.float32), axis=-1)
    theta = jnp.maximum(rs, 5.0)
    raised = jnp.maximum(theta, jnp.sum(
        jnp.maximum(-Qb.astype(jnp.float32), 0.0), axis=2))
    np.testing.assert_array_equal(np.asarray(theta), np.asarray(raised))


def test_distinct_bf16_slab_never_inflates_padding():
    """The 256-row bf16 slab engages only when it tiles the
    lane-padded N exactly (N=1152 would otherwise pad to 1280, +23%
    streamed bytes/iteration)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.ops.distinct_tiled_kernel import (
        fused_pqp_iterations_distinct_tiled)

    rng = np.random.default_rng(2)
    B, N = 2, 1152                       # odd multiple of 128
    G = rng.standard_normal((B, N, 8)).astype(np.float32)
    Qd = jnp.asarray(np.einsum("bik,bjk->bij", G, G) * 0.05)
    theta = jnp.asarray(np.maximum(
        np.maximum(-np.asarray(Qd), 0).sum(2), 5.0).astype(np.float32))
    Fdn = jnp.asarray(np.abs(rng.standard_normal((N, B))), jnp.float32)
    Fdp = jnp.asarray(np.abs(rng.standard_normal((N, B))) + 0.5,
                      jnp.float32)
    Y = jnp.asarray(np.abs(rng.standard_normal((N, B))), jnp.float32)
    got = fused_pqp_iterations_distinct_tiled(
        Qd, theta, Fdn, Fdp, Y, num_iters=3, interpret=True,
        dtype="bfloat16")
    want = _xla_distinct_updates(Qd, theta, Fdn, Fdp, Y, 3, "bfloat16")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
