"""HBM-tiled WHOLE-solve kernel conformance (interpret mode).

The single-launch streamed solve must reproduce the XLA solver path's
convergence semantics: same iteration counts, same U*, same verdicts —
on a problem deliberately spanning several row slabs.  On real TPUs the
kernel is exercised by benchmarks/bench_tiled.py at N=4096.
"""

import numpy as np
import pytest


def _random_problem(N, M, B, seed=3):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.normal(0, 1, (N, M)).astype(np.float32)
    Fp = rng.normal(0, 3, (M, B)).astype(np.float32)
    Kp = rng.uniform(1, 10, (N,)).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp),
                      Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
                      Fp=jnp.asarray(Fp),
                      Mp=jnp.zeros((B,), jnp.float32),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return primal, dualize(primal)


@pytest.mark.parametrize("gap_comp", [False, True])
def test_tiled_whole_solve_matches_solver(gap_comp):
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.tiled_solve_kernel import solve_fused_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    # N=384 spans 3 row slabs of 128; B=72 exercises batch padding
    primal, dual = _random_problem(N=384, M=128, B=72)
    cfg = SolverConfig(max_iters=4000, check_every=8,
                       strict_weak_duality=not gap_comp,
                       gap_from_complementarity=gap_comp)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused_tiled(primal, dual, cfg=cfg, interpret=True)
    assert int(np.asarray(res.converged).sum()) \
        == int(np.asarray(ref.converged).sum())
    both = np.asarray(res.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(np.asarray(res.U)[:, both],
                               np.asarray(ref.U)[:, both],
                               rtol=1e-4, atol=2e-3)
    # iteration counts: the in-kernel check is the same float program
    # as the XLA one in interpret mode up to dot order — demand
    # near-exact agreement
    it_r, it_k = np.asarray(ref.iters), np.asarray(res.iters)
    assert (it_r == it_k).mean() >= 0.97, (it_r, it_k)


def test_tiled_whole_solve_warm_start_and_early_exit():
    """A warm start at the solution certifies at the FIRST check (the
    early exit path) and returns it untouched."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.tiled_solve_kernel import solve_fused_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual = _random_problem(N=256, M=96, B=32)
    cfg = SolverConfig(max_iters=4000, check_every=8)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused_tiled(primal, dual, Y0=ref.Y, cfg=cfg,
                            interpret=True)
    conv = np.asarray(ref.converged)
    it = np.asarray(res.iters)[conv]
    # the in-kernel check is an independent float program, so a few
    # razor-edge lanes re-certify one round later; most exit at the
    # first check, and none runs a second round's worth of updates
    assert (it <= 1 + cfg.check_every).all(), res.iters
    assert (it == 1).mean() >= 0.7, res.iters
    first = conv & (np.asarray(res.iters) == 1)
    np.testing.assert_allclose(np.asarray(res.Y)[:, first],
                               np.asarray(ref.Y)[:, first],
                               rtol=0, atol=0)


def test_tiled_whole_solve_with_accel_matches_solver():
    """In-kernel accel at the check cadence: same solutions and
    near-identical iteration counts as the XLA path with the same cfg
    (accel_every == check_every)."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.tiled_solve_kernel import solve_fused_tiled
    from pqp_for_mpc_tpu.solver import solve_batched

    primal, dual = _random_problem(N=384, M=128, B=40, seed=5)
    cfg = SolverConfig(max_iters=4000, check_every=8, accel_every=8,
                       strict_weak_duality=False,
                       gap_from_complementarity=True)
    ref = solve_batched(primal, dual, cfg=cfg)
    res = solve_fused_tiled(primal, dual, cfg=cfg, interpret=True)
    assert int(np.asarray(res.converged).sum()) \
        == int(np.asarray(ref.converged).sum())
    both = np.asarray(res.converged) & np.asarray(ref.converged)
    np.testing.assert_allclose(np.asarray(res.U)[:, both],
                               np.asarray(ref.U)[:, both],
                               rtol=1e-4, atol=2e-3)
    it_r, it_k = np.asarray(ref.iters), np.asarray(res.iters)
    assert (np.abs(it_r.astype(np.int64) - it_k)
            <= cfg.check_every).mean() >= 0.75, (it_r, it_k)


def test_tiled_whole_solve_rejects_bad_config():
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.tiled_solve_kernel import solve_fused_tiled

    primal, dual = _random_problem(N=256, M=96, B=8)
    with pytest.raises(ValueError, match="even check_every"):
        solve_fused_tiled(primal, dual,
                          cfg=SolverConfig(check_every=7), interpret=True)
    with pytest.raises(ValueError, match="accel_every"):
        solve_fused_tiled(
            primal, dual,
            cfg=SolverConfig(check_every=8, accel_every=4),
            interpret=True)
