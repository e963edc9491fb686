"""Multi-device tests on the virtual 8-CPU mesh.

Validates that (a) data-parallel batch sharding produces identical results
to the single-device solver, and (b) the shard_map tensor-parallel
(row-sharded Qd) solver agrees with the replicated one — the collective
pattern that scales large-N duals across chips (new capability; the
reference is single-GPU, SURVEY.md §2.3).
"""

import numpy as np
import pytest


def _batched_problem(B=16, seed=0, N=32, M=16):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((M, M)).astype(np.float32)
    Qp = L @ L.T + M * np.eye(M, dtype=np.float32)
    Qp_inv = np.linalg.inv(Qp).astype(np.float32)
    Gp = rng.integers(-1, 2, (N, M)).astype(np.float32)
    Kp = rng.uniform(1.0, 10.0, N).astype(np.float32)
    Fp = rng.standard_normal((M, B)).astype(np.float32) * 5
    Mp = rng.standard_normal(B).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp), Qp_inv=jnp.asarray(Qp_inv),
                      Fp=jnp.asarray(Fp), Mp=jnp.asarray(Mp),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return primal, dualize(primal)


def test_mesh_creation():
    import jax
    from pqp_for_mpc_tpu.parallel import make_mesh
    assert len(jax.devices()) == 8
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_data_parallel_matches_single_device():
    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.parallel import make_mesh, shard_batch

    primal, dual = _batched_problem(B=16)
    cfg = SolverConfig(max_iters=20_000, check_every=4)
    ref = solve_batched(primal, dual, cfg=cfg)

    mesh = make_mesh(model=1)  # 8-way data parallel
    p_s, d_s = shard_batch(primal, dual, mesh)
    res = solve_batched(p_s, d_s, cfg=cfg)

    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.iters),
                                  np.asarray(ref.iters))


def test_row_sharded_matches_replicated():
    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.parallel import make_mesh, solve_row_sharded

    primal, dual = _batched_problem(B=8, N=32, M=16)
    # Slightly relaxed absolute/relative gap: the psum partial-sum order
    # differs from the replicated reduction, and a 1e-6 absolute gap on
    # O(100) float32 costs is below one ulp (pure cancellation luck).
    cfg = SolverConfig(max_iters=20_000, check_every=4, eaj=1e-3, erj=1e-5,
                       strict_weak_duality=False)
    ref = solve_batched(primal, dual, cfg=cfg)

    mesh = make_mesh(data=2, model=4)  # N=32 rows over 4 devices
    res = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh)

    assert bool(np.asarray(res.converged).all())
    assert bool(np.asarray(ref.converged).all())
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=2e-4, atol=2e-4)
    # reduction-order differences may shift the passing check by a few
    # cadence steps
    assert np.max(np.abs(np.asarray(res.iters, np.int64)
                         - np.asarray(ref.iters, np.int64))) <= 64


def test_row_sharded_large_n():
    """Wide dual (N=128) split 8 ways, batch 4 — the TP configuration for
    long-horizon condensed problems."""
    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.parallel import make_mesh, solve_row_sharded

    primal, dual = _batched_problem(B=4, N=128, M=32, seed=3)
    cfg = SolverConfig(max_iters=50_000, check_every=8, eaj=1e-3, erj=1e-5,
                       strict_weak_duality=False)
    mesh = make_mesh(data=1, model=8)
    res = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh)
    ref = solve_batched(primal, dual, cfg=cfg)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=5e-4, atol=5e-4)


def test_stagewise_data_parallel_matches_single_device():
    """The sparse stage-wise solver is data-parallel for free: the dual
    geometry is batch-free (replicated) and only x0 carries the batch —
    sharding its trailing axis over the mesh propagates through every
    (H, nu, B) einsum and associative scan via GSPMD."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.models import MPCSpec, double_integrator
    from pqp_for_mpc_tpu.models.stagewise import (solve_stagewise,
                                                  stagewise_dual)
    from pqp_for_mpc_tpu.parallel import make_mesh

    spec = MPCSpec(
        plant=double_integrator(), horizon=12,
        Qy=np.eye(1, dtype=np.float32),
        R=0.05 * np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=np.array([-1.0], np.float32),
        u_max=np.array([1.0], np.float32),
        du_max=np.array([0.5], np.float32))
    cfg = SolverConfig(max_iters=50_000, check_every=8, accel_every=4,
                       y0=0.01, eaj=1e-4, erj=1e-5, erc=1e-5, eac=1e-5,
                       strict_weak_duality=False)
    sd = stagewise_dual(spec, theta_floor=cfg.theta_floor)
    rng = np.random.default_rng(2)
    x0 = rng.uniform(-2, 2, (2, 16)).astype(np.float32)
    ref = solve_stagewise(sd, jnp.asarray(x0), cfg=cfg, pscan=True)

    mesh = make_mesh(model=1)
    x0_s = jax.device_put(jnp.asarray(x0),
                          NamedSharding(mesh, P(None, "data")))
    res = solve_stagewise(sd, x0_s, cfg=cfg, pscan=True)
    assert bool(np.asarray(res.converged).all())
    # GSPMD's partitioned lowering vectorizes the hybrid split's banded
    # einsums differently from the single-device build, so entries
    # sitting exactly on a slew bound differ at f32 noise (measured
    # 5e-5); the math per lane is identical.
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=1e-4, atol=2e-4)
    # razor-edge lanes may certify a few check periods apart
    assert (np.abs(np.asarray(res.iters).astype(np.int64)
                   - np.asarray(ref.iters)) <= 4 * cfg.check_every).all()


def test_row_sharded_mixed_matches_f32():
    """solve_row_sharded(mixed=True): the bf16 bulk phase in TP form —
    bf16 row blocks AND a bf16 all_gather collective — must land on the
    same certified solutions as the f32 sharded path (certification is
    f32 on the true problem either way)."""
    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.parallel import make_mesh, solve_row_sharded

    primal, dual = _batched_problem(B=4, N=128, M=32, seed=3)
    cfg = SolverConfig(max_iters=50_000, check_every=8, accel_every=4,
                       eaj=1e-3, erj=1e-5, strict_weak_duality=False,
                       gap_from_complementarity=True)
    mesh = make_mesh(data=2, model=4)
    ref = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh)
    res = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh, mixed=True)
    assert bool(np.asarray(res.converged).all())
    assert bool(np.asarray(ref.converged).all())
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=2e-3, atol=2e-3)
    assert int(np.asarray(res.iters).min()) > 0
