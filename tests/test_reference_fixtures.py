"""Parity with the reference's shipped test fixtures and formats.

The reference ships three pre-generated random instances
(``testing/sample test/test{1,2,3}.txt``, headers ``500 1500`` /
``100 400`` / ``800 1200`` — SURVEY.md §2.1) and duplicates them under
the per-variant harness directories.  Our generator-format reader must
load them exactly.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
SAMPLES = os.path.join(REF, "testing", "sample test")

needs_ref = pytest.mark.skipif(not os.path.isdir(SAMPLES),
                               reason="reference fixtures unavailable")


@needs_ref
@pytest.mark.parametrize("fname,M,N", [
    ("test1.txt", 500, 1500),
    ("test2.txt", 100, 400),
    ("test3.txt", 800, 1200),
])
def test_sample_fixture_loads(fname, M, N):
    from pqp_for_mpc_tpu.io.generator import read_generator_file

    inst = read_generator_file(os.path.join(SAMPLES, fname))
    assert inst.M == M and inst.N == N
    assert inst.qp_inv_diag.shape == (M,)
    assert inst.Fp.shape == (M,)
    assert inst.Kp.shape == (N,)
    assert inst.Gp.shape == (N, M)
    # generator distributions: nonnegative qdiag/Kp, Gp in {-1, 0, 1}
    assert np.all(inst.qp_inv_diag >= 0)
    assert np.all(inst.Kp >= 0)
    assert set(np.unique(inst.Gp)).issubset({-1.0, 0.0, 1.0})


@needs_ref
def test_cpu_harness_copy_is_identical_fixture():
    """testing/'CPU version'/test1.txt is a byte copy of the sample
    (SURVEY.md §2.1) — both must parse to the same instance."""
    from pqp_for_mpc_tpu.io.generator import read_generator_file

    other = os.path.join(REF, "testing", "CPU version", "test1.txt")
    if not os.path.exists(other):
        pytest.skip("harness copy missing")
    a = read_generator_file(os.path.join(SAMPLES, "test1.txt"))
    b = read_generator_file(other)
    np.testing.assert_array_equal(a.Gp, b.Gp)
    np.testing.assert_allclose(a.qp_inv_diag, b.qp_inv_diag)


@needs_ref
def test_fixture_solves_fixed_iterations():
    """Run the reference's fixed-iteration benchmark semantics on the
    smallest shipped fixture (test2: M=100, N=400): 100 updates with the
    harness's inert tolerances — the timing workload, not convergence."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.config import BENCH_CONFIG
    from pqp_for_mpc_tpu import dualize, solve_batched
    from pqp_for_mpc_tpu.io.generator import (read_generator_file,
                                              to_primal_arrays)
    from pqp_for_mpc_tpu.problem import PrimalQP

    inst = read_generator_file(os.path.join(SAMPLES, "test2.txt"))
    qp, qpi, fp, mp, gp, kp = to_primal_arrays(inst)
    primal = PrimalQP(Qp=jnp.asarray(qp), Qp_inv=jnp.asarray(qpi),
                      Fp=jnp.asarray(fp), Mp=jnp.asarray(mp),
                      Gp=jnp.asarray(gp), Kp=jnp.asarray(kp))
    dual = dualize(primal, theta_floor=BENCH_CONFIG.theta_floor)
    res = solve_batched(primal, dual, cfg=BENCH_CONFIG)
    # inert tolerances (erc=7, eac=1e5 ...) => converges immediately in
    # the reference's sense; our run just must be finite and well-formed
    assert np.isfinite(np.asarray(res.Y)).all()
    assert np.isfinite(np.asarray(res.U)).all()


def test_distinct_geometry_batch_einsum_path():
    """Batches of fully distinct instances: Qd stacked (B, N, N) takes
    the einsum path in pqp_update (solver.py _mv)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve_batched
    from pqp_for_mpc_tpu.problem import DualQP, PrimalQP
    from pqp_for_mpc_tpu.solver import solve

    rng = np.random.default_rng(0)
    M, N, B = 5, 12, 3
    primals, duals = [], []
    for b in range(B):
        L = rng.standard_normal((M, M)).astype(np.float32)
        Qp = L @ L.T + M * np.eye(M, dtype=np.float32)
        p = PrimalQP(
            Qp=jnp.asarray(Qp),
            Qp_inv=jnp.asarray(np.linalg.inv(Qp).astype(np.float32)),
            Fp=jnp.asarray(rng.standard_normal(M).astype(np.float32) * 3),
            Mp=jnp.asarray(np.float32(rng.standard_normal())),
            Gp=jnp.asarray(rng.integers(-1, 2, (N, M)).astype(np.float32)),
            Kp=jnp.asarray(rng.uniform(1.0, 8.0, N).astype(np.float32)))
        primals.append(p)
        duals.append(dualize(p))

    cfg = SolverConfig(max_iters=20_000, check_every=4,
                       strict_weak_duality=False)
    refs = [solve(p, d, cfg=cfg) for p, d in zip(primals, duals)]

    stack = lambda xs: jnp.stack(xs, axis=0)
    cat = lambda xs, ax: jnp.stack(xs, axis=ax)
    primal_b = PrimalQP(
        Qp=stack([p.Qp for p in primals]),
        Qp_inv=stack([p.Qp_inv for p in primals]),
        Fp=cat([p.Fp for p in primals], 1),
        Mp=jnp.stack([p.Mp for p in primals]),
        Gp=stack([p.Gp for p in primals]),
        Kp=stack([p.Kp for p in primals]))
    dual_b = DualQP(
        Qd=stack([d.Qd for d in duals]),
        Fd=cat([d.Fd for d in duals], 1),
        Md=jnp.stack([d.Md for d in duals]),
        theta=stack([d.theta for d in duals]),
        Qdp_theta=stack([d.Qdp_theta for d in duals]),
        Qdn_theta=stack([d.Qdn_theta for d in duals]),
        Fdp=cat([d.Fdp for d in duals], 1),
        Fdn=cat([d.Fdn for d in duals], 1))

    # distinct-geometry batching via vmap over the single-instance solver
    import jax
    vsolve = jax.vmap(
        lambda p, d: solve_batched(p, d, cfg=cfg),
        in_axes=(PrimalQP(Qp=0, Qp_inv=0, Fp=1, Mp=0, Gp=0, Kp=0),
                 DualQP(Qd=0, Fd=1, Md=0, theta=0, Qdp_theta=0,
                        Qdn_theta=0, Fdp=1, Fdn=1)))
    res = vsolve(primal_b, dual_b)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(res.U)[b, :, 0],
                                   np.asarray(refs[b].U),
                                   rtol=1e-5, atol=1e-5)
        assert bool(np.asarray(res.converged)[b, 0]) == \
            bool(np.asarray(refs[b].converged))
