"""Divergence detection, solve stats, and state checkpointing
(SURVEY.md §5 auxiliary-subsystem parity — all absent in the reference)."""

import numpy as np


def _problem(B=4):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(0)
    M, N = 6, 14
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


def test_divergence_detection_freezes_lane():
    """A lane seeded with a non-finite warm start must be flagged
    diverged (not spun to max_iters) while healthy lanes still solve."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, solve_batched

    primal, dual = _problem(B=4)
    N = dual.n_con
    Y0 = jnp.full((N, 4), 1.0, jnp.float32)
    Y0 = Y0.at[0, 2].set(jnp.nan)
    cfg = SolverConfig(max_iters=20_000, check_every=4,
                       strict_weak_duality=False)
    res = solve_batched(primal, dual, Y0=Y0, cfg=cfg)
    div = np.asarray(res.diverged)
    conv = np.asarray(res.converged)
    assert div.tolist() == [False, False, True, False]
    assert conv[2] == False          # noqa: E712
    assert conv[[0, 1, 3]].all()
    # the diverged lane froze at its first check, not max_iters
    assert int(np.asarray(res.iters)[2]) <= cfg.check_every + 1


def test_stats_dict():
    from pqp_for_mpc_tpu import SolverConfig, solve_batched

    primal, dual = _problem(B=4)
    res = solve_batched(
        primal, dual,
        cfg=SolverConfig(max_iters=20_000, check_every=4,
                         strict_weak_duality=False))
    s = res.stats()
    assert s["batch"] == 4
    assert s["converged"] == 4
    assert s["gap_rel_max"] <= 2e-6


def test_state_roundtrip(tmp_path):
    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.utils.state import load_state, save_state

    primal, dual = _problem(B=4)
    cfg = SolverConfig(max_iters=20_000, check_every=4,
                       strict_weak_duality=False)
    res = solve_batched(primal, dual, cfg=cfg)
    p = str(tmp_path / "warm.npz")
    save_state(p, res.Y, res.iters, meta={"step": 7})
    Y, iters, meta = load_state(p)
    np.testing.assert_array_equal(Y, np.asarray(res.Y))
    np.testing.assert_array_equal(iters, np.asarray(res.iters))
    assert int(meta["step"]) == 7
    # resuming from the loaded state converges immediately
    res2 = solve_batched(
        primal, dual, Y0=Y,
        cfg=SolverConfig(max_iters=1000, check_every=4,
                         strict_weak_duality=False))
    assert bool(np.asarray(res2.converged).all())
    assert int(np.asarray(res2.iters).max()) == 1


def test_row_sharded_accel_matches():
    """The TP solver's psum-based acceleration step agrees with the
    replicated one."""
    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.parallel import make_mesh, solve_row_sharded

    primal, dual = _problem(B=8)
    # N=14 not divisible by mesh; rebuild with N=16
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP
    rng = np.random.default_rng(3)
    M, N, B = 8, 16, 8
    L = rng.standard_normal((M, M)).astype(np.float32)
    Qp = L @ L.T + M * np.eye(M, dtype=np.float32)
    primal = PrimalQP(
        Qp=jnp.asarray(Qp),
        Qp_inv=jnp.asarray(np.linalg.inv(Qp).astype(np.float32)),
        Fp=jnp.asarray(rng.standard_normal((M, B)).astype(np.float32) * 5),
        Mp=jnp.asarray(rng.standard_normal(B).astype(np.float32)),
        Gp=jnp.asarray(rng.integers(-1, 2, (N, M)).astype(np.float32)),
        Kp=jnp.asarray(rng.uniform(1.0, 10.0, N).astype(np.float32)))
    dual = dualize(primal)
    cfg = SolverConfig(max_iters=20_000, check_every=4, accel_every=4,
                       eaj=1e-3, erj=1e-5, strict_weak_duality=False)
    ref = solve_batched(primal, dual, cfg=cfg)
    mesh = make_mesh(data=2, model=4)
    res = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh)
    assert bool(np.asarray(res.converged).all())
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(ref.U),
                               rtol=5e-4, atol=5e-4)


def test_profiler_trace_produces_artifact(tmp_path):
    """utils.profiling.trace captures a real profiler artifact around a
    solve (VERDICT r1: trace() had zero callers/tests).  On CPU the
    xplane protobuf is still produced; on TPU the same call captures
    device kernel timelines (benchmarks/capture_trace.py)."""
    import glob

    from pqp_for_mpc_tpu import SolverConfig, solve_batched
    from pqp_for_mpc_tpu.utils.profiling import timed, trace

    primal, dual = _problem(B=4)
    cfg = SolverConfig(max_iters=20_000, check_every=4,
                       strict_weak_duality=False)
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        solve_batched(primal, dual, cfg=cfg)
    artifacts = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    assert artifacts, f"no xplane artifact under {logdir}"
    assert all(os.path.getsize(a) > 0 for a in artifacts)

    # timed(): fenced wall-clock returns a positive time and the result
    secs, res = timed(lambda: solve_batched(primal, dual, cfg=cfg),
                      repeats=1, warmup=1)
    assert secs > 0 and bool(np.asarray(res.converged).all())


import os  # noqa: E402  (used by the trace test; keep module imports light)
