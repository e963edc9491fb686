"""Automatic solve-engine routing (VERDICT r4 item 2).

The bar: route_solve reproduces the winner of every regime measured in
the committed bench artifacts (MIXED_RESIDENT_r4, MIXED_BENCH_r4,
CONFORMANCE_r3, CONTROLLER_BENCH_r4), and solve_auto is a drop-in for
solve_batched — same results where the route lands on the XLA engine
(this CPU test host), retry_cold included.
"""

import numpy as np
import pytest


def _cfg(**kw):
    from pqp_for_mpc_tpu import SolverConfig
    args = dict(max_iters=20_000, check_every=8, accel_every=4, y0=0.01,
                eaj=1e-4, erj=1e-4, erc=1e-4, eac=1e-4,
                strict_weak_duality=False, gap_from_complementarity=True)
    args.update(kw)
    return SolverConfig(**args)


# ---------------------------------------------------------------- decisions

def test_route_cpu_always_xla():
    from pqp_for_mpc_tpu.routing import route_solve
    for n, b, distinct in [(28, 1, False), (4096, 128, False),
                           (2048, 8, True)]:
        assert route_solve(n, b, distinct, _cfg(), m_dim=512,
                           platform="cpu") == "xla"


def test_route_shared_resident_small_n_fused():
    """N < 512 resident, big cold batch -> whole-solve kernel
    (CONFORMANCE_r3 1.1-2.8x; bench.py headline; MIXED_RESIDENT_r4
    N=256 row where mixed is 0.99x vs the kernel)."""
    from pqp_for_mpc_tpu.routing import route_solve
    assert route_solve(28, 4_194_304, False, _cfg(), platform="tpu") \
        == "fused"
    assert route_solve(256, 128, False, _cfg(), platform="tpu") == "fused"


def test_route_shared_resident_large_n_mixed_in_comp_mode():
    """N >= 512 resident + complementarity mode -> mixed
    (MIXED_RESIDENT_r4: 1.52-2.46x over the kernel); reference mode
    stays on the kernel (no measured mixed row in that mode)."""
    from pqp_for_mpc_tpu.routing import route_solve
    assert route_solve(512, 128, False, _cfg(), platform="tpu") == "mixed"
    assert route_solve(1024, 128, False, _cfg(), platform="tpu") == "mixed"
    ref = _cfg(gap_from_complementarity=False)
    assert route_solve(1024, 128, False, ref, platform="tpu") == "fused"


def test_route_shared_streamed_mixed():
    """Beyond VMEM residency -> mixed (MIXED_BENCH_r4: 3.3-3.7x vs f32
    XLA at N=4096, 2.5-2.8x vs the streamed f32 whole-solve kernel)."""
    from pqp_for_mpc_tpu.ops.kernels import fits_vmem
    from pqp_for_mpc_tpu.routing import route_solve
    assert not fits_vmem(4096)
    assert route_solve(4096, 128, False, _cfg(), platform="tpu") == "mixed"
    # streamed beats warm/small-batch preference: HBM bytes dominate
    assert route_solve(4096, 8, False, _cfg(), platform="tpu",
                       warm=True) == "mixed"


def test_route_warm_or_small_batch_resident_xla():
    """The receding-horizon regime (B < 128) was measured through
    solve_batched (CONTROLLER_BENCH) — and small batches pad to 128
    kernel lanes anyway.  WARM LARGE batches ride the kernel when the
    cfg is kernel-certifiable (measured: fused 0.294 s vs XLA 0.390 s
    at N=96/B=2048 warm, identical certified counts) but stay on XLA
    at the unmeasured warm-mixed sizes."""
    from pqp_for_mpc_tpu.routing import route_solve
    assert route_solve(96, 1, False, _cfg(), platform="tpu",
                       warm=True) == "xla"
    assert route_solve(96, 4, False, _cfg(), platform="tpu") == "xla"
    assert route_solve(96, 2048, False, _cfg(), platform="tpu",
                       warm=True) == "fused"
    assert route_solve(1024, 2048, False, _cfg(), platform="tpu",
                       warm=True) == "xla"
    # ...including in reference mode (the warm-kernel win was measured
    # at small N only; N=1024 warm measured the kernel ~6% behind XLA)
    assert route_solve(1024, 2048, False,
                       _cfg(gap_from_complementarity=False),
                       platform="tpu", warm=True) == "xla"
    # golden-parity guard: the CLI single solve keeps XLA's exact
    # reference-mode float program
    assert route_solve(28, 1, False, _cfg(gap_from_complementarity=False),
                       platform="tpu") == "xla"


def test_route_feas_gradient_avoids_kernel_certification():
    """A cfg asking for the operator-consistent certificate
    (feas_from_dual_gradient, MPC_CONFIG's default since round 5) must
    not route to the whole-solve kernel, whose in-kernel feasibility is
    the reference's forcing-scale Gp U program — the XLA check (or
    mixed's phase 2) is the only engine that honors the flag."""
    from pqp_for_mpc_tpu.routing import route_solve
    cfg = _cfg(feas_from_dual_gradient=True)
    assert route_solve(256, 4096, False, cfg, platform="tpu") == "xla"
    # the >=512 complementarity regime still goes to mixed (its
    # certification runs through check_terminate, which honors the flag)
    assert route_solve(1024, 128, False, cfg, platform="tpu") == "mixed"
    # reference-style cfg without the flag keeps the kernel route
    assert route_solve(256, 4096, False, _cfg(), platform="tpu") == "fused"


def test_route_distinct():
    from pqp_for_mpc_tpu.ops.distinct_kernel import distinct_fits_vmem
    from pqp_for_mpc_tpu.routing import route_solve
    assert distinct_fits_vmem(128, 32)
    assert route_solve(128, 8, True, _cfg(), m_dim=32,
                       platform="tpu") == "fused_distinct"
    assert not distinct_fits_vmem(2048, 512)
    assert route_solve(2048, 8, True, _cfg(), m_dim=512,
                       platform="tpu") == "mixed"


def test_route_rejects_unknown_engine():
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.routing import solve_auto

    data = load_example_dir("/root/reference/example")
    primal = data.assemble(Qp=jnp.linalg.inv(data.Qp_inv))
    dual = dualize(primal)
    with pytest.raises(ValueError, match="unknown engine"):
        solve_auto(primal, dual, engine="cuda")


def test_auto_backend_by_horizon():
    """backend="auto": condensed below the measured n_con crossover
    (CONTROLLER_BENCH_r4: condensed 2.3-4x faster at H<=128), stage-wise
    beyond; condensed-only features pin condensed."""
    import dataclasses
    from pqp_for_mpc_tpu.models import (MPCController, MPCSpec,
                                        auto_backend, condensed_n_con,
                                        double_integrator)

    def spec(H, **kw):
        args = dict(plant=double_integrator(), horizon=H,
                    Qy=np.eye(1, dtype=np.float32),
                    R=0.05 * np.eye(1, dtype=np.float32),
                    r=np.zeros(1, np.float32),
                    u_min=np.array([-1.0], np.float32),
                    u_max=np.array([1.0], np.float32),
                    du_max=np.array([0.5], np.float32))
        args.update(kw)
        return MPCSpec(**args)

    assert condensed_n_con(spec(16)) == 64
    assert auto_backend(spec(16)) == "condensed"
    assert auto_backend(spec(128)) == "condensed"
    # 4*512 = 2048 > crossover
    assert auto_backend(spec(512)) == "stagewise"
    # output bounds double the row count per stage: 6*H
    s_y = spec(256, y_max=np.array([1.0], np.float32))
    assert condensed_n_con(s_y) == 4 * 256 + 2 * 256
    assert auto_backend(s_y) == "stagewise"
    # condensed-only features pin the condensed backend at any horizon
    assert auto_backend(spec(512, moves=8)) == "condensed"
    # the controller accepts "auto" and resolves it (the H=512 resolve
    # is asserted through the pure function above — instantiating it
    # would pay the full O(H^2) stage-wise build in a unit test)
    c = MPCController(spec(16), backend="auto")
    assert c.backend == "condensed"


# ---------------------------------------------------------------- behavior

def _example_problem():
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.io import load_example_dir

    data = load_example_dir("/root/reference/example")
    rng = np.random.default_rng(0)
    x = np.asarray(data.x, np.float32)[:, None] + rng.normal(
        0, 0.3, (data.x.shape[0], 16)).astype(np.float32)
    primal = data.assemble(x=jnp.asarray(x), Qp=jnp.linalg.inv(data.Qp_inv))
    return primal, dualize(primal)


def test_solve_auto_matches_solve_batched_on_cpu():
    from pqp_for_mpc_tpu import solve_batched
    from pqp_for_mpc_tpu.routing import solve_auto

    primal, dual = _example_problem()
    cfg = _cfg()
    a = solve_auto(primal, dual, cfg=cfg)
    b = solve_batched(primal, dual, cfg=cfg)
    assert bool(np.asarray(a.converged).all())
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    np.testing.assert_array_equal(np.asarray(a.iters), np.asarray(b.iters))


def test_solve_auto_forced_mixed_engine_certifies():
    """Engine override: the mixed path still certifies on the true f32
    problem (here on CPU, where auto routing would pick xla)."""
    import jax
    from pqp_for_mpc_tpu import solve_batched
    from pqp_for_mpc_tpu.routing import solve_auto

    primal, dual = _example_problem()
    cfg = _cfg(use_pallas=False)
    run = jax.jit(lambda p, d: solve_auto(p, d, cfg=cfg, engine="mixed"))
    a = run(primal, dual)
    assert bool(np.asarray(a.converged).all())
    b = solve_batched(primal, dual, cfg=cfg)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U),
                               rtol=1e-3, atol=2e-3)


def test_solve_auto_retry_cold_rescues_poisoned_warm_start():
    """retry_cold composes with routing: a hostile all-zeros warm start
    (the multiplicative update's absorbing state) is rescued by the
    in-dispatch cold retry on every engine path."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.routing import solve_auto

    primal, dual = _example_problem()
    cfg = _cfg()
    N, B = dual.n_con, 16
    Y0 = jnp.zeros((N, B), jnp.float32)
    res = solve_auto(primal, dual, Y0=Y0, cfg=cfg, retry_cold=True)
    assert bool(np.asarray(res.converged).all()), res.stats()
    # and through a forced non-default engine (generic retry wrapper)
    res2 = solve_auto(primal, dual, Y0=Y0, cfg=cfg, retry_cold=True,
                      engine="mixed")
    assert bool(np.asarray(res2.converged).all())


def test_forced_kernel_engine_rejected_off_tpu():
    """Forcing a Mosaic kernel engine on a non-TPU backend raises a
    clear error instead of a Mosaic lowering stack trace."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.routing import solve_auto

    data = load_example_dir("/root/reference/example")
    primal = data.assemble(Qp=jnp.linalg.inv(data.Qp_inv))
    dual = dualize(primal)
    with pytest.raises(ValueError, match="Mosaic TPU kernel"):
        solve_auto(primal, dual, engine="fused")


def test_auto_downgrades_on_split_free_dual():
    """Auto routing never errors on a split-free dual: it downgrades
    the kernel route to the best split-free engine (the user asked for
    half-memory geometry, not for an exception)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.routing import solve_auto

    data = load_example_dir("/root/reference/example")
    primal = data.assemble(Qp=jnp.linalg.inv(data.Qp_inv))
    d_fly = dualize(primal, materialize_splits=False)
    res = solve_auto(primal, d_fly, cfg=_cfg())
    assert bool(np.asarray(res.converged).all())
