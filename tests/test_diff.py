"""Differentiable QP solving: implicit-diff gradients vs finite
differences (new capability; no reference counterpart)."""

import numpy as np
import pytest


def _problem(seed=0, M=4, N=10):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    L = rng.standard_normal((M, M)).astype(np.float32)
    Qp = L @ L.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.integers(-1, 2, (N, M)).astype(np.float32)
    Kp = rng.uniform(0.5, 2.0, N).astype(np.float32)
    Fp = (rng.standard_normal(M) * 5).astype(np.float32)
    return (jnp.asarray(Qp), jnp.asarray(Fp), jnp.asarray(Gp),
            jnp.asarray(Kp))


def _cfg():
    from pqp_for_mpc_tpu import SolverConfig
    return SolverConfig(max_iters=100_000, check_every=4, accel_every=4,
                        y0=0.1, strict_weak_duality=False,
                        eaj=1e-5, erj=1e-6)


def test_forward_matches_solver():
    from pqp_for_mpc_tpu.diff import solve_qp_implicit

    Qp, Fp, Gp, Kp = _problem()
    U = solve_qp_implicit(Qp, Fp, Gp, Kp, _cfg())
    # constraints hold
    assert np.all(np.asarray(Gp @ U) <= np.asarray(Kp) + 1e-4)


def test_vmap_forward_and_grad():
    """solve_qp_implicit composes with vmap (batched scenarios) in both
    the forward solve and the implicit-diff backward."""
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.diff import solve_qp_implicit

    Qp, Fp, Gp, Kp = _problem(seed=4)
    cfg = _cfg()
    rng = np.random.default_rng(5)
    Fps = jnp.asarray((rng.standard_normal((3, 4)) * 5).astype(np.float32))
    f = jax.vmap(lambda fp: solve_qp_implicit(Qp, fp, Gp, Kp, cfg))
    U = f(Fps)
    assert U.shape == (3, 4)
    for b in range(3):
        Ub = solve_qp_implicit(Qp, Fps[b], Gp, Kp, cfg)
        np.testing.assert_allclose(np.asarray(U[b]), np.asarray(Ub),
                                   rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda fps: jnp.sum(f(fps) ** 2))(Fps)
    assert g.shape == Fps.shape
    assert np.isfinite(np.asarray(g)).all()
    # cross-check one batch element against the unbatched gradient
    g0 = jax.grad(lambda fp: jnp.sum(
        solve_qp_implicit(Qp, fp, Gp, Kp, cfg) ** 2))(Fps[0])
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g0),
                               rtol=1e-4, atol=1e-4)


def test_gradient_through_scan_rollout():
    """Gradients flow through a closed-loop lax.scan containing the
    implicit-diff solve (verified vs finite differences)."""
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.diff import solve_qp_implicit
    from pqp_for_mpc_tpu.models import MPCSpec, condense, double_integrator

    plant = double_integrator()
    H = 6
    spec = MPCSpec(
        plant=plant, horizon=H,
        Qy=np.eye(1, dtype=np.float32), R=np.eye(1, dtype=np.float32),
        r=np.zeros(1, np.float32),
        u_min=-np.ones(1, np.float32), u_max=np.ones(1, np.float32),
        du_max=np.ones(1, np.float32))
    data = condense(spec)
    Qp0 = jnp.linalg.inv(data.Qp_inv)
    A = jnp.asarray(plant.A)
    Bm = jnp.asarray(plant.B)
    cfg = _cfg()

    def loss(log_r):
        Qp = Qp0 + 2.0 * (jnp.exp(log_r) - 1.0) * jnp.eye(
            H, dtype=jnp.float32)

        def step(x, _):
            primal = data.assemble(x=x, D=jnp.zeros(H, jnp.float32), Qp=Qp)
            U = solve_qp_implicit(Qp, primal.Fp, primal.Gp, primal.Kp, cfg)
            xn = A @ x + Bm @ U[:1]
            return xn, xn[0] ** 2 + 0.4 * U[0] ** 2

        _, cs = jax.lax.scan(step, jnp.asarray([1.5, 0.0], jnp.float32),
                             None, length=8)
        return jnp.sum(cs)

    for lr in (-2.0, 0.0):
        an = float(jax.grad(loss)(jnp.asarray(lr)))
        eps = 1e-2
        fd = (float(loss(jnp.asarray(lr + eps)))
              - float(loss(jnp.asarray(lr - eps)))) / (2 * eps)
        assert abs(an - fd) <= 5e-2 * max(1.0, abs(fd)), (lr, an, fd)


@pytest.mark.parametrize("wrt", ["Fp", "Kp", "Qp", "Gp"])
def test_gradients_match_finite_differences(wrt):
    import jax
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.diff import solve_qp_implicit

    Qp, Fp, Gp, Kp = _problem(seed=2)
    cfg = _cfg()
    w = np.asarray(np.random.default_rng(1).standard_normal(4), np.float32)

    def loss(Qp, Fp, Gp, Kp):
        U = solve_qp_implicit(Qp, Fp, Gp, Kp, cfg)
        return jnp.dot(jnp.asarray(w), U)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(Qp, Fp, Gp, Kp)
    g = dict(zip(["Qp", "Fp", "Gp", "Kp"], grads))[wrt]

    # central finite differences on a few random coordinates
    base = {"Qp": Qp, "Fp": Fp, "Gp": Gp, "Kp": Kp}
    arr = np.asarray(base[wrt]).copy()
    rng = np.random.default_rng(3)
    idxs = [tuple(rng.integers(0, s) for s in arr.shape) for _ in range(4)]
    eps = 1e-3
    for idx in idxs:
        hi = arr.copy()
        lo = arr.copy()
        hi[idx] += eps
        lo[idx] -= eps
        if wrt == "Qp":   # keep symmetric PD structure for the solver
            if idx[0] != idx[1]:
                hi[idx[::-1]] += eps
                lo[idx[::-1]] -= eps
        args_hi = dict(base)
        args_lo = dict(base)
        args_hi[wrt] = jnp.asarray(hi)
        args_lo[wrt] = jnp.asarray(lo)
        f_hi = float(loss(**args_hi))
        f_lo = float(loss(**args_lo))
        fd = (f_hi - f_lo) / (2 * eps)
        an = float(np.asarray(g)[idx])
        if wrt == "Qp" and idx[0] != idx[1]:
            an = an + float(np.asarray(g)[idx[::-1]])
        assert abs(fd - an) <= 5e-2 * max(1.0, abs(fd)), \
            f"{wrt}[{idx}]: fd={fd} vs analytic={an}"
