"""Golden conformance vs the reference CPU oracle on the shipped example/.

Ground truth captured by compiling and running the reference ``PQP_CPU.c``
unmodified (tolerances 1e-6, theta floor 5, Y0=1000):

    Printing number of iterations = 313
    Jp = 155845.734375
    Jd = -155845.734375
    U* = [-6.398985, -10.646728, -4.792132, -7.027614,
          -4.792255, -10.643003, -6.398996]

The parity bar is the reference's own reproducibility: its two published
U* snapshots (comments at PQP_GPU_optimized_coarsened.cu:1201-1216) differ
from each other by ~6e-3, so we assert U* agreement to 1e-2 absolute and
the iteration count within a small margin (float32 accumulation-order
differences shift the exact iteration at which the 1e-6 gap tests flip).
"""

import numpy as np
import pytest

GOLDEN_U = np.array([-6.398985, -10.646728, -4.792132, -7.027614,
                     -4.792255, -10.643003, -6.398996], dtype=np.float32)
GOLDEN_ITERS = 313
GOLDEN_JP = 155845.734375


def test_loader_shapes(example_data):
    d = example_data
    assert d.Qp_inv.shape == (7, 7)
    assert d.Gp.shape == (28, 7)
    assert d.Fp2.shape == (7, 29)
    assert d.Mp1.shape == (29, 29)
    assert d.Kp.shape == (28,)
    # Kp: 14 box bounds at 20.0 then 14 zeros (example/Kp.txt)
    assert np.allclose(d.Kp[:14], 20.0)
    assert np.allclose(d.Kp[14:], 0.0)
    # Qp_inv is read transposed; the example's is symmetric-ish diagonal
    assert abs(d.Qp_inv[0, 0] - 0.998114) < 1e-6


def test_loader_transpose_semantics(tmp_path):
    """A non-symmetric file must land transposed, per PQP_CPU.c:764-773."""
    from pqp_for_mpc_tpu.io.example_loader import read_matrix_file
    p = tmp_path / "m.txt"
    p.write_text("1 2 3 4 5 6 #\n")  # file is the transpose of logical 3x2
    m = read_matrix_file(str(p), 3, 2)
    # tokens.reshape(2,3).T
    assert m.shape == (3, 2)
    np.testing.assert_allclose(m, np.array([[1, 4], [2, 5], [3, 6]], np.float32))


def test_golden_solve(example_data):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal)
    res = solve(primal, dual, cfg=SolverConfig(max_iters=5000))

    assert bool(res.converged)
    assert bool(res.feasible)
    np.testing.assert_allclose(np.asarray(res.U), GOLDEN_U, atol=1e-2)
    # Jp == -Jd at convergence (the algorithm's self-check)
    assert abs(float(res.Jp) - GOLDEN_JP) / GOLDEN_JP < 1e-3
    assert abs(float(res.Jp) + float(res.Jd)) <= 1e-6 * abs(float(res.Jd)) + 1e-5 * GOLDEN_JP
    # measured: exactly 313 on the CPU backend at every (precision,
    # check_every) combination; ±8 is slack for XLA reduction-order
    # changes across backends/versions, not for cadence bugs
    assert abs(int(res.iters) - GOLDEN_ITERS) <= 8


def test_golden_iteration_parity_exact(example_data):
    """At check_every=1 + precision=highest the iteration count pins to
    the reference's 313 exactly (the C++ oracle also hits 313); measured
    313 at default precision too — the margin is 2 ulp-of-process, not
    the old ±60."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal, precision="highest")
    res = solve(primal, dual,
                cfg=SolverConfig(max_iters=5000, check_every=1,
                                 precision="highest"))
    assert bool(res.converged)
    assert abs(int(res.iters) - GOLDEN_ITERS) <= 2


def test_check_cadence_invariance(example_data):
    """check_every=k leaves the trajectory unchanged: final U matches and
    the reported iteration count rounds up to the same neighborhood."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal)
    r1 = solve(primal, dual, cfg=SolverConfig(max_iters=5000, check_every=1))
    r8 = solve(primal, dual, cfg=SolverConfig(max_iters=5000, check_every=8))
    assert bool(r8.converged)
    np.testing.assert_allclose(np.asarray(r8.U), np.asarray(r1.U), atol=2e-3)
    assert int(r1.iters) <= int(r8.iters) <= int(r1.iters) + 8


def test_acceleration_matches_golden_much_faster(example_data):
    """The safeguarded projected-gradient acceleration reaches the same U*
    in ~9 iterations where the plain multiplicative update needs 313."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal)
    res = solve(primal, dual,
                cfg=SolverConfig(max_iters=5000, check_every=4,
                                 accel_every=4))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.U), GOLDEN_U, atol=1e-2)
    assert int(res.iters) <= 40


def test_small_cold_start_matches_golden(example_data):
    """Y0 = 1 converges to the same solution far faster than the
    reference's Y0 = 1000 (multiplicative growth is fast, decay is slow)."""
    import jax.numpy as jnp
    from pqp_for_mpc_tpu import SolverConfig, dualize, solve

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal)
    res = solve(primal, dual, cfg=SolverConfig(max_iters=5000, y0=1.0))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.U), GOLDEN_U, atol=1e-2)
    assert int(res.iters) <= 40


def test_example_dir_roundtrip(example_data, tmp_path):
    """write_example_dir -> load_example_dir is the identity (format
    interop: condensed problems can be exported for the original
    executables)."""
    from pqp_for_mpc_tpu.io import load_example_dir, write_example_dir
    import dataclasses

    p = str(tmp_path / "exported")
    write_example_dir(p, example_data)
    back = load_example_dir(p)
    for f in dataclasses.fields(type(example_data)):
        if getattr(example_data, f.name) is None:   # optional Kx/Kd
            assert getattr(back, f.name) is None
            continue
        a = np.asarray(getattr(example_data, f.name))
        b = np.asarray(getattr(back, f.name))
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-5,
                                   err_msg=f.name)


def test_dual_structure(example_data):
    import jax.numpy as jnp
    import numpy as np
    from pqp_for_mpc_tpu import dualize

    primal = example_data.assemble(Qp=jnp.linalg.inv(example_data.Qp_inv))
    dual = dualize(primal)
    Qd = np.asarray(dual.Qd)
    assert Qd.shape == (28, 28)
    # Qd = G Qp^-1 G' is symmetric PSD up to float error
    np.testing.assert_allclose(Qd, Qd.T, atol=1e-4)
    # theta floor (PQP_CPU.c:240)
    assert np.all(np.asarray(dual.theta) >= 5.0)
    # split identity: Qdp_theta - Qdn_theta == Qd
    np.testing.assert_allclose(
        np.asarray(dual.Qdp_theta) - np.asarray(dual.Qdn_theta), Qd, atol=1e-5)
    # Fd split: Fdp - Fdn == Fd, both nonnegative
    np.testing.assert_allclose(
        np.asarray(dual.Fdp) - np.asarray(dual.Fdn), np.asarray(dual.Fd),
        atol=1e-5)
    assert np.all(np.asarray(dual.Fdp) >= 0) and np.all(np.asarray(dual.Fdn) >= 0)
