"""CLI surface tests (in-process main(argv), CPU backend)."""

import json
import os

import numpy as np
import pytest


def test_generate_and_solve_file_roundtrip(tmp_path, capsys):
    from pqp_for_mpc_tpu.cli import main

    out = str(tmp_path / "inst.txt")
    assert main(["generate", "12", "30", "--seed", "5", "-o", out]) == 0
    capsys.readouterr()
    rc = main(["solve-file", out, "--y0", "0.01", "--accel-every", "4",
               "--check-every", "8", "--no-strict", "--max-iters", "50000",
               "--eaj", "1e-3", "--erj", "1e-4"])
    text = capsys.readouterr().out
    assert "M=12 N=30" in text
    assert rc in (0, 2)   # convergence depends on the random instance


def test_solve_file_mixed_matches_f32(tmp_path, capsys):
    """--mixed must print the same verdict/costs as the f32 path (the
    certification is f32 either way)."""
    from pqp_for_mpc_tpu.cli import main

    out = str(tmp_path / "inst.txt")
    assert main(["generate", "12", "30", "--seed", "5", "-o", out]) == 0
    capsys.readouterr()
    flags = ["--y0", "0.01", "--accel-every", "4", "--check-every", "8",
             "--no-strict", "--max-iters", "50000",
             "--eaj", "1e-3", "--erj", "1e-4"]
    rc32 = main(["solve-file", out] + flags)
    t32 = capsys.readouterr().out
    rcmx = main(["solve-file", out, "--mixed"] + flags)
    tmx = capsys.readouterr().out
    assert rc32 == rcmx
    jp32 = float(t32.split("Jp=")[1].split()[0])
    jpmx = float(tmx.split("Jp=")[1].split()[0])
    assert abs(jp32 - jpmx) <= 1e-3 * max(1.0, abs(jp32))


def test_solve_example_dir(example_dir, capsys):
    from pqp_for_mpc_tpu.cli import main

    rc = main(["solve", example_dir, "--accel-every", "4",
               "--check-every", "4", "--max-iters", "5000"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Printing number of iterations" in out
    assert "Jp = 155845" in out
    # first component of U*
    assert "-6.39" in out


def test_serve_daemon(example_dir):
    import json
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # env vars are ignored when the interpreter pre-imports jax
    # (sitecustomize pins the hardware platform and the daemon would pay
    # multi-minute tunnel compiles); force CPU via jax.config instead.
    boot = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from pqp_for_mpc_tpu.cli import main; "
            "sys.exit(main(['serve', '--accel-every', '4', "
            "'--check-every', '4', '--max-iters', '5000']))")
    p = subprocess.Popen(
        [sys.executable, "-u", "-c", boot],
        cwd=REPO, env=env, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)
    try:
        # one solve shape only — each new shape pays a fresh jit compile
        # in the subprocess, which dominates suite wall time
        for req, expect_ok in [
            ({"example_dir": example_dir}, True),
            ({"nonsense": True}, False),
            ({"example_dir": example_dir, "x": [305.0] * 29}, True),
        ]:
            p.stdin.write(json.dumps(req) + "\n")
            p.stdin.flush()
            rep = json.loads(p.stdout.readline())
            if expect_ok:
                assert rep["converged"] == rep["batch"], rep
            else:
                assert "error" in rep
        p.stdin.write(json.dumps({"cmd": "quit"}) + "\n")
        p.stdin.flush()
        # generous: subprocess compile times vary heavily under suite load
        assert p.wait(timeout=300) == 0
    finally:
        if p.poll() is None:
            p.kill()


def test_rollout_jit_cli(capsys):
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator", "--horizon",
               "12", "--steps", "10", "--jit"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rc == 0
    assert rec["steps"] == 10
    assert rec["iters_max"] < 50_000


def test_rollout_cli_moves(capsys):
    """--moves blocks the input sequence on the condensed backend."""
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator", "--horizon",
               "32", "--steps", "8", "--jit", "--moves", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rc == 0
    assert rec["moves"] == 4
    assert rec["final_state_norm"] < 2.0


def test_rollout_cli_output_bound(capsys):
    """--y-max adds hard output rows on either backend (stage-wise
    here, matrix-free since round 3)."""
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator", "--horizon",
               "12", "--steps", "6", "--jit", "--backend", "stagewise",
               "--y-max", "1.5"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rc == 0
    assert rec["backend"] == "stagewise"


def test_rollout_robust_w(capsys):
    """--robust-w tightens bounds into per-stage schedules; the loop
    still runs certified."""
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator",
               "--horizon", "12", "--steps", "8",
               "--y-max", "1.5", "--robust-w", "0.002,0.01", "--jit"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["robust_w"] == "0.002,0.01"
    assert out["iters_max"] < 50000


def test_rollout_robust_w_bad_width(capsys):
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator",
               "--horizon", "8", "--steps", "4", "--robust-w", "0.01"])
    assert rc == 1
    assert "half-widths" in capsys.readouterr().err


def test_rollout_offset_free(capsys):
    """--offset-free runs the output-feedback loop and reports the
    settled disturbance estimate."""
    from pqp_for_mpc_tpu.cli import main

    rc = main(["rollout", "--plant", "double_integrator",
               "--horizon", "12", "--steps", "60",
               "--offset-free", "input", "--d-true", "0.15"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["offset_free"] == "input"
    np.testing.assert_allclose(out["d_hat_final"], [0.15], atol=0.02)
    # offset-free: output settled at the (zero) reference
    np.testing.assert_allclose(out["y_final"], [0.0], atol=0.02)


def test_estimate_mhe_one_sided(capsys):
    """estimate --kind mhe beats --kind kf on one-sided noise (the
    bounded-QP regime), both reported via RMSE on the synthesized
    record."""
    from pqp_for_mpc_tpu.cli import main

    rc = main(["estimate", "--kind", "mhe", "--one-sided",
               "--simulate", "80", "--window", "8"])
    mhe = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert mhe["converged_frac"] == 1.0
    rc = main(["estimate", "--kind", "kf", "--one-sided",
               "--simulate", "80"])
    kf = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert sum(mhe["rmse"]) < sum(kf["rmse"])


def test_estimate_npz_roundtrip(tmp_path, capsys):
    from pqp_for_mpc_tpu.cli import main

    rec = str(tmp_path / "rec.npz")
    est = str(tmp_path / "est.npz")
    rng = np.random.default_rng(0)
    T = 40
    np.savez(rec, U=0.1 * rng.standard_normal((T, 1)).astype(np.float32),
             Y=0.1 * rng.standard_normal((T, 1)).astype(np.float32),
             x0=np.zeros(2, np.float32))
    rc = main(["estimate", "--kind", "mhe", "--window", "6",
               "--data", rec, "-o", est])
    out = json.loads(capsys.readouterr().out)
    assert rc in (0, 2)
    xh = np.load(est)["x_hat"]
    assert xh.shape == (T - 6 + 1, 2)
    assert "rmse" not in out     # no truth in the record


def test_serve_spec_request(capsys, monkeypatch):
    """serve: spec-based MPC step requests return u0."""
    import io
    from pqp_for_mpc_tpu.cli import main

    req = {"spec": {"plant": "double_integrator", "horizon": 8,
                    "r": [0.5]}, "x": [0.0, 0.0]}
    lines = json.dumps(req) + "\n" + json.dumps(
        {**req, "u_prev": [0.1]}) + "\n" + '{"cmd": "quit"}\n'
    monkeypatch.setattr("sys.stdin", io.StringIO(lines))
    rc = main(["serve", "--y0", "0.01", "--accel-every", "4",
               "--check-every", "8", "--no-strict",
               "--eaj", "1e-4", "--erj", "1e-4",
               "--erc", "1e-4", "--eac", "1e-4"])
    assert rc == 0
    replies = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
    assert len(replies) == 2
    for r in replies:
        assert "u0" in r and len(r["u0"]) == 1
        assert r["converged"] == 1
    # same spec key -> cached controller; u_prev moves the slew rows
    assert replies[0]["u0"] != replies[1]["u0"]
