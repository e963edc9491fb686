"""Solve the reference's shipped example/ MPC instance.

Equivalent of compiling and running the reference's ``PQP_CPU.c``
(README.md:8-10), plus the fast path the reference doesn't have.

    python examples/solve_reference_example.py [path-to-example-dir]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import sys

import jax.numpy as jnp
import numpy as np

import pqp_for_mpc_tpu as pqp
from pqp_for_mpc_tpu.io import load_example_dir


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/example"
    data = load_example_dir(path)
    primal = data.assemble(Qp=jnp.linalg.inv(data.Qp_inv))

    # reference-parity settings (Y0=1000, 1e-6 tolerances): 313 iterations
    res = pqp.solve(primal, cfg=pqp.SolverConfig(max_iters=5000))
    print(f"parity:   {int(res.iters)} iters, Jp={float(res.Jp):.2f}, "
          f"U*={np.asarray(res.U).round(4)}")

    # fast settings (small cold start + safeguarded acceleration): ~9
    res = pqp.solve(primal, cfg=pqp.SolverConfig(
        max_iters=5000, y0=1.0, check_every=4, accel_every=4))
    print(f"fast:     {int(res.iters)} iters, Jp={float(res.Jp):.2f}, "
          f"U*={np.asarray(res.U).round(4)}")


if __name__ == "__main__":
    main()
