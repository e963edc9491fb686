"""Tensor-parallel solve of a long-horizon condensed MPC problem.

Row-shards the N x N dual Hessian across the ``model`` mesh axis and the
scenario batch across ``data`` (BASELINE config 3).  Runs on any device
count — use a virtual CPU mesh to try it without a pod:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/sharded_large_n.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run me from anywhere

import numpy as np
import jax
import jax.numpy as jnp

from pqp_for_mpc_tpu import SolverConfig, dualize
from pqp_for_mpc_tpu.models import MPCSpec, condense, random_stable
from pqp_for_mpc_tpu.parallel import make_mesh, solve_row_sharded


def main():
    n_dev = len(jax.devices())
    model = 4 if n_dev >= 8 else (2 if n_dev >= 2 else 1)
    data_ax = n_dev // model
    mesh = make_mesh(data=data_ax, model=model)
    print(f"mesh: {dict(mesh.shape)}")

    plant = random_stable(12, 4, seed=7)
    spec = MPCSpec(
        plant=plant, horizon=50,        # -> M=200 vars, N=800 constraints
        Qy=np.eye(plant.n_output, dtype=np.float32),
        R=0.1 * np.eye(4, dtype=np.float32),
        r=np.zeros(plant.n_output, np.float32),
        u_min=-2 * np.ones(4, np.float32), u_max=2 * np.ones(4, np.float32),
        du_max=np.ones(4, np.float32))
    data = condense(spec)
    Qp = jnp.linalg.inv(data.Qp_inv)

    B = 8 * data_ax
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 0.5, (12, B)).astype(np.float32)
    primal = data.assemble(x=jnp.asarray(x), D=jnp.zeros((50, ), np.float32)
                           if plant.n_dist == 1 else None, Qp=Qp)
    cfg = SolverConfig(erc=1e-4, eac=1e-4, eaj=1e-3, erj=1e-3, y0=0.01,
                       check_every=8, accel_every=4,
                       strict_weak_duality=False, max_iters=50_000)
    dual = dualize(primal, theta_floor=cfg.theta_floor)
    res = solve_row_sharded(primal, dual, cfg=cfg, mesh=mesh)
    print(res.stats())


if __name__ == "__main__":
    main()
