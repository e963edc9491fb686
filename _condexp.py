import numpy as np, jax.numpy as jnp, dataclasses
from pqp_for_mpc_tpu import dualize, solve_batched
from pqp_for_mpc_tpu.config import MPC_CONFIG
from pqp_for_mpc_tpu.models import MPCSpec, double_integrator
from pqp_for_mpc_tpu.models.mpc import condense
from pqp_for_mpc_tpu.dual import dual_geometry, dualize_forcing
from pqp_for_mpc_tpu.solver import complementarity_gap, recover_U, _as2d

H = 128
spec = MPCSpec(plant=double_integrator(), horizon=H,
               Qy=np.eye(1, dtype=np.float32), R=0.05*np.eye(1, dtype=np.float32),
               r=np.zeros(1, np.float32), u_min=np.array([-1.], np.float32),
               u_max=np.array([1.], np.float32), du_max=np.array([0.5], np.float32))
data = condense(spec)
Qp = jnp.linalg.inv(data.Qp_inv)
primal = data.assemble(x=jnp.asarray(np.array([2.0, 0.0], np.float32)), Qp=Qp)
dual = dualize(primal)
cfg = dataclasses.replace(MPC_CONFIG, max_iters=50_000, erc=2.5e-4, eac=2.5e-4)
res = solve_batched(primal, dual, cfg=cfg)
print("standard check: conv", bool(res.converged[0]), "feas", bool(res.feasible[0]),
      "iters", int(res.iters[0]))
Y = res.Y
# dual-gradient residual vs direct GU - Kp, f64 audit
G64 = np.asarray(primal.Gp, np.float64); Kp64 = np.asarray(primal.Kp, np.float64)
U = np.asarray(res.U)[:, 0].astype(np.float64)
print("direct f64 viol of returned U:", (G64 @ U - Kp64).max())
grad = np.asarray(dual.Qd, np.float64) @ np.asarray(Y)[:,0].astype(np.float64) \
       + np.asarray(_as2d(dual.Fd))[:,0].astype(np.float64)
print("dual-gradient implied viol (-grad max):", (-grad).max())
# split recovery: U2 = -(QiF + Qp_inv Gp'Y) with QiF consistent w/ Fd
QiF = np.asarray(primal.Qp_inv, np.float64) @ np.asarray(_as2d(primal.Fp))[:,0].astype(np.float64)
U2 = -(QiF + np.asarray(primal.Qp_inv, np.float64) @ (G64.T @ np.asarray(Y)[:,0].astype(np.float64)))
print("split-recovery f64 viol:", (G64 @ U2 - Kp64).max())
