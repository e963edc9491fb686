"""Data-parallel weak-scaling efficiency on a virtual CPU mesh.

One physical TPU chip cannot measure multi-chip scaling (BENCHMARKS.md
caveat), but the virtual CPU mesh CAN bound the framework's own
collective overhead: the data-parallel solve's single cross-device
dependency is the ``all(done)`` psum in the while-loop condition
(parallel/sharded.py).  Weak scaling — per-device batch held constant —
isolates that overhead: with zero collective cost, time stays flat as
devices are added (until the host runs out of physical cores).

Spawns one fresh process per device count (device count is fixed at
backend init).  Emits one JSON line per point + an efficiency summary.
Run: ``python benchmarks/scaling_virtual.py``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
ndev = int(sys.argv[1]); per_dev_b = int(sys.argv[2])
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={ndev}")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", sys.argv[3])
import numpy as np, jax, jax.numpy as jnp
# sitecustomize may have pre-imported jax with the TPU platform pinned;
# override the live config too (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)
from pqp_for_mpc_tpu import SolverConfig, dualize, solve_batched
from pqp_for_mpc_tpu.parallel import make_mesh
from pqp_for_mpc_tpu.parallel.sharded import shard_batch
from pqp_for_mpc_tpu.io import load_example_dir

data = load_example_dir("/root/reference/example")
B = ndev * per_dev_b
rng = np.random.default_rng(0)
x = (np.asarray(data.x, np.float32)[:, None]
     + rng.normal(0, 0.3, (29, B)).astype(np.float32))
primal = data.assemble(x=jnp.asarray(x), Qp=jnp.linalg.inv(data.Qp_inv))
dual = dualize(primal)
mesh = make_mesh(data=ndev, model=1)
primal, dual = shard_batch(primal, dual, mesh)
cfg = SolverConfig(max_iters=2000, check_every=16)
run = lambda: jax.block_until_ready(solve_batched(primal, dual, cfg=cfg))
res = run()
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); run(); best = min(best, time.perf_counter()-t0)
print(json.dumps({"ndev": ndev, "B": B, "seconds": round(best, 4),
                  "converged": int(np.asarray(res.converged).sum()),
                  "solves_per_s": round(B / best, 1)}))
"""


def _run_point(ndev, per_dev_b, cache):
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(ndev), str(per_dev_b), cache],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(f"ndev={ndev} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
        sys.exit(1)
    row = json.loads(line[-1])
    print(json.dumps(row), flush=True)
    return row


def main():
    cache = os.path.join(REPO, ".jax_cache")
    cores = os.cpu_count()
    # STRONG scaling, fixed global batch: on a shared host every virtual
    # device competes for the same cores and XLA already multithreads
    # the 1-device baseline across them — so the time increase from
    # sharding the SAME work over more devices is a direct upper bound
    # on the framework's own sharding+collective overhead (the only
    # cross-device dependency is the while-loop all(done) reduction).
    GLOBAL_B = 2048
    rows = [_run_point(nd, GLOBAL_B // nd, cache) for nd in (1, 2, 4, 8)]
    t1 = rows[0]["seconds"]
    for row in rows[1:]:
        print(json.dumps({
            "strong_scaling_devices": row["ndev"],
            "overhead_vs_single_device":
                round(row["seconds"] / t1 - 1.0, 3),
            "core_oversubscribed": row["ndev"] > cores}), flush=True)


if __name__ == "__main__":
    main()
