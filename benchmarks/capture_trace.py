"""Capture a jax.profiler trace of the whole-solve kernel on hardware.

Produces the committed artifact under ``benchmarks/traces/`` (the
framework's analog of the reference's gprof flat profile shipped in its
report): a Perfetto ``trace.json.gz`` + the raw ``xplane.pb`` with the
device timeline of one ``fused_full_solve`` launch solving a B=8192
batch of example-sized QPs to full 1e-6 convergence.

Run: ``python benchmarks/capture_trace.py [--logdir benchmarks/traces]``
then load the trace.json.gz in ui.perfetto.dev, or aggregate with the
summary printer below.  Works over the axon tunnel (the device timeline
is collected chip-side; only start/stop cross the wire).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="benchmarks/traces")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--kernel",
                    choices=("resident", "tiled_solve", "mixed"),
                    default="resident",
                    help="resident = example-sized whole-solve kernel; "
                         "tiled_solve = the N=4096 streamed single "
                         "launch (ops/tiled_solve_kernel.py); mixed = "
                         "solve_mixed with the bf16 streamed-kernel "
                         "bulk phase (solver.solve_mixed + "
                         "ops/tiled_kernel.py dtype=bfloat16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import pqp_for_mpc_tpu as pqp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.io import load_example_dir
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.utils.profiling import trace

    if args.kernel in ("tiled_solve", "mixed"):
        from pqp_for_mpc_tpu.ops.tiled_solve_kernel import \
            solve_fused_tiled
        from pqp_for_mpc_tpu.problem import PrimalQP
        N, M, B = 4096, 1024, 128
        rng = np.random.default_rng(0)
        Q = rng.normal(0, 1, (M, M)).astype(np.float32)
        Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
        primal = PrimalQP(
            Qp=jnp.asarray(Qp),
            Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
            Fp=jnp.asarray(rng.normal(0, 3, (M, B)).astype(np.float32)),
            Mp=jnp.zeros((B,), jnp.float32),
            Gp=jnp.asarray(rng.normal(0, 1, (N, M)).astype(np.float32)),
            Kp=jnp.asarray(rng.uniform(1, 10, N).astype(np.float32)))
        dual = dualize(primal)
        cfg = pqp.SolverConfig(max_iters=20000, check_every=16,
                               accel_every=16, strict_weak_duality=False,
                               gap_from_complementarity=True)
        if args.kernel == "mixed":
            import dataclasses
            from functools import partial
            cfg = dataclasses.replace(cfg, use_pallas=True)
            run_j = jax.jit(partial(pqp.solve_mixed, cfg=cfg))
            run = lambda: run_j(primal, dual)
        else:
            run = lambda: solve_fused_tiled(primal, dual, cfg=cfg)
    else:
        data = load_example_dir("/root/reference/example")
        B = args.batch
        rng = np.random.default_rng(0)
        x = (np.asarray(data.x, np.float32)[:, None]
             + rng.normal(0, 0.3, (29, B)).astype(np.float32))
        primal = data.assemble(x=jnp.asarray(x),
                               Qp=jnp.linalg.inv(data.Qp_inv))
        dual = dualize(primal)
        cfg = pqp.SolverConfig(max_iters=2000, check_every=16)
        run = lambda: solve_fused(primal, dual, cfg=cfg)
    jax.block_until_ready(run())  # warm
    with trace(args.logdir):
        res = jax.block_until_ready(run())
    print("converged:", int(np.asarray(res.converged).sum()), "/", B,
          " mean iters:", float(np.asarray(res.iters).mean()))

    # summarize device events from the freshest run dir
    runs = sorted(glob.glob(os.path.join(args.logdir, "plugins/profile/*")))
    latest = runs[-1]
    tj = glob.glob(os.path.join(latest, "*.trace.json.gz"))[0]
    events = json.load(gzip.open(tj)).get("traceEvents", [])
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X":
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    print(f"trace run: {latest}")
    for k in sorted(dur, key=lambda k: -dur[k])[:8]:
        print(f"  {dur[k] / 1e3:10.3f} ms  x{cnt[k]:4d}  {k[:80]}")


if __name__ == "__main__":
    main()
