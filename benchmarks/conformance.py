"""On-hardware Pallas-vs-XLA conformance sweep.

The kernels' correctness tests run in interpret mode on CPU
(tests/test_kernels.py, tests/test_tiled_kernel.py); Mosaic compilation
is a different code path with known divergence families (bf16 MXU
passes, scf.while carry legalization — see ops/solve_kernel.py).  This
script runs the REAL kernels on the REAL chip against the XLA solver
path across N ∈ {32 … 1024} and records lane-for-lane parity: iteration
counts, convergence flags, max |ΔU|.  The committed output
(benchmarks/CONFORMANCE_r2.json) is this framework's analog of the
reference's gprof evidence (Group 7 Report flat profile) — hardware
ground truth, not simulator claims.

Run: ``python benchmarks/conformance.py [--sizes 32,64,...]``.
One JSON line per size; exit code 1 if any size fails parity bars.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

#: update-kernel path: its convergence CHECK runs in XLA either way, so
#: iteration counts must match essentially exactly (residual mismatches
#: are Mosaic-vs-XLA dot rounding inside the updates drifting a
#: razor-edge lane across a check boundary; measured <= 1/128 lanes)
PARITY_ITERS_EXACT_FRAC = 0.98
#: whole-solve kernel: the ENTIRE solve including the four-part check is
#: an independent float program (Mosaic arithmetic end to end), so
#: iteration counts on razor-edge lanes legitimately differ — the same
#: property the reference's own CPU/GPU variant pairs have (its two
#: committed U* snapshots differ in the 3rd decimal,
#: PQP_GPU_optimized_coarsened.cu:1201-1216).  The correctness bars are
#: solution agreement and a bounded converged-count gap; the per-lane
#: iteration-count match fractions are recorded as data.
PARITY_U_ATOL = 5e-3         # max |U_pallas - U_xla| on converged lanes
PARITY_CONV_GAP_FRAC = 0.10  # |conv_fused - conv_xla| <= 10% of batch


def build(N, M, B, seed):
    import jax.numpy as jnp
    from pqp_for_mpc_tpu.dual import dualize
    from pqp_for_mpc_tpu.problem import PrimalQP

    rng = np.random.default_rng(seed)
    Q = rng.normal(0, 1, (M, M)).astype(np.float32)
    Qp = Q @ Q.T + M * np.eye(M, dtype=np.float32)
    Gp = rng.normal(0, 1, (N, M)).astype(np.float32)
    Fp = rng.normal(0, 3, (M, B)).astype(np.float32)
    Kp = rng.uniform(1, 10, (N,)).astype(np.float32)
    primal = PrimalQP(Qp=jnp.asarray(Qp),
                      Qp_inv=jnp.asarray(np.linalg.inv(Qp)),
                      Fp=jnp.asarray(Fp), Mp=jnp.zeros((B,), jnp.float32),
                      Gp=jnp.asarray(Gp), Kp=jnp.asarray(Kp))
    return primal, dualize(primal)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,64,128,256,512,1024")
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--max-iters", type=int, default=20000)
    args = ap.parse_args()

    import jax

    from pqp_for_mpc_tpu import SolverConfig
    from pqp_for_mpc_tpu.ops.solve_kernel import solve_fused
    from pqp_for_mpc_tpu.solver import solve_batched

    dev = str(jax.devices()[0])
    ok_all = True
    for N in [int(s) for s in args.sizes.split(",")]:
      for mode in ("reference", "complementarity"):
        # "reference": the reference's exact termination semantics
        # (strict weak duality, explicit Jp+Jd gap).  "complementarity":
        # the production MPC certification (gap_from_complementarity,
        # strict off) — round 3 taught the kernels this estimator
        # (VERDICT r2 task 4); its better conditioning makes the
        # Mosaic-vs-XLA verdicts far less razor-edge.
        gc = mode == "complementarity"
        M = max(8, N // 3)
        primal, dual = build(N, M, args.b, seed=N)
        cfg = SolverConfig(max_iters=args.max_iters, check_every=16,
                           strict_weak_duality=not gc,
                           gap_from_complementarity=gc)
        cfg_k = SolverConfig(max_iters=args.max_iters, check_every=16,
                             strict_weak_duality=not gc,
                             gap_from_complementarity=gc,
                             use_pallas=True)

        def timed(fn):
            r = jax.block_until_ready(fn())
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn())
            return time.perf_counter() - t0, r

        t_x, rx = timed(lambda: solve_batched(primal, dual, cfg=cfg))
        # whole-solve kernel (one launch) and the update-kernel-inside-
        # while-loop path (fused_pqp_iterations or tiled past fits_vmem)
        t_f, rf = timed(lambda: solve_fused(primal, dual, cfg=cfg))
        t_k, rk = timed(lambda: solve_batched(primal, dual, cfg=cfg_k))

        ix, if_, ik = (np.asarray(r.iters) for r in (rx, rf, rk))
        cx, cf, ck = (np.asarray(r.converged) for r in (rx, rf, rk))
        both_f = cx & cf
        both_k = cx & ck
        du_f = float(np.max(np.abs(np.asarray(rf.U) - np.asarray(rx.U))
                            [:, both_f], initial=0.0))
        du_k = float(np.max(np.abs(np.asarray(rk.U) - np.asarray(rx.U))
                            [:, both_k], initial=0.0))
        cadence = cfg.check_every
        row = {
            "bench": "pallas_xla_conformance", "device": dev,
            "N": N, "M": M, "B": args.b, "mode": mode,
            "xla_converged": int(cx.sum()),
            "fused_converged": int(cf.sum()),
            "update_kernel_converged": int(ck.sum()),
            "iters_match_fused": float((if_ == ix).mean()),
            "iters_within_cadence_fused":
                float((np.abs(if_.astype(np.int64) - ix) <= cadence).mean()),
            "iters_match_update_kernel": float((ik == ix).mean()),
            "max_dU_fused": du_f, "max_dU_update_kernel": du_k,
            "xla_s": round(t_x, 4), "fused_s": round(t_f, 4),
            "update_kernel_s": round(t_k, 4),
            "fused_speedup_vs_xla": round(t_x / t_f, 2),
        }
        ok = (row["iters_match_update_kernel"] >= PARITY_ITERS_EXACT_FRAC
              and du_f <= PARITY_U_ATOL and du_k <= PARITY_U_ATOL
              and abs(int(cf.sum()) - int(cx.sum()))
                  <= PARITY_CONV_GAP_FRAC * args.b)
        row["parity_ok"] = ok
        ok_all = ok_all and ok
        print(json.dumps(row), flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
