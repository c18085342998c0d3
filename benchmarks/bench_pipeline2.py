"""Two-batch software-pipelining experiment on the headline driver
(round-5 item: VERDICT.md #6).

Hypothesis under test: at the headline config the certified roofline
attributes ~40 % of iteration time to gather/scatter-engine phases
(BASELINE.md per-phase table). If two half-batches run inside ONE while
loop, each body contains two independent dataflow chains — half A's
engine-bound phases and half B's MXU q product — and the TPU scheduler
could interleave them, hiding engine latency behind MXU work the way a
software pipeline would.

Method: the slot-space stepper (solvers/homotopy_batch.make_stepper) is
instantiated twice at b/2 and stepped in one merged lax.while_loop
(frozen halves pass through unchanged); compared against the single
full-batch loop at the same capacity, same (one-pass DEFAULT) path
precision, no capacity ladder on either side (a single tier isolates
the scheduling question from tier-boundary effects). Timing is the
headline's sustained methodology: runs dispatched back-to-back, fenced
once by materializing the per-lane iteration counts.

Result rows land in benchmarks/results/pipeline2_v5e.jsonl; the
conclusion (positive or negative) is recorded in BASELINE.md.

Run: timeout 1700 python benchmarks/bench_pipeline2.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from jax import lax

    from sparse_solvers_tpu.ops import blas
    from sparse_solvers_tpu.solvers.homotopy_batch import make_stepper

    if args.small:
        M, N, K, BATCH, KMAX = 256, 512, 8, 16, 12
    else:
        M, N, K, BATCH, KMAX = 4096, 8192, 64, 256, 96
    TOL, MAX_ITER = 1e-2, 2 * K

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_problem
    A, Y = make_problem(M, N, K, BATCH)
    A = jnp.asarray(A)
    Y = jnp.asarray(Y)
    G = jax.jit(lambda a: blas.xgemm(a, a, trans_a=True))(A)
    bidx_h = jnp.arange(BATCH // 2)

    def run_full(A, G, Y, tol):
        with blas.precision_scope("default"):
            init, body, live = make_stepper(A, G, Y, tol, MAX_ITER, KMAX)
            s = lax.while_loop(lambda s: jnp.any(live(s)), body, init)
        X = jnp.zeros((Y.shape[0], N), A.dtype).at[
            jnp.arange(Y.shape[0])[:, None], s.indices].set(
                s.x_act, mode="drop")
        return X, s.it

    def run_split2(A, G, Y, tol):
        Y0, Y1 = Y[: BATCH // 2], Y[BATCH // 2:]
        with blas.precision_scope("default"):
            init0, body0, live0 = make_stepper(A, G, Y0, tol, MAX_ITER,
                                               KMAX)
            init1, body1, live1 = make_stepper(A, G, Y1, tol, MAX_ITER,
                                               KMAX)

            def cond(c):
                return jnp.any(live0(c[0])) | jnp.any(live1(c[1]))

            def body(c):
                # two independent dataflow chains per body — the
                # scheduling offer the experiment measures
                return (body0(c[0]), body1(c[1]))

            s0, s1 = lax.while_loop(cond, body, (init0, init1))
        scat = lambda s, b: jnp.zeros((b, N), A.dtype).at[
            bidx_h[:b, None], s.indices].set(s.x_act, mode="drop")
        X = jnp.concatenate([scat(s0, BATCH // 2), scat(s1, BATCH // 2)])
        return X, jnp.concatenate([s0.it, s1.it])

    results = {}
    for name, fn in (("full", run_full), ("split2", run_split2)):
        jf = jax.jit(fn)
        t0 = time.time()
        X, it = jf(A, G, Y, TOL)
        np.asarray(it)
        print(f"# {name}: warmup {time.time()-t0:.1f}s  mean iters "
              f"{float(np.mean(np.asarray(it))):.1f}", file=sys.stderr)
        # sustained: back-to-back dispatches, one fence (bench.py
        # methodology — block_until_ready can return early through the
        # tunnel, so fence by materializing the tiny iteration counts)
        t0 = time.time()
        outs = [jf(A, G, Y, TOL) for _ in range(args.runs)]
        for _, it in outs:
            np.asarray(it)
        dt = (time.time() - t0) / args.runs
        sps = BATCH / dt
        results[name] = sps
        print(json.dumps({
            "bench": "pipeline2", "variant": name, "m": M, "n": N,
            "k": K, "batch": BATCH, "k_max": KMAX, "tol": TOL,
            "path_precision": "default", "ladder": False,
            "ms_per_batch": round(dt * 1e3, 2),
            "solves_per_sec": round(sps, 1),
            "device": jax.devices()[0].device_kind,
        }), flush=True)
    ratio = results.get("split2", 0) / max(results.get("full", 1), 1e-9)
    print(json.dumps({"bench": "pipeline2", "variant": "ratio_split2_vs_full",
                      "value": round(ratio, 4)}), flush=True)


if __name__ == "__main__":
    main()
