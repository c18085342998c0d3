"""Homotopy shape sweep — replicates the reference's benchmark harness.

Reference: src/solvers/homotopy_bench.cpp:14-60 — noisy-pattern recovery
over M ∈ {16, 64, 256, 512} × N ∈ {16, 64, 256, 1024, 2048}, tolerance 0.1,
float32, reporting ms/solve and a mean-iterations counter. (The reference
publishes no numbers; BASELINE.md.)

This sweep times three engines per shape:
  * native     — the C++ host backend, single solve (the reference's regime)
  * jax        — jitted single solve on the default device
  * jax-batch  — 64-lane batched solve, per-solve amortized (the TPU regime)

One JSON line per (engine, shape):
  {"bench": "homotopy_sweep", "engine": ..., "m": ..., "n": ...,
   "ms_per_solve": ..., "mean_iterations": ...}

Run: python benchmarks/bench_homotopy_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def make_problem(m, n, seed=0):
    """Noisy-pattern needle-in-haystack, the reference bench workload
    (homotopy_bench.cpp uses the noisy_patterns fixture of test_util.h:
    gaussian haystack, patterned needle in one column, L1-normalized)."""
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n).astype(np.float32)
    needle = n // 2
    pattern = (np.arange(m) % 5 + 1).astype(np.float32)
    A[:, needle] = pattern + rng.uniform(0, 0.1, m)
    A /= np.abs(A).sum(axis=0)  # column L1 normalization (ss::norm_l1)
    signal = pattern / np.abs(pattern).sum()
    return A, signal.astype(np.float32), needle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small subset of shapes")
    ap.add_argument("--engines", default="native,jax,jax-batch")
    args = ap.parse_args()

    import jax
    import sparse_solvers_tpu as ss
    from sparse_solvers_tpu.backend import native

    Ms = [16, 64, 256] if args.quick else [16, 64, 256, 512]
    Ns = [64, 256] if args.quick else [16, 64, 256, 1024, 2048]
    engines = args.engines.split(",")
    TOL, MAX_ITER, BATCH = 0.1, 100, 64

    for m in Ms:
        for n in Ns:
            A, y, needle = make_problem(m, n, seed=m * 7 + n)
            if "native" in engines and native.available():
                reps = max(3, int(2e6 / (m * n)))
                xs, it, _ = native.homotopy_solve(A, y, TOL, MAX_ITER, n)
                t0 = time.time()
                for _ in range(reps):
                    native.homotopy_solve(A, y, TOL, MAX_ITER, n)
                dt = (time.time() - t0) / reps
                print(json.dumps({
                    "bench": "homotopy_sweep", "engine": "native",
                    "m": m, "n": n, "ms_per_solve": round(dt * 1e3, 4),
                    "mean_iterations": it}), flush=True)
            if "jax" in engines:
                solver = ss.Homotopy(A, engine="jax")
                x, rep = solver.solve(y, TOL, MAX_ITER)  # compile
                reps = 10
                t0 = time.time()
                for _ in range(reps):
                    x, rep = solver.solve(y, TOL, MAX_ITER)
                dt = (time.time() - t0) / reps
                print(json.dumps({
                    "bench": "homotopy_sweep", "engine": "jax",
                    "m": m, "n": n, "ms_per_solve": round(dt * 1e3, 4),
                    "mean_iterations": rep.iter}), flush=True)
            if "jax-batch" in engines:
                solver = ss.Homotopy(A, engine="jax")
                Y = np.stack([y] * BATCH)
                X, reps_ = solver.solve_batch(Y, TOL, MAX_ITER)
                jax.block_until_ready(X)
                t0 = time.time()
                X, reps_ = solver.solve_batch(Y, TOL, MAX_ITER)
                jax.block_until_ready(X)
                dt = (time.time() - t0) / BATCH
                print(json.dumps({
                    "bench": "homotopy_sweep", "engine": "jax-batch",
                    "m": m, "n": n, "ms_per_solve": round(dt * 1e3, 4),
                    "mean_iterations":
                        float(np.mean(np.asarray(reps_.iter)))}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
