"""Factorization benchmarks — replicates the reference's linalg harnesses.

Reference: src/linalg/qr_decomposition_bench.cpp:13-55 (Householder QR and
prefactored least-squares solve, square M ∈ {32 … 2048} ×2 steps) and
src/linalg/cholesky_decomposition_bench.cpp:13-31 (Cholesky of SPD
noise·noiseᵀ, same sizes), float32.

Engines: the default JAX device (XLA's blocked factorizations — the fast
path the solvers use) and the framework's explicit Householder component
(linalg/qr.py) at small sizes.

One JSON line per (bench, m): {"bench": ..., "m": ..., "ms": ...}

Run: python benchmarks/bench_linalg.py [--quick]
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


def _time(fn, reps=5):
    import jax
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sparse_solvers_tpu.linalg import qr as ssqr
    from sparse_solvers_tpu.linalg import cholesky as sschol

    sizes = [32, 128, 512] if args.quick else [32, 64, 128, 256, 512, 1024,
                                               2048]

    qr_fn = jax.jit(lambda a: jnp.linalg.qr(a, mode="reduced"))
    chol_fn = jax.jit(sschol.cholesky_spd)
    ls_fn = jax.jit(lambda q, r, b: jax.scipy.linalg.solve_triangular(
        r, q.T @ b, lower=False))

    for m in sizes:
        rng = np.random.RandomState(m)
        A = jnp.asarray(rng.randn(m, m).astype(np.float32))
        b = jnp.asarray(rng.randn(m).astype(np.float32))
        noise = rng.randn(m, m).astype(np.float32)
        spd = jnp.asarray(noise @ noise.T + m * np.eye(m, dtype=np.float32))

        print(json.dumps({"bench": "qr_decomposition", "m": m,
                          "ms": round(_time(lambda: qr_fn(A)), 4)}),
              flush=True)
        Q, R = qr_fn(A)
        print(json.dumps({"bench": "qr_solve", "m": m,
                          "ms": round(_time(lambda: ls_fn(Q, R, b)), 4)}),
              flush=True)
        print(json.dumps({"bench": "cholesky_decomposition", "m": m,
                          "ms": round(_time(lambda: chol_fn(spd)[0]), 4)}),
              flush=True)
        if m <= 256:  # explicit Householder component (parity path)
            hh = jax.jit(ssqr.householder_factor)
            print(json.dumps({"bench": "qr_householder_explicit", "m": m,
                              "ms": round(_time(lambda: hh(A)[0]), 4)}),
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
