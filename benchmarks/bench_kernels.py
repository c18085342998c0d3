"""Kernel-level roofline benchmark — SURVEY.md M2's "roofline-check each
hot kernel" deliverable.

Measures the hot compute ops against the chip's peak FLOP/s and HBM
bandwidth (utils/profiling.py): the fused single-pass correlation kernels
(Pallas) vs their two-gemm XLA forms, and the batched solve-loop products
at the headline shape. One JSON line per measurement with the roofline
fraction.

Run (real TPU): python benchmarks/bench_kernels.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from sparse_solvers_tpu.ops import blas
    from sparse_solvers_tpu.ops.pallas import kernels as K
    from sparse_solvers_tpu.utils import profiling

    m, n = (1024, 2048) if args.quick else (4096, 8192)
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(m, n).astype(np.float32))

    REPS = 30

    def looped(fn):
        """Amortize per-dispatch latency (ms-scale through device
        tunnels): run the op REPS times inside one jitted fori_loop,
        chaining a scalar so iterations cannot be elided."""
        def wrapped(A_, D_):
            def body(i, s):
                return s + jnp.sum(fn(A_, D_ + s * 0)) * 1e-30
            return lax.fori_loop(0, REPS, body, jnp.float32(0))
        return jax.jit(wrapped)

    for b in ((8,) if args.quick else (8, 64, 256)):
        D = jnp.asarray(rng.randn(b, n).astype(np.float32))
        flops = 4 * b * m * n
        bytes_ = m * n * 4 + 2 * b * n * 4

        with blas.precision_scope("high"):
            xla = looped(
                lambda A_, D_: blas.xgemm(blas.xgemm(D_, A_, trans_b=True),
                                          A_))
            _ = np.asarray(xla(A, D))
            r = profiling.measure(xla, A, D, flops=REPS * flops,
                                  bytes=REPS * (2 * m * n * 4
                                                + 2 * b * n * 4), reps=1)
            r.seconds /= REPS
            r.flops /= REPS
            r.bytes /= REPS
        print(json.dumps({
            "bench": "normal_matvec", "impl": "xla-2gemm", "m": m, "n": n,
            "b": b, "ms": round(r.seconds * 1e3, 3),
            "tflops": round(r.tflops, 2), "gbps": round(r.gbps, 1),
            "roofline_frac": round(r.fraction_of_peak() or 0, 3)}),
            flush=True)

        pall = looped(lambda A_, D_: K.normal_matvec_fused(A_, D_))
        _ = np.asarray(pall(A, D))
        r = profiling.measure(pall, A, D, flops=REPS * flops,
                              bytes=REPS * bytes_, reps=1)
        r.seconds /= REPS
        r.flops /= REPS
        r.bytes /= REPS
        print(json.dumps({
            "bench": "normal_matvec", "impl": "pallas-fused", "m": m,
            "n": n, "b": b, "ms": round(r.seconds * 1e3, 3),
            "tflops": round(r.tflops, 2), "gbps": round(r.gbps, 1),
            "roofline_frac": round(r.fraction_of_peak() or 0, 3)}),
            flush=True)


if __name__ == "__main__":
    sys.exit(main())
