"""Greedy pursuit example — OMP against homotopy on the same ensemble.

Orthogonal Matching Pursuit (solvers/omp.py, beyond the reference's
homotopy/IRLS pair) recovers a k-sparse signal in exactly k column
picks when the dictionary is incoherent enough — each pick adds the
column most correlated with the residual and re-solves least squares
on the grown support through the online Gram inverse. This example
solves the same batch with ``ss.Omp`` and ``ss.Homotopy`` and compares
picks/iterations, residuals, and wall time; engine routing ("auto")
sends small problems to the C++ host backend on both.

Run: python examples/greedy_pursuit.py [m] [n] [k] [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__ if "__file__" in globals() else "."))))

if os.environ.get("SS_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import sparse_solvers_tpu as ss


def main():
    argv = [int(a) for a in sys.argv[1:]]
    m, n, k, batch = (argv + [256, 1024, 12, 32][len(argv):])[:4]

    rng = np.random.RandomState(0)
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)          # unit-norm columns

    Xtrue = np.zeros((batch, n), np.float32)
    for b in range(batch):
        sup = rng.choice(n, k, replace=False)
        Xtrue[b, sup] = rng.uniform(0.5, 1.5, k)
    Y = (Xtrue @ A.T).astype(np.float32)

    results = {}
    # tol 1e-2: the OMP batch driver's in-loop stop squares the
    # residual, so an f32 tolerance must sit above the rss rounding
    # floor ~sqrt(eps)·‖y‖ (solvers/omp.py) for the exactly-k-picks
    # contract below — tighter tolerances may add one stall pick
    for name, solver in [("omp", ss.Omp(A)), ("homotopy", ss.Homotopy(A))]:
        print(f"{name} plan:", solver.explain(batch=batch))
        t0 = time.perf_counter()
        X, rep = solver.solve_batch(Y, tolerance=1e-2, max_iterations=100)
        iters = np.asarray(rep.iter)        # fences the device work
        dt = time.perf_counter() - t0
        X = np.asarray(X)
        exact = sum(
            set(np.argsort(-np.abs(X[b]))[:k]) ==
            set(np.nonzero(Xtrue[b])[0]) for b in range(batch))
        results[name] = (exact, iters.mean(), dt)
        print(f"  {name}: support {exact}/{batch}, "
              f"mean iters {iters.mean():.1f}, {dt * 1e3:.1f} ms "
              f"(incl. first-call compile)")

    # OMP's contract on a clean incoherent ensemble: k picks per lane
    exact_omp, mean_iters_omp, _ = results["omp"]
    assert exact_omp == batch, "OMP failed to recover a support"
    assert mean_iters_omp == k, (mean_iters_omp, k)
    assert results["homotopy"][0] == batch

    # generalized OMP (round 5): 4 picks per round -> ~k/4 correlation
    # passes, same recovered support (the extra coefficients near the
    # tolerance are ~0)
    X4, rep4 = ss.Omp(A, engine="jax", picks=4).solve_batch(
        Y, tolerance=1e-2, max_iterations=2 * k)
    X4 = np.asarray(X4)
    exact4 = sum(
        set(np.argsort(-np.abs(X4[b]))[:k]) ==
        set(np.nonzero(Xtrue[b])[0]) for b in range(batch))
    rounds = np.ceil(np.asarray(rep4.iter) / 4).mean()
    print(f"  gomp(picks=4): support {exact4}/{batch}, "
          f"mean rounds {rounds:.1f} (vs {k} single-pick passes)")
    assert exact4 == batch


if __name__ == "__main__":
    main()
