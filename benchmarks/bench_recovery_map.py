"""Recovery phase map — support-recovery rate over the (δ, ρ) plane.

Classic compressed-sensing evidence (Donoho–Tanner phase transition):
for gaussian ensembles, exact ℓ₁ recovery succeeds with high probability
below a sharp curve in the undersampling/sparsity plane
(δ = m/n, ρ = k/m). Both ℓ₁ solvers here — Homotopy (the reference's
algorithm) and CG-IRLS (beyond reference, the m ≤ n regime) — must trace
that curve: high recovery rates at low ρ decaying toward the transition.
OMP (greedy, beyond reference) is mapped too; its transition sits below
the ℓ₁ curve (Tropp–Gilbert 2007), so its success region should be a
strict subset — a cross-algorithm sanity check, not a parity target.
This harness records the measured rate per grid cell per solver, plus
an `exhausted` count — trials where the solver hit its iteration budget
without meeting the tolerance (unconverged, distinct from a genuine
recovery failure past the transition). It validates *algorithmic*
correctness across the problem plane rather than speed (problems are
sized so `engine="auto"` routes to the native host backend — no
accelerator needed).

Run:   python benchmarks/bench_recovery_map.py [--quick] [--n N] [--trials T]
Output: one JSON line per (solver, δ, ρ) cell.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _seed(solver_kind, m, k):
    # deterministic across interpreter runs (Python's hash() is salted
    # per process, which would make the recorded map unreproducible)
    return zlib.crc32(f"{solver_kind}:{m}:{k}".encode()) % 2**31


def _trial(rng, m, n, k, solver_kind, ss):  # noqa: C901
    """Returns (recovered, exhausted): exhausted marks a solve that hit
    the iteration budget without meeting the tolerance — an unconverged
    trial, not an algorithmic recovery failure."""
    A = rng.randn(m, n).astype(np.float64)
    A /= np.linalg.norm(A, axis=0)
    x_true = np.zeros(n)
    sup = rng.choice(n, k, replace=False)
    x_true[sup] = rng.choice([-1.0, 1.0], k) * rng.uniform(0.5, 1.5, k)
    y = A @ x_true
    tol = 1e-7
    if solver_kind == "homotopy":
        max_iter = 3 * m
        x, rep = ss.Homotopy(A).solve(y, tolerance=tol,
                                      max_iterations=max_iter)
    elif solver_kind == "omp":
        # greedy pursuit: its transition sits below l1's (Tropp-Gilbert
        # 2007) — the map should show a narrower success region, not
        # match the l1 curves
        max_iter = m
        x, rep = ss.Omp(A).solve(y, tolerance=tol,
                                 max_iterations=max_iter)
    elif solver_kind == "gomp4":
        # generalized OMP, 4 picks/round (round 5): between OMP and l1
        # empirically (Wang-Kwon-Shim 2012)
        max_iter = m
        x, rep = ss.Omp(A, picks=4).solve(y, tolerance=tol,
                                          max_iterations=max_iter)
    elif solver_kind == "cosamp":
        # support-replacing greedy (round 5): RIP-backed recovery,
        # requires the true k as input
        max_iter = 40
        x, rep = ss.Cosamp(A, int(k)).solve(y, tolerance=tol,
                                            max_iterations=max_iter)
    else:
        max_iter = 60
        x, rep = ss.IrlsCg(A).solve(y, tolerance=tol,
                                    max_iterations=max_iter)
    exhausted = rep.iter >= max_iter and not (rep.solution_error <= tol)
    top = set(np.argsort(-np.abs(np.asarray(x)))[:k])
    return top == set(sup), exhausted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--trials", type=int, default=20)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")  # native-routed anyway
    jax.config.update("jax_enable_x64", True)  # run the ensembles in f64
    import sparse_solvers_tpu as ss

    n = 128 if args.quick else args.n
    trials = 5 if args.quick else args.trials
    deltas = [0.25, 0.5] if args.quick else [0.125, 0.25, 0.375, 0.5, 0.75]
    rhos = [0.1, 0.3] if args.quick else [0.1, 0.2, 0.3, 0.4, 0.5]

    for solver_kind in ("homotopy", "irls_cg", "omp", "gomp4",
                        "cosamp"):
        for d in deltas:
            m = max(4, int(round(d * n)))
            for r in rhos:
                k = max(1, int(round(r * m)))
                rng = np.random.RandomState(_seed(solver_kind, m, k))
                outcomes = [_trial(rng, m, n, k, solver_kind, ss)
                            for _ in range(trials)]
                ok = sum(rec for rec, _ in outcomes)
                exhausted = sum(ex for _, ex in outcomes)
                emit(metric="recovery_map", solver=solver_kind, n=n, m=m,
                     k=k, delta=round(d, 4), rho=round(r, 4),
                     trials=trials, recovery_rate=round(ok / trials, 4),
                     exhausted=exhausted)


if __name__ == "__main__":
    main()
