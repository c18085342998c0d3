"""IRLS pattern-search example — construct-once / solve-many.

The IRLS solver (reference: src/solvers/irls-cpu.cpp) amortizes one
economy QR factorization of the sensing matrix across every solve — the
right tool when the same overdetermined dictionary (m ≥ n) serves a
stream of signals and per-solve latency matters more than an exact ℓ₁
path.

The workload mirrors the reference's own IRLS fixtures (needle-in-
haystack pattern identification, src/solvers/test_util.h:136-197): each
observed signal is one dictionary atom plus noise, and the solver must
name the atom. This is the regime IRLS-p0.9 with the reference's eps
schedule is built for — very sparse representations. For general
k-sparse recovery use Homotopy (see examples/batch_recovery.py): with
k ≳ 4 supports on gaussian ensembles the reweighting schedule drives
the weighted Gram singular and the solver degrades gracefully with
`report.spd_failure` (both engines and the reference's own f64 oracle
behave identically there — it is a property of the algorithm, not the
implementation).

Run: python examples/irls_recovery.py [m] [n] [batch]
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
    m, n, batch = (argv + [512, 256, 64][len(argv):])[:3]
    assert m >= n, "IRLS requires an overdetermined system (m >= n)"

    rng = np.random.RandomState(0)
    # gaussian dictionary, L1-normalized columns (the reference's
    # noisy-patterns preconditioning, test_util.h:150)
    A = ss.norm_l1(rng.randn(m, n).astype(np.float32))

    # each signal = one atom + gaussian noise at 25% of the atom scale
    # (L1-normalized columns have ~1/m-sized entries)
    atoms = rng.randint(0, n, size=batch)
    noise = 0.25 * float(np.std(A))
    Y = A.T[atoms] + noise * rng.randn(batch, m).astype(np.float32)

    t0 = time.time()
    solver = ss.Irls(A)                 # QR computed once, cached on device
    X, reports = solver.solve_batch(Y, tolerance=0.1, max_iterations=20)
    X = np.asarray(X)
    dt = time.time() - t0

    hit = np.mean(np.argmax(X, axis=1) == atoms)
    spd = int(np.asarray(reports.spd_failure).sum())
    print(f"{batch} IRLS solves of {m}x{n} in {dt*1e3:.1f} ms "
          f"(includes QR + compile)")
    print(f"mean iterations {np.asarray(reports.iter).mean():.1f}; "
          f"atom identified on {100*hit:.0f}% of signals; "
          f"spd failures {spd}/{batch}")

    # the cached QR and executable make subsequent batches cheap
    t0 = time.time()
    X2, _ = solver.solve_batch(Y, tolerance=0.1, max_iterations=20)
    np.asarray(X2)
    print(f"amortized second batch: {1e3*(time.time()-t0):.1f} ms")

    x1, rep = solver.solve(Y[0], tolerance=0.1, max_iterations=20)
    print(f"single solve: iter={rep.iter} "
          f"solution_error={rep.solution_error:.2e} "
          f"spd_failure={rep.spd_failure}")


if __name__ == "__main__":
    main()
