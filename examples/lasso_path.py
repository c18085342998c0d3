"""LASSO regularization-path example — Homotopy.solve_path.

The homotopy solver follows min ½‖y−Ax‖² + λ‖x‖₁ as λ decreases from
‖Aᵀy‖∞; `solve_path` returns every breakpoint it visits (beyond the
reference, which returns only the endpoint). The path is the classic
model-selection object: supports enter (and occasionally leave) one
index at a time, and each iterate satisfies its own KKT identity
‖Aᵀ(y−Ax_t)‖∞ = λ_t, which this demo verifies.

Run: python examples/lasso_path.py [m n k]   (SS_EXAMPLE_CPU=1 for CPU)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__ if "__file__" in globals() else "."))))

if os.environ.get("SS_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import sparse_solvers_tpu as ss


def main():
    args = [int(a) for a in sys.argv[1:4]]
    defaults = [128, 256, 6]
    m, n, k = args + defaults[len(args):]
    rng = np.random.RandomState(0)
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    x_true = np.zeros(n, np.float32)
    sup = np.sort(rng.choice(n, k, replace=False))
    x_true[sup] = rng.uniform(0.4, 1.0, k)
    y = A @ x_true

    solver = ss.Homotopy(A)  # solve_path runs the jax path engine-independently
    lambdas, Xs, rep = solver.solve_path(y, tolerance=1e-3,
                                         max_iterations=4 * k)

    print(f"{len(lambdas)} breakpoints, λ from {lambdas[0]:.4f} "
          f"to {lambdas[-1]:.6f}")
    kkt_err = max(
        abs(float(np.max(np.abs(A.T @ (y - A @ Xs[t])))) - lambdas[t])
        for t in range(len(lambdas)))
    print(f"max |KKT − λ| over the path: {kkt_err:.2e}")
    for t in range(len(lambdas)):
        live = [int(i) for i in np.flatnonzero(np.abs(Xs[t]) > 0)]
        print(f"  λ={lambdas[t]:.5f}  support={live}")
    print(f"true support: {[int(i) for i in sup]}  "
          f"(recovered: {set(np.flatnonzero(np.abs(Xs[-1]) > 1e-3)) == set(sup)})")


if __name__ == "__main__":
    main()
