"""NumPy oracle for the CG-IRLS basis-pursuit solver.

Independent implementation of the Daubechies–DeVore–Fornasier–Güntürk
IRLS iteration (solvers/irls_cg.py; arXiv:1509.04063) with the inner
weighted least-norm step solved *exactly* by a dense ``np.linalg.solve``
— so any error in the jitted solver's conjugate-gradient inner loop,
warm-start plumbing, or ε bookkeeping shows up against this trajectory.
The reference library has no analog (its IRLS rejects m < n,
irls_test.cpp:53); this oracle plays the role its NumPy oracles play for
the parity solvers.
"""

from __future__ import annotations

import numpy as np


def solve(A, y, tolerance, max_iterations=100, p=1.0, k_sparsity=None):
    """Returns (x, iterations, eps, broke). Mirrors solve_irls_cg_core's
    schedule: x⁰ = 0 (iterate 1 = least-norm solution), inverse weights
    D = (x² + ε²)^(1−p/2), ε ← min(ε, r_{K+1}(x)/n), termination on the
    relative sup-norm change of x (do-while)."""
    A = np.asarray(A, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m, n = A.shape
    assert m <= n, "CG-IRLS serves the underdetermined regime"
    K = k_sparsity if k_sparsity is not None else max(1, m // 4)

    x = np.zeros(n)
    eps = 1.0
    it = 0
    while it < max_iterations:
        D = (x * x + eps * eps) ** (1.0 - p / 2.0)
        B = (A * D) @ A.T
        try:
            z = np.linalg.solve(B, y)
        except np.linalg.LinAlgError:
            return x, it, eps, True
        xn = D * (A.T @ z)
        change = np.abs(xn - x).max() / max(np.abs(xn).max(),
                                            np.finfo(np.float64).tiny)
        r = np.sort(np.abs(xn))[::-1]
        eps = min(eps, r[min(K, n - 1)] / n)
        x = xn
        it += 1
        if change <= tolerance:
            break
    return x, it, eps, False
