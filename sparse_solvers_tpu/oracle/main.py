"""Oracle demo — a fixed 5×5 problem run through both NumPy oracles and
both production engines, with printed traces.

Role analog of the reference's oracle demo
(reference: bindings/python/reference/main.py:19-45), extended to
cross-check the JAX and native engines against the oracles on the spot.

Run: python -m sparse_solvers_tpu.oracle.main
"""

from __future__ import annotations

import os

import numpy as np

if os.environ.get("SS_EXAMPLE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    np.random.seed(101)
    N = 5
    A = (np.random.randn(N, N) + np.eye(N)).astype(np.float32)
    x_true = np.zeros(N, np.float32)
    x_true[2] = 1.0
    y = A @ x_true
    tol = 0.1

    from . import homotopy as oracle_homotopy
    from . import irls as oracle_irls

    xh, ith, errh = oracle_homotopy.solve(A, y, tol)
    print(f"[oracle homotopy]  x={np.round(xh, 4)}  iter={ith} "
          f"err={errh:.6f} argmax={np.argmax(xh)}")

    xi, iti, epsi, spd = oracle_irls.solve(A, y, 1e-3)
    print(f"[oracle irls]      x={np.round(xi, 4)}  iter={iti} "
          f"eps={epsi:.2e} spd_failure={spd} argmax={np.argmax(xi)}")

    import sparse_solvers_tpu as ss

    xj, rep = ss.Homotopy(A, engine="jax").solve(y, tolerance=tol)
    print(f"[jax homotopy]     x={np.round(xj, 4)}  {rep} "
          f"argmax={np.argmax(xj)}")

    from ..backend import native
    if native.available():
        xn, itn, errn = native.homotopy_solve(A, y, tol, 100, N)
        print(f"[native homotopy]  x={np.round(xn, 4)}  iter={itn} "
              f"err={errn:.6f} argmax={np.argmax(xn)}")

    # underdetermined leg (beyond reference): a 4×8 basis-pursuit toy
    # through the CG-IRLS oracle and the jitted solver
    from . import irls_cg as oracle_irls_cg
    Aw = np.random.randn(4, 8).astype(np.float32)
    Aw /= np.linalg.norm(Aw, axis=0)
    xw = np.zeros(8, np.float32)
    xw[5] = 1.0
    yw = Aw @ xw
    xc, itc, epsc, brokec = oracle_irls_cg.solve(Aw, yw, 1e-6, 50)
    print(f"[oracle irls_cg]   x={np.round(xc, 4)}  iter={itc} "
          f"eps={epsc:.2e} argmax={np.argmax(np.abs(xc))}")
    # engine pinned like the homotopy leg: "auto" would route this tiny
    # problem to the native engine and the cross-check would stop
    # exercising the jitted solver
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # small-problem advisory
        xcj, repc = ss.IrlsCg(Aw, engine="jax").solve(
            yw, tolerance=1e-6, max_iterations=50)
    print(f"[jax irls_cg]      x={np.round(xcj, 4)}  {repc} "
          f"argmax={np.argmax(np.abs(xcj))}")

    assert np.argmax(xh) == np.argmax(xj) == 2
    assert np.argmax(np.abs(xc)) == np.argmax(np.abs(xcj)) == 5


if __name__ == "__main__":
    main()
