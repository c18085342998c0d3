"""Cross-validation of the jitted solvers against the independent NumPy
oracles (sparse_solvers_tpu/oracle/) — the analog of the reference's
oracle cross-check workflow (reference: bindings/python/reference/main.py).
Run in float64 where both sides should agree to near machine precision,
including iteration counts.
"""

import numpy as np
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.oracle import homotopy as oracle_homotopy
from sparse_solvers_tpu.oracle import irls as oracle_irls


def _problem(rng, m, n, k):
    A = rng.randn(m, n)
    A = A / np.abs(A).sum(axis=0)
    x_true = np.zeros(n)
    support = rng.choice(n, k, replace=False)
    x_true[support] = rng.uniform(0.2, 1.0, k)
    x_true /= x_true.sum()
    y = A @ x_true
    return A, y, x_true


@pytest.mark.parametrize("shape,k", [((40, 25), 3), ((60, 30), 5),
                                     ((30, 60), 4)])
def test_homotopy_matches_oracle(shape, k):
    rng = np.random.RandomState(7)
    m, n = shape
    A, y, _ = _problem(rng, m, n, k)

    xo, it_o, err_o = oracle_homotopy.solve(A, y, 0.01, 100)
    xj, report = ss.Homotopy(A).solve(y, tolerance=0.01, max_iterations=100)

    assert report.iter == it_o
    np.testing.assert_allclose(xj, xo, atol=1e-10)
    np.testing.assert_allclose(report.solution_error, err_o, atol=1e-10)


@pytest.mark.parametrize("shape,k", [((40, 25), 3), ((60, 30), 5)])
def test_irls_matches_oracle(shape, k):
    rng = np.random.RandomState(11)
    m, n = shape
    A, y, _ = _problem(rng, m, n, k)

    xo, it_o, eps_o, spd_o = oracle_irls.solve(A, y, 0.001, 100)
    xj, report = ss.Irls(A).solve(y, tolerance=0.001, max_iterations=100)

    assert report.iter == it_o
    assert report.spd_failure == spd_o
    np.testing.assert_allclose(report.solution_error, eps_o, atol=1e-9)
    # x tolerance follows the reference test regime (1e-4 absolute): the
    # weighted normal equations near an spd_failure amplify benign
    # Cholesky-implementation differences between XLA and LAPACK.
    np.testing.assert_allclose(xj, xo, atol=1e-4)


def test_homotopy_toy_readme():
    """The README toy problem shape (reference: README.md:14-33): 10×10
    gaussian + identity, 1-sparse signal, tol=0.1 → argmax 2, sparsity 0.9."""
    rng = np.random.RandomState(42)
    N = 10
    A = rng.normal(loc=0.025, scale=0.025, size=(N, N)) + np.identity(N)
    signal = np.zeros(N)
    signal[2] = 1

    x, info = ss.Homotopy(A.astype(np.float32)).solve(
        signal.astype(np.float32), tolerance=0.1)
    assert np.argmax(x) == 2
    assert 1 - np.count_nonzero(x) / N == pytest.approx(0.9)
    assert info.solution_error <= 0.1


def test_f64_iteration_and_error_parity_sweep():
    """In float64, both modes must reproduce the oracle's iteration count
    and solution_error to ~1e-9 relative across random problems — the
    strongest algorithm-parity check (measured 40/40 over 20 seeds; a
    smaller sweep runs in CI)."""
    import sparse_solvers_tpu as ss
    from sparse_solvers_tpu.oracle import homotopy as oh

    for seed in range(8):
        rng = np.random.RandomState(seed)
        m, n = rng.randint(20, 60), rng.randint(20, 80)
        k = rng.randint(1, 6)
        A = rng.randn(m, n)
        A /= np.linalg.norm(A, axis=0)
        xt = np.zeros(n)
        xt[rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
        y = A @ xt
        xo, ito, erro = oh.solve(A, y, 0.01, 100)
        for mode in ("exact", "fast"):
            x, rep = ss.Homotopy(A.astype(np.float64), engine="jax",
                                 mode=mode).solve(y, tolerance=0.01,
                                                  max_iterations=100)
            assert rep.iter == ito, (seed, mode)
            np.testing.assert_allclose(rep.solution_error, erro,
                                       rtol=1e-9, atol=1e-12)


def test_irls_cg_matches_oracle():
    """CG-IRLS vs the dense-inner-solve NumPy oracle: in float64 with a
    tight inner-CG target the trajectories coincide (same ε schedule,
    same termination) up to the CG residual — final x to ~1e-6 and the
    iteration count within one step of the oracle's."""
    from sparse_solvers_tpu.oracle import irls_cg as oracle_irls_cg

    for seed in range(4):
        rng = np.random.RandomState(100 + seed)
        m, n, k = 32, 128, 4
        A = rng.randn(m, n)
        A /= np.linalg.norm(A, axis=0)
        xt = np.zeros(n)
        xt[rng.choice(n, k, replace=False)] = (
            rng.choice([-1.0, 1.0], k) * rng.uniform(0.5, 1.5, k))
        y = A @ xt

        xo, ito, epso, broke_o = oracle_irls_cg.solve(A, y, 1e-8, 60)
        assert not broke_o
        xj, rep = ss.IrlsCg(A, cg_tolerance=1e-12, engine="jax").solve(
            y, tolerance=1e-8, max_iterations=60)
        assert not rep.spd_failure
        assert abs(int(rep.iter) - ito) <= 1, (seed, rep.iter, ito)
        np.testing.assert_allclose(xj, xo, atol=1e-6)
        # on exactly-k-sparse recoveries the final ε is r_{K+1}(x)/n of
        # the solution's *zero tail* — numerical dust whose magnitude is
        # set by the inner solver's residual, not by the algorithm — so
        # ε parity is absolute-scale only
        np.testing.assert_allclose(rep.solution_error, epso, atol=1e-8)
