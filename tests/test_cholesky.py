"""Cholesky tests — analog of reference
src/linalg/cholesky_decomposition_test.cpp: non-SPD detection (:16-25),
fixed 2×2 LLᵀ/solve (:27-53), and LLᵀ ≈ A on random SPD noise·noiseᵀ
matrices up to 100×100 (:56-96).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_solvers_tpu.linalg.cholesky import cholesky_spd, cholesky_solve


def test_isspd_false():
    A = jnp.array([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
    _, isspd = cholesky_spd(A)
    assert not bool(isspd)


def test_isspd_false_negative_definite():
    A = jnp.array([[-2.0, 0.0], [0.0, -2.0]], jnp.float32)
    _, isspd = cholesky_spd(A)
    assert not bool(isspd)


def test_2x2():
    A = np.array([[2.0, 1.0], [1.0, 2.0]], np.float32)
    b = np.array([1.0, -1.0], np.float32)
    L, isspd = cholesky_spd(jnp.asarray(A))
    assert bool(isspd)
    np.testing.assert_allclose(np.asarray(L) @ np.asarray(L).T, A, atol=1e-4)
    x = np.asarray(cholesky_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, [1.0, -1.0], atol=1e-4)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 1e-3), (np.float64, 1e-9)])
@pytest.mark.parametrize("n", [5, 20, 100])
def test_random_spd(dtype, tol, n):
    rng = np.random.RandomState(0)
    noise = rng.randn(n, n).astype(dtype)
    A = noise @ noise.T + n * np.eye(n, dtype=dtype)
    L, isspd = cholesky_spd(jnp.asarray(A))
    assert bool(isspd)
    np.testing.assert_allclose(np.asarray(L) @ np.asarray(L).T, A,
                               atol=tol * n)
    b = rng.randn(n).astype(dtype)
    x = np.asarray(cholesky_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=tol * n)
