"""Pallas fused-correlation kernels vs their XLA two-gemm references.

On the CPU test backend the kernels run in interpreter mode (the conftest
pins JAX_PLATFORMS=cpu); on TPU the same code paths compile natively.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_solvers_tpu.ops.pallas import kernels as K

_INTERPRET = jax.default_backend() != "tpu"


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("m,n,b", [(64, 128, 4), (72, 256, 5), (128, 128, 8)])
def test_normal_matvec_fused(m, n, b):
    A, D = _rand((m, n), 0), _rand((b, n), 1)
    q = K.normal_matvec_fused(A, D, interpret=_INTERPRET)
    ref = np.asarray(D) @ np.asarray(A).T @ np.asarray(A)
    np.testing.assert_allclose(np.asarray(q), ref,
                               atol=2e-4 * np.max(np.abs(ref)))


@pytest.mark.parametrize("m,n,b", [(64, 128, 4), (72, 256, 3)])
def test_residual_correlation_fused(m, n, b):
    A, X, Y = _rand((m, n), 0), _rand((b, n), 1), _rand((b, m), 2)
    c = K.residual_correlation_fused(A, X, Y, interpret=_INTERPRET)
    ref = (np.asarray(Y) - np.asarray(X) @ np.asarray(A).T) @ np.asarray(A)
    np.testing.assert_allclose(np.asarray(c), ref,
                               atol=2e-4 * np.max(np.abs(ref)))


def test_fallback_on_ineligible_shapes():
    # n not a lane multiple -> must fall back to XLA and still be correct
    A, D = _rand((16, 100), 0), _rand((2, 100), 1)
    q = K.normal_matvec_fused(A, D, interpret=_INTERPRET)
    ref = np.asarray(D) @ np.asarray(A).T @ np.asarray(A)
    np.testing.assert_allclose(np.asarray(q), ref,
                               atol=2e-4 * np.max(np.abs(ref)))
