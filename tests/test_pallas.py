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


def test_fused_bf16_q_matches_default_precision_roundings():
    """normal_matvec_fused_bf16 must reproduce the DEFAULT-MXU-precision
    two-gemm schedule's roundings: operands quantized to bf16, the
    intermediate p = D Aᵀ rounded to bf16 before the second product,
    f32 accumulation."""
    import ml_dtypes

    rng = np.random.RandomState(0)
    m, n, b = 96, 256, 8
    A = rng.randn(m, n).astype(np.float32)
    D = rng.randn(b, n).astype(np.float32)

    A16 = A.astype(ml_dtypes.bfloat16).astype(np.float32)
    D16 = D.astype(ml_dtypes.bfloat16).astype(np.float32)
    p16 = (D16 @ A16.T).astype(ml_dtypes.bfloat16).astype(np.float32)
    q_ref = p16 @ A16

    q = np.asarray(K.normal_matvec_fused_bf16(
        jnp.asarray(A, jnp.bfloat16), jnp.asarray(D), interpret=True))
    np.testing.assert_allclose(q, q_ref, rtol=1e-5, atol=1e-4)


def test_driver_fused_q_recovers():
    """The batch driver with the fused bf16 q-product (one-pass-regime
    path) still recovers k-sparse signals within tolerance — on CPU this
    genuinely quantizes to bf16 (unlike the plain path, where CPU XLA
    ignores the DEFAULT-precision hint), so recovery is the contract,
    not bit parity."""
    from functools import partial
    from sparse_solvers_tpu.ops import blas
    from sparse_solvers_tpu.solvers import homotopy_batch as HB

    rng = np.random.RandomState(0)
    m, n, k, B = 256, 512, 8, 8
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X = np.zeros((B, n), np.float32)
    for i in range(B):
        X[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (X @ A.T).astype(np.float32)
    G = np.asarray(A.T @ A, np.float32)

    f = jax.jit(partial(HB.solve_homotopy_batch, max_iterations=24,
                        k_max=25, use_kernel=False, fused_q=True))
    with blas.precision_scope("default"):
        Xb, Rb = f(jnp.asarray(A), jnp.asarray(G), jnp.asarray(Y), 1e-2)
    Xb = np.asarray(Xb)
    assert np.isfinite(Xb).all()
    # support recovery + certified-style residual check in f32
    c = (Y - Xb @ A.T) @ A
    conv = np.asarray(Rb.iter) < 24
    assert conv.all()
    assert (np.max(np.abs(c), axis=1)[conv] <= 1e-2).all()
    for i in range(B):
        assert set(np.flatnonzero(Xb[i] > 0.1)) == set(np.flatnonzero(X[i]))
