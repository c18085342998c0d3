"""Regressions for the round-1 code-review findings."""

import numpy as np
import jax.numpy as jnp
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.backend import native


def _overflow_problem():
    rng = np.random.RandomState(0)
    m, n = 30, 60
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    xt = np.zeros(n, np.float32)
    xt[rng.choice(n, 10, replace=False)] = 1.0
    return A, A @ xt


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_native_k_max_overflow_breaks_like_jax():
    A, y = _overflow_problem()
    x, it, err = native.homotopy_solve(A, y, 0.01, 50, 4)
    assert it <= 5           # breaks at capacity, not max_iterations
    assert np.isfinite(err)


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_native_irls_n1_no_oob():
    A = np.abs(np.random.RandomState(0).randn(8, 1)).astype(np.float32)
    h = native.IrlsNative(A)
    x, it, err, spd = h.solve((A[:, 0] * 2.0).astype(np.float32), 1e-3, 10)
    assert np.isfinite(x).all() and np.isfinite(err)


def test_device_int_array_promotes_like_numpy():
    # an int device array must get the same float32 promotion as a NumPy
    # int array instead of slipping through the device fast path
    I = jnp.eye(5, dtype=jnp.int32)
    s = ss.Homotopy(I, engine="jax")
    assert s.dtype == np.float32
    sig = np.zeros(5, np.float32)
    sig[1] = 1.0
    x, rep = s.solve(sig)
    np.testing.assert_array_equal(x, sig)


def test_native_exact_mode_rejected():
    with pytest.raises(ValueError):
        ss.Homotopy(np.eye(4, dtype=np.float32), mode="exact",
                    engine="native")


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_native_f64_batch_supported():
    # round 1 rejected f64 native batch; round 2 instantiates both dtypes
    # like the reference (homotopy-cpu.cpp:277-297)
    A = np.eye(6, dtype=np.float64)
    s = ss.Homotopy(A, engine="native")
    sig = np.zeros(6)
    sig[2] = 1.0
    X, reps = s.solve_batch(np.stack([sig, sig]), tolerance=0.1)
    assert X.dtype == np.float64
    np.testing.assert_array_equal(X[0], sig)
    assert list(reps.iter) == [1, 1]


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_native_f64_irls_supported():
    A = np.eye(6, dtype=np.float64)
    sig = np.zeros(6)
    sig[2] = 1.0
    x, rep = ss.Irls(A, engine="native").solve(sig, tolerance=0.1)
    assert x.dtype == np.float64
    np.testing.assert_array_equal(x, sig)
    assert rep.iter == 1 and not rep.spd_failure


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_irls_native_empty_batch():
    """A zero-length batch returns empty arrays on the native engine like
    the jax path (regression: np.stack([]) raised ValueError)."""
    A = np.eye(6, dtype=np.float32)
    X, reps = ss.Irls(A, engine="native").solve_batch(
        np.zeros((0, 6), np.float32), tolerance=0.1)
    assert X.shape == (0, 6)
    assert reps.iter.shape == (0,)
    assert reps.spd_failure.shape == (0,)


def test_batch_native_force_unaligned_n(monkeypatch):
    """SS_BATCH_NATIVE=1 must force the slot-space driver even when n is
    not lane-aligned (the scan kernel pads n itself); only the structural
    requirements (f32, gram, n < 2^24) gate the force. Regression: the
    force was silently ignored for n % 128 != 0."""
    monkeypatch.setenv("SS_BATCH_NATIVE", "1")
    rng = np.random.RandomState(5)
    m, n, k, B = 40, 80, 4, 6
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    Xt = np.zeros((B, n), np.float32)
    for i in range(B):
        Xt[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (Xt @ A.T).astype(np.float32)
    s = ss.Homotopy(A, engine="jax")
    X, reps = s.solve_batch(Y, tolerance=0.01, max_iterations=20)
    # the compiled-program cache key records which driver was built:
    # (max_iterations, k_max, batched, sparse, batch_native)
    assert any(key[4] for key in s._cache), s._cache.keys()
    rec = np.max(np.abs(np.asarray(X) @ A.T - Y), axis=1)
    assert (rec < 0.05).all()
