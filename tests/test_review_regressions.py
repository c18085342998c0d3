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
