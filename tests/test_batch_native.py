"""Batch-native homotopy driver vs the vmapped per-lane core.

On well-conditioned problems both formulations must agree iteration-for-
iteration (they are the same updates in a different batching layout).
The driver runs the active-set kernel in interpret mode here (CPU).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.ops import blas
from sparse_solvers_tpu.solvers import homotopy_batch as HB


def test_matches_vmap_core():
    rng = np.random.RandomState(0)
    m, n, k, B = 128, 256, 8, 16
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X = np.zeros((B, n), np.float32)
    for i in range(B):
        X[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (X @ A.T).astype(np.float32)

    s = ss.Homotopy(A, engine="jax")
    Xv, Rv = s.solve_batch(Y, tolerance=0.01, max_iterations=40)

    f = jax.jit(partial(HB.solve_homotopy_batch, max_iterations=40,
                        k_max=41, use_kernel=False))
    with blas.precision_scope("high"):
        Xb, Rb = f(jnp.asarray(A), s._G, jnp.asarray(Y), 0.01)

    np.testing.assert_array_equal(np.asarray(Rv.iter), np.asarray(Rb.iter))
    np.testing.assert_allclose(np.asarray(Xv), np.asarray(Xb), atol=2e-6)
    np.testing.assert_allclose(np.asarray(Rv.solution_error),
                               np.asarray(Rb.solution_error), atol=2e-6)


def test_lane_freeze_variable_iterations():
    # lanes with different sparsity converge at different iterations; late
    # lanes must not disturb finished ones
    rng = np.random.RandomState(1)
    m, n, B = 96, 192, 6
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X = np.zeros((B, n), np.float32)
    for i in range(B):
        X[i, rng.choice(n, 2 + 3 * i, replace=False)] = rng.uniform(
            0.5, 1, 2 + 3 * i)
    Y = (X @ A.T).astype(np.float32)

    s = ss.Homotopy(A, engine="jax")
    G = s._G
    f = jax.jit(partial(HB.solve_homotopy_batch, max_iterations=60,
                        k_max=61, use_kernel=False))
    with blas.precision_scope("high"):
        Xb, Rb = f(jnp.asarray(A), G, jnp.asarray(Y), 0.01)
    iters = np.asarray(Rb.iter)
    assert len(set(iters.tolist())) > 1  # genuinely different lane lengths
    # each lane recovered its own signal
    rec = np.max(np.abs(np.asarray(Xb) @ A.T - Y), axis=1)
    assert (rec < 0.05).all()


def test_matches_vmap_core_with_removals():
    # signed coefficients + noise force remove events, exercising the
    # batch-level do_full branch
    rng = np.random.RandomState(3)
    m, n, k, B = 40, 80, 10, 12
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    Xt = np.zeros((B, n), np.float32)
    for i in range(B):
        Xt[i, rng.choice(n, k, replace=False)] = rng.randn(k)
    Y = (Xt @ A.T + 0.01 * rng.randn(B, m)).astype(np.float32)

    s = ss.Homotopy(A, engine="jax")
    Xv, Rv = s.solve_batch(Y, tolerance=0.05, max_iterations=60)
    f = jax.jit(partial(HB.solve_homotopy_batch, max_iterations=60,
                        k_max=61, use_kernel=False))
    with blas.precision_scope("high"):
        Xb, Rb = f(jnp.asarray(A), s._G, jnp.asarray(Y), 0.05)
    np.testing.assert_array_equal(np.asarray(Rv.iter), np.asarray(Rb.iter))
    np.testing.assert_allclose(np.asarray(Xv), np.asarray(Xb), atol=1e-5)
