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


def test_removals_stability_and_parity():
    """Signed coefficients + noise force remove events and near-tied γ
    candidates. On these near-degenerate paths the batch driver and the
    vmapped core may fork at an ulp-level tie (the core itself forks
    between MXU precision levels there), so the contract is: no NaN/Inf
    ever (the reference's unguarded degenerate inserts must not be *more*
    reachable than in the core), iteration parity on the majority of
    lanes, identical solutions where iterations agree, and oracle-quality
    recovery on every converged lane."""
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
    Xb, Xv = np.asarray(Xb), np.asarray(Xv)
    iv, ib = np.asarray(Rv.iter), np.asarray(Rb.iter)

    assert np.isfinite(Xb).all()
    assert np.isfinite(np.asarray(Rb.solution_error)).all()
    agree = iv == ib
    assert agree.sum() >= B // 2, f"only {agree.sum()}/{B} lanes in parity"
    np.testing.assert_allclose(Xv[agree], Xb[agree], atol=1e-5)
    conv = ib < 60
    rec = np.max(np.abs(Xb @ A.T - Y), axis=1)
    assert (rec[conv] < 0.15).all()


def test_no_nans_on_thrashy_ensemble():
    """64 noisy signed lanes, 120 iterations: the driver must stay finite
    even through degenerate-insert territory (round-2 regression: the
    pos==last remove left Gram-companion dust that eventually fed
    1/(vᵀv−u1ᵀu2) with a spanned column)."""
    rng = np.random.RandomState(42)
    m, n, k, B = 40, 80, 10, 64
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    Xt = np.zeros((B, n), np.float32)
    for i in range(B):
        Xt[i, rng.choice(n, k, replace=False)] = rng.randn(k)
    Y = (Xt @ A.T + 0.01 * rng.randn(B, m)).astype(np.float32)
    s = ss.Homotopy(A, engine="jax")
    f = jax.jit(partial(HB.solve_homotopy_batch, max_iterations=120,
                        k_max=121, use_kernel=False))
    with blas.precision_scope("high"):
        Xb, Rb = f(jnp.asarray(A), s._G, jnp.asarray(Y), 0.05)
    assert np.isfinite(np.asarray(Xb)).all()
    assert np.isfinite(np.asarray(Rb.solution_error)).all()


def test_remove_to_empty_breaks_with_solution_intact():
    """When the γ-scan selects removal of a lane's only active member
    (kk == 1) the lane must break with its solution intact — the core and
    the reference break BEFORE touching the support (homotopy-cpu.cpp:246
    K==0 break; solve_homotopy_core's `empty` clamp). Regression: the
    batch driver ran the remove anyway, zeroing x_act so the final
    slot-scatter returned X = 0 for the lane."""
    n = m = 8
    K = 4
    A = np.eye(m, n, dtype=np.float32)          # G = I
    G = np.eye(n, dtype=np.float32)
    Y = np.zeros((1, m), np.float32)
    init, body, lane_live = HB.make_stepper(
        jnp.asarray(A), jnp.asarray(G), jnp.asarray(Y), 0.01, 10, K,
        use_kernel=False)
    # one active member (index 3) whose removal candidate -x/d = 0.45 is
    # below every insertion candidate (= 1.0 here): the scan picks the
    # removal, which would empty the support
    s = init._replace(
        it=jnp.array([1], jnp.uint32),
        c=jnp.zeros((1, n), jnp.float32).at[0, 3].set(1.0),
        c_inf=jnp.array([1.0], jnp.float32),
        mask=jnp.zeros((1, n), jnp.int8).at[0, 3].set(1),
        inv=jnp.zeros((1, K, K), jnp.float32).at[0, 0, 0].set(1.0),
        gk=jnp.zeros((1, K, K), jnp.float32).at[0, 0, 0].set(1.0),
        x_act=jnp.zeros((1, K), jnp.float32).at[0, 0].set(0.9),
        d_act=jnp.zeros((1, K), jnp.float32).at[0, 0].set(-2.0),
        c_act=jnp.zeros((1, K), jnp.float32).at[0, 0].set(1.0),
        indices=jnp.full((1, K), n, jnp.int32).at[0, 0].set(3),
        kk=jnp.array([1], jnp.int32),
        broke=jnp.array([False]),
    )
    out = body(s)
    assert bool(out.broke[0])                      # lane breaks...
    assert int(out.kk[0]) == 1                     # ...support untouched
    assert int(out.indices[0, 0]) == 3
    np.testing.assert_allclose(float(out.x_act[0, 0]), 0.9, atol=1e-6)
    assert int(out.mask[0, 3]) == 1
