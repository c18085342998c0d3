"""Scale-stabilized IRLS (beyond reference — docs/algorithms.md §2a).

The reference recurrence multiplies the iterate's scale by the weight
normalizer every iteration and keeps ε frozen at its early floor, so
min(w) crosses the Cholesky/pivot floor after ~4 (f32) / ~8 (f64)
iterations on Gaussian ensembles at n ≥ 512 — every not-yet-converged
lane ends in spd_failure. ``Irls(A, stabilized=True)`` divides each
Newton iterate by its maximum first, making the recurrence scale-free
with unchanged per-iteration support decisions. These tests pin:
the oracle parity of the variant, the sustained-convergence regime the
reference recurrence cannot reach, and the unchanged behavior where
both are defined.
"""

import numpy as np
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.oracle import irls as oracle_irls


def _competing_pair(m, n, b, rho_lo=0.9, rho_hi=0.96, seed=0,
                    dtype=np.float32):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n).astype(dtype)
    A /= np.linalg.norm(A, axis=0)
    Y = np.zeros((b, m), dtype)
    leaders = np.zeros(b, np.int64)
    for i in range(b):
        j1, j2 = rng.choice(n, 2, replace=False)
        x0 = np.zeros(n, dtype)
        x0[j1] = 1.0
        x0[j2] = rng.uniform(rho_lo, rho_hi)
        Y[i] = A @ x0 + rng.uniform(0, 1e-3, m).astype(dtype)
        leaders[i] = j1
    return A, Y, leaders


def test_stabilized_sustains_where_reference_recurrence_bails():
    """Competing-pair ensemble at separation threshold 0.3: the
    reference recurrence spd-bails within ~4 iterations on every lane;
    the stabilized variant converges on every lane through genuinely
    sustained iteration (≥ 5 at this reduced shape) with the leader
    identified."""
    A, Y, leaders = _competing_pair(768, 256, 8)
    ref = ss.Irls(A, engine="jax")
    Xr, rr = ref.solve_batch(Y, tolerance=0.3, max_iterations=60)
    assert np.asarray(rr.spd_failure).all()
    assert np.asarray(rr.iter).max() <= 6

    st = ss.Irls(A, engine="jax", stabilized=True)
    Xs, rs = st.solve_batch(Y, tolerance=0.3, max_iterations=60)
    iters = np.asarray(rs.iter)
    assert not np.asarray(rs.spd_failure).any()
    assert (iters < 60).all(), "every lane converges by the do-while rule"
    assert iters.min() >= 5 and iters.mean() >= 7, iters
    assert (np.asarray(Xs).argmax(axis=1) == leaders).all()


def test_stabilized_matches_oracle_f64():
    """f64 oracle parity (the project convention: every fp-trajectory
    variant has an oracle counterpart): identical iteration counts and
    matching solutions against oracle/irls.py (stabilized=True)."""
    A, Y, leaders = _competing_pair(96, 48, 4, dtype=np.float64)
    s = ss.Irls(A, engine="jax", stabilized=True)
    for i in range(Y.shape[0]):
        x, rep = s.solve(Y[i], tolerance=0.25, max_iterations=60)
        xo, it_o, eps_o, spd_o = oracle_irls.solve(
            A, Y[i], 0.25, max_iterations=60, stabilized=True)
        assert rep.iter == it_o, (rep, it_o)
        assert rep.spd_failure == spd_o
        np.testing.assert_allclose(np.asarray(x), xo, atol=1e-8)
        np.testing.assert_allclose(rep.solution_error, eps_o, rtol=1e-10)


def test_stabilized_identity_smoke_unchanged():
    """Where the reference recurrence is well-behaved the stabilized
    variant is identical: identity smoke (max(x)=1 ⇒ the normalization
    is a no-op) keeps the exactness contract."""
    A = np.eye(5, dtype=np.float32)
    y = A[:, 2]
    x, rep = ss.Irls(A, engine="jax", stabilized=True).solve(
        y, tolerance=0.1)
    assert rep.iter == 1 and rep.solution_error == 0.0
    np.testing.assert_array_equal(x, y)


def test_stabilized_one_sparse_noisy_matches_reference_mode():
    """~1-sparse noisy detection (the reference's contract regime):
    both variants identify the same component."""
    rng = np.random.RandomState(3)
    m, n = 128, 64
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    j = 7
    y = (A[:, j] + rng.uniform(0, 0.05, m)).astype(np.float32)
    xr, _ = ss.Irls(A, engine="jax").solve(y, tolerance=0.1)
    xs, rs = ss.Irls(A, engine="jax", stabilized=True).solve(
        y, tolerance=0.1)
    assert np.argmax(xr) == np.argmax(xs) == j


def test_stabilized_validation_and_explain():
    A = np.eye(8, dtype=np.float32)
    with pytest.raises(ValueError, match="stabilized"):
        ss.Irls(A, engine="native", stabilized=True)
    s = ss.Irls(A, engine="jax", stabilized=True)
    assert s.explain()["stabilized"] is True
    # auto engine must not route a stabilized solve to the native
    # backend (which implements the reference recurrence)
    s_auto = ss.Irls(A, stabilized=True)
    assert s_auto.explain().get("engine") == "jax"


def test_stabilized_sharded_matches_single():
    """irls_sharded(stabilized=True) on the virtual mesh matches the
    single-device stabilized solver (lane-local normalization adds no
    collectives)."""
    import jax
    import jax.numpy as jnp
    from sparse_solvers_tpu.parallel import sharding as sh

    assert jax.device_count() >= 8
    mesh = sh.make_mesh(n_row=4, n_data=2)
    A, Y, leaders = _competing_pair(128, 48, 8)
    Q, R = np.linalg.qr(A)
    Qd, Yd = sh.shard_inputs(mesh, Q.astype(np.float32), Y)
    X, rep = sh.irls_sharded(mesh, Qd, jnp.asarray(R.astype(np.float32)),
                             Yd, 0.25, 60, stabilized=True)
    Xs, rs = ss.Irls(A, engine="jax", stabilized=True).solve_batch(
        Y, tolerance=0.25, max_iterations=60)
    np.testing.assert_array_equal(np.asarray(rep.iter), np.asarray(rs.iter))
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-4)
