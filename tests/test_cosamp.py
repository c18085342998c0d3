"""CoSaMP — the support-replacing greedy family (round 5, beyond
reference). Strategy mirrors the OMP suite: round-for-round oracle
parity (independent dense-lstsq NumPy rewrite), recovery fixtures in
the reference tolerance regime, f32+f64, and the framework's own
conventions (vmap batch consistency, jit composition, validation)."""

import numpy as np
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.oracle import cosamp as oracle


def _problem(m, n, k, seed=0, dtype=np.float32, signed=True):
    rng = np.random.RandomState(seed)
    A = rng.randn(m, n).astype(dtype)
    A /= np.linalg.norm(A, axis=0)
    x = np.zeros(n, dtype)
    sup = rng.choice(n, k, replace=False)
    amp = rng.uniform(0.5, 1.0, k)
    if signed:
        amp = amp * rng.choice([-1.0, 1.0], k)
    x[sup] = amp.astype(dtype)
    return A, x, (A @ x).astype(dtype)


@pytest.mark.parametrize("m,n,k,dtype", [
    (64, 160, 8, np.float32),
    (100, 300, 12, np.float32),
    (96, 48, 5, np.float32),          # overdetermined
    (64, 160, 8, np.float64),
])
def test_oracle_parity(m, n, k, dtype):
    """Engine matches the independent dense-lstsq oracle: same round
    count, same final support, solutions at reference tolerances."""
    A, x_true, y = _problem(m, n, k, seed=m + n, dtype=dtype)
    tol = 1e-4 if dtype == np.float32 else 1e-8
    xo, ito, erro, so = oracle.solve(A, y, k, tol, 20)
    x, rep = ss.Cosamp(A, k).solve(y, tolerance=tol, max_iterations=20)
    assert rep.iter == ito
    np.testing.assert_allclose(x, xo, atol=1e-3 if dtype == np.float32
                               else 1e-8)
    got = sorted(np.flatnonzero(np.abs(x) > 10 * tol).tolist())
    assert got == so == sorted(np.flatnonzero(x_true).tolist())
    assert rep.solution_error <= tol


def test_support_replacement_beats_omp_on_coherent_column():
    """CoSaMP's defining property: a wrong early pick gets EVICTED.
    Build a dictionary with a decoy column highly coherent with the
    planted signal — greedy insert-only OMP commits to it forever;
    CoSaMP's prune can drop it once the true atoms explain y better."""
    rng = np.random.RandomState(42)
    m, n, k = 48, 120, 4
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    sup = np.array([10, 30, 50, 70])
    x_true = np.zeros(n, np.float32)
    x_true[sup] = np.array([1.0, 0.9, 0.8, 0.7], np.float32)
    y = A @ x_true
    # decoy: almost the signal direction itself
    decoy = y + 0.15 * rng.randn(m).astype(np.float32)
    A[:, 0] = (decoy / np.linalg.norm(decoy)).astype(np.float32)
    y = A @ x_true  # unchanged: x_true has no mass on column 0
    x, rep = ss.Cosamp(A, k).solve(y, tolerance=1e-4,
                                   max_iterations=30)
    got = set(np.flatnonzero(np.abs(np.asarray(x)) > 1e-2).tolist())
    assert got == set(sup.tolist()), got
    assert rep.solution_error <= 1e-4


def test_batch_matches_single_and_jit_composes():
    import jax
    A, _, _ = _problem(64, 160, 6, seed=3)
    Y = np.stack([_problem(64, 160, 6, seed=s)[2] for s in range(4)])
    solver = ss.Cosamp(A, 6)
    X, reps = solver.solve_batch(Y, tolerance=1e-4)
    for b in range(4):
        xb, repb = solver.solve(Y[b], tolerance=1e-4)
        assert int(np.asarray(reps.iter)[b]) == repb.iter
        np.testing.assert_allclose(np.asarray(X)[b], xb, atol=1e-5)
    step = jax.jit(lambda y: solver.solve_batch_on_device(y, 1e-4))
    X2, _ = step(jax.numpy.asarray(Y))
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-6)


def test_stall_keeps_previous_iterate():
    """Noisy y below the tolerance floor: the residual stalls at its LS
    optimum; the solve stops with a finite iterate and an honest
    error > tol instead of cycling supports."""
    rng = np.random.RandomState(9)
    A, x_true, y = _problem(64, 160, 6, seed=9)
    y = y + 0.05 * rng.randn(64).astype(np.float32)
    x, rep = ss.Cosamp(A, 6).solve(y, tolerance=1e-6,
                                   max_iterations=25)
    assert np.all(np.isfinite(np.asarray(x)))
    assert rep.iter <= 25 and rep.solution_error > 1e-6
    got = set(np.flatnonzero(np.abs(np.asarray(x)) > 1e-1).tolist())
    assert got == set(np.flatnonzero(x_true).tolist())


def test_validation_and_explain():
    A = np.eye(8, dtype=np.float32)
    with pytest.raises(ValueError):
        ss.Cosamp(A, 0)
    with pytest.raises(ValueError):
        ss.Cosamp(A, 9)
    with pytest.raises(ValueError):
        ss.Cosamp(A, 2, engine="native")
    with pytest.raises(ValueError):
        ss.Cosamp(A, 2, precision="certified")
    with pytest.raises(ValueError):
        ss.Cosamp(A, 2).solve(np.zeros(8, np.float32), max_iterations=0)
    plan = ss.Cosamp(A, 2).explain(batch=4)
    assert plan["k_sparsity"] == 2 and plan["union_capacity"] == 6
    assert "CoSaMP" in plan["formulation"]


def test_identity_smoke():
    """A = I recovers a one-hot exactly in one round (the reference
    smoke contract shape, test_util.h:27-55, applied to the family)."""
    I = np.eye(6, dtype=np.float32)
    sig = np.zeros(6, np.float32)
    sig[3] = 1.0
    x, rep = ss.Cosamp(I, 1).solve(sig, tolerance=0.1)
    assert rep.iter == 1
    assert rep.solution_error <= 1e-6
    np.testing.assert_allclose(x, sig, atol=1e-7)


def test_union_pool_clamped_when_3k_exceeds_m():
    """Review regression (round 5): with 3k > m the unclamped union
    Gram was singular by construction — the round Cholesky NaN'd into a
    spurious 1-round stall. The pool clamp (k2 = min(2k, n−k, m−k))
    keeps the union LS overdetermined; engine and oracle must agree and
    actually iterate."""
    rng = np.random.RandomState(11)
    m, n, k = 48, 120, 18  # 3k = 54 > m
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    x0 = np.zeros(n, np.float32)
    x0[rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    y = A @ x0
    xo, ito, erro, so = oracle.solve(A, y, k, 1e-3, 30)
    x, rep = ss.Cosamp(A, k).solve(y, tolerance=1e-3, max_iterations=30)
    assert rep.iter == ito and rep.iter >= 1
    np.testing.assert_allclose(float(rep.solution_error), erro,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(x, xo, atol=2e-3)


def test_k_equal_min_dim_rejected():
    """k == min(m, n) leaves no inactive pool (every solve returned
    x = 0 silently before the fix) — rejected with a clear error."""
    I = np.eye(8, dtype=np.float32)
    with pytest.raises(ValueError, match="k_sparsity must be <"):
        ss.Cosamp(I, 8)


def test_cosamp_sharded_matches_single():
    """cosamp_sharded (round 5): the row+data sharded route — psum'd
    proxy correlations, union Gram, rhs and ‖r‖² per round — matches
    the single-device engine round-for-round on the virtual mesh,
    including row/batch padding; the Cosamp(mesh=) façade routes it."""
    import jax
    from sparse_solvers_tpu.parallel import sharding as sh
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device conftest mesh")
    rng = np.random.RandomState(2)
    m, n, k, b = 45, 120, 6, 7   # 45 % 4, 7 % 2: both paddings
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X0 = np.zeros((b, n), np.float32)
    for i in range(b):
        X0[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (X0 @ A.T).astype(np.float32)
    mesh = sh.make_mesh(n_row=4, n_data=2)
    Xs, rs = ss.Cosamp(A, k).solve_batch(Y, tolerance=1e-4,
                                         max_iterations=20)
    Xf, rf = ss.Cosamp(A, k, mesh=mesh).solve_batch(
        Y, tolerance=1e-4, max_iterations=20)
    np.testing.assert_array_equal(np.asarray(rf.iter),
                                  np.asarray(rs.iter))
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xs),
                               atol=1e-5)
    assert np.asarray(Xf).shape == (b, n)
    # functional entry agrees too (it requires a data-divisible batch,
    # like the other *_sharded functions; the facade pads)
    Ad, Yd = sh.shard_inputs(mesh, A, Y[:6])
    X2, r2 = sh.cosamp_sharded(mesh, Ad, Yd, k, 1e-4, 20)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(Xs)[:6],
                               atol=1e-5)
    # single solve through the facade
    x1, rep1 = ss.Cosamp(A, k, mesh=mesh).solve(Y[0], tolerance=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(Xs)[0],
                               atol=1e-5)


def test_cosamp_sharded_padded_rows_clamp_by_true_m():
    """Review regression (round 5): the façade places A pre-padded, and
    reading m_global off the padded A inflated the pool clamp — a union
    wider than the TRUE row count makes the union Gram exactly singular
    (m=21 → padded 24 on a row-4 mesh, k=8: S=24 > 21). The clamp must
    size by the true m; sharded and single-device must agree."""
    import jax
    from sparse_solvers_tpu.parallel import sharding as sh
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device conftest mesh")
    rng = np.random.RandomState(4)
    m, n, k, b = 21, 100, 8, 4   # m-k binds the clamp; 21 % 4 != 0
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X0 = np.zeros((b, n), np.float32)
    for i in range(b):
        X0[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (X0 @ A.T).astype(np.float32)
    mesh = sh.make_mesh(n_row=4, n_data=2)
    Xs, rs = ss.Cosamp(A, k).solve_batch(Y, tolerance=1e-3,
                                         max_iterations=25)
    Xf, rf = ss.Cosamp(A, k, mesh=mesh).solve_batch(
        Y, tolerance=1e-3, max_iterations=25)
    np.testing.assert_array_equal(np.asarray(rf.iter),
                                  np.asarray(rs.iter))
    np.testing.assert_allclose(np.asarray(Xf), np.asarray(Xs),
                               atol=1e-5)
