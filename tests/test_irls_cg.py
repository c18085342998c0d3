"""CG-IRLS (solvers/irls_cg.py) — matrix-free basis pursuit, m ≤ n.

Beyond-reference capability (the reference IRLS rejects underdetermined
systems, irls_test.cpp:53), so the oracles here are mathematical rather
than parity-based:

  * compressed-sensing recovery: a k-sparse signal from gaussian
    measurements with m ≥ O(k log n) is the ℓ₁ minimizer, and IRLS-CG
    must find it (arXiv:1509.04063 §2);
  * the inner CG must agree with a dense direct solve of the weighted
    normal equations (A D Aᵀ) z = y for fixed weights;
  * batching/vmap lane independence and the sharded variant's equality
    with the single-device solver.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.solvers import irls_cg as icg
from sparse_solvers_tpu.parallel import sharding as sh

# jax-engine semantics are pinned explicitly below (engine="auto" would
# reroute these small problems to the native host engine and silently
# drop jitted-solver coverage); silence the small-problem advisory only
pytestmark = pytest.mark.filterwarnings(
    "ignore:engine='jax' on a:RuntimeWarning")


def _cs_problem(rng, m, n, k, dtype=np.float64):
    """Gaussian compressed-sensing instance with a well-separated
    k-sparse ground truth (unit-norm columns)."""
    A = rng.randn(m, n).astype(dtype)
    A /= np.linalg.norm(A, axis=0)
    x_true = np.zeros(n, dtype)
    sup = rng.choice(n, k, replace=False)
    x_true[sup] = rng.choice([-1.0, 1.0], k) * rng.uniform(0.5, 1.5, k)
    return A, x_true, (A @ x_true).astype(dtype)


@pytest.mark.parametrize("dtype,atol", [(np.float64, 1e-6),
                                        (np.float32, 1e-3)])
def test_recovers_sparse_signal(dtype, atol):
    rng = np.random.RandomState(0)
    A, x_true, y = _cs_problem(rng, 64, 256, 5, dtype)
    solver = ss.IrlsCg(A, engine="jax")
    x, rep = solver.solve(y, tolerance=1e-8 if dtype == np.float64 else 1e-5,
                          max_iterations=80)
    assert not rep.spd_failure
    assert rep.iter >= 1
    np.testing.assert_allclose(x, x_true, atol=atol)


def test_first_iterate_is_least_norm_solution():
    # x⁰=0 gives uniform weights, so iterate 1 is argmin ‖x‖₂ s.t. Ax=y
    # (the DDFG initialization) — pin it against the pseudoinverse.
    rng = np.random.RandomState(1)
    A, _, y = _cs_problem(rng, 20, 50, 3)
    x, rep = ss.IrlsCg(A, engine="jax").solve(y, tolerance=np.inf,
                                              max_iterations=1)
    assert rep.iter == 1
    x_ln = np.linalg.pinv(A) @ y
    np.testing.assert_allclose(x, x_ln, atol=1e-8)


def test_cg_matches_direct_solve():
    # fixed weights: one CG solve vs numpy direct solve of (A D Aᵀ)z = y
    rng = np.random.RandomState(2)
    m, n = 24, 60
    A = rng.randn(m, n)
    D = rng.uniform(0.5, 2.0, n)
    y = rng.randn(m)
    B = (A * D) @ A.T
    mv = lambda v: jnp.asarray(A) @ v
    rmv = lambda u: jnp.asarray(A).T @ u
    body = lambda v: mv(jnp.asarray(D) * rmv(v))
    out = icg._cg_solve(body, jnp.asarray(y), jnp.zeros(m),
                        jnp.asarray(1e-24), 200, jnp.float64)
    assert not bool(out.broke)
    np.testing.assert_allclose(np.asarray(out.z), np.linalg.solve(B, y),
                               atol=1e-8)


def test_solution_satisfies_constraint_and_l1_optimality():
    # the recovered x must satisfy Ax≈y and have ‖x‖₁ no larger than the
    # true sparse solution (it IS the ℓ₁ minimizer here)
    rng = np.random.RandomState(3)
    A, x_true, y = _cs_problem(rng, 48, 200, 4)
    x, _ = ss.IrlsCg(A, engine="jax").solve(y, tolerance=1e-9,
                                            max_iterations=100)
    np.testing.assert_allclose(A @ x, y, atol=1e-6)
    assert np.abs(x).sum() <= np.abs(x_true).sum() + 1e-6


def test_nonconvex_p_recovers():
    rng = np.random.RandomState(4)
    A, x_true, y = _cs_problem(rng, 64, 256, 5)
    x, rep = ss.IrlsCg(A, p=0.9, engine="jax").solve(y, tolerance=1e-8,
                                                     max_iterations=80)
    assert not rep.spd_failure
    np.testing.assert_allclose(x, x_true, atol=1e-5)


def test_batch_matches_sequential():
    rng = np.random.RandomState(5)
    A, _, _ = _cs_problem(rng, 32, 96, 3)
    Y = np.stack([
        _cs_problem(np.random.RandomState(10 + i), 32, 96, 3)[2]
        for i in range(4)
    ])
    # same A for all lanes
    A0 = A
    # pin jax: this test documents the vmap lane-gating semantics
    solver = ss.IrlsCg(A0, engine="jax")
    X, rep = solver.solve_batch(Y, tolerance=1e-8, max_iterations=60)
    for i in range(4):
        xi, ri = solver.solve(Y[i], tolerance=1e-8, max_iterations=60)
        # vmap runs all lanes while any is live; converged lanes are
        # gated, so results agree to fp determinism
        np.testing.assert_allclose(np.asarray(X)[i], xi, atol=1e-10)
        assert int(np.asarray(rep.iter)[i]) == ri.iter


def test_f32_tight_tolerance_stops_early():
    # the CG target auto-tightens with the outer tolerance, so an f32
    # solve at tol=1e-5 must converge (change below tol) well before the
    # iteration budget instead of jittering at the default-CG floor
    rng = np.random.RandomState(9)
    A, x_true, y = _cs_problem(rng, 64, 256, 5, np.float32)
    x, rep = ss.IrlsCg(A, engine="jax").solve(y, tolerance=1e-5,
                                              max_iterations=80)
    assert rep.iter < 80, rep
    np.testing.assert_allclose(x, x_true, atol=1e-3)


@pytest.mark.parametrize("engine", ["jax", "auto"])
def test_empty_batch(engine):
    rng = np.random.RandomState(6)
    A, _, _ = _cs_problem(rng, 16, 32, 2)
    X, rep = ss.IrlsCg(A, engine=engine).solve_batch(np.zeros((0, 16)),
                                                     tolerance=1e-6)
    assert X.shape == (0, 32)
    assert np.asarray(rep.iter).shape == (0,)


def test_overdetermined_rejected():
    with pytest.raises(ValueError, match="underdetermined"):
        ss.IrlsCg(np.ones((8, 4)))


def test_bad_p_rejected():
    with pytest.raises(ValueError, match="p must be"):
        ss.IrlsCg(np.ones((4, 8)), p=1.5)
    with pytest.raises(ValueError, match="p must be"):
        ss.IrlsCg(np.ones((4, 8)), p=0.0)


def test_bad_knobs_rejected():
    # k_sparsity < 1 would trace-crash in top_k; cg_max_iterations = 0
    # would silently return x = 0 as "converged"
    with pytest.raises(ValueError, match="k_sparsity"):
        ss.IrlsCg(np.ones((4, 8)), k_sparsity=0)
    with pytest.raises(ValueError, match="cg_max_iterations"):
        ss.IrlsCg(np.ones((4, 8)), cg_max_iterations=0)
    with pytest.raises(ValueError, match="cg_tolerance"):
        ss.IrlsCg(np.ones((4, 8)), cg_tolerance=0.0)


def test_cg_overflow_breaks_instead_of_nan():
    # a positive-subnormal curvature passes the pBp > 0 gate but makes
    # alpha overflow; the breakdown must be flagged (broke=True) with the
    # iterate left at its last finite value — not exit the loop through a
    # NaN comparison with broke unset (code-review finding)
    m = 8
    y = jnp.ones((m,), jnp.float32)
    body = lambda v: jnp.float32(1e-39) * v  # B = 1e-39·I
    out = icg._cg_solve(body, y, jnp.zeros(m, jnp.float32),
                        jnp.float32(1e-20), 50, jnp.float32)
    assert bool(out.broke)
    assert np.isfinite(np.asarray(out.z)).all()
    assert np.isfinite(float(out.rs))


def test_explain():
    plan = ss.IrlsCg(np.ones((4, 8)), engine="jax").explain()
    assert plan["engine"] == "jax"
    assert plan["factorization_free"]
    auto = ss.IrlsCg(np.ones((4, 8))).explain()
    assert auto["engine"] in ("jax", "native")


def test_jit_composable():
    rng = np.random.RandomState(7)
    A, x_true, y = _cs_problem(rng, 48, 160, 4)
    solver = ss.IrlsCg(A)

    @jax.jit
    def serve(y):
        x, rep = solver.solve_on_device(y, 1e-8, max_iterations=60)
        return x, rep.iter

    x, it = serve(jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-5)
    assert int(it) >= 1


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return sh.make_mesh(n_row=4, n_data=2)


def test_irls_cg_sharded_matches_single(mesh):
    rng = np.random.RandomState(8)
    # n=90 deliberately not divisible by the 4-way column axis (padding)
    A, _, _ = _cs_problem(rng, 30, 90, 3)
    Y = np.stack([
        _cs_problem(np.random.RandomState(20 + i), 30, 90, 3)[2]
        for i in range(8)
    ])
    X, rep = sh.irls_cg_sharded(mesh, jnp.asarray(A), jnp.asarray(Y),
                                1e-8, 60)
    Xs, reps = ss.IrlsCg(A, engine="jax").solve_batch(
        Y, tolerance=1e-8, max_iterations=60)
    # same algorithm, same arithmetic order per shard — tolerances only
    # absorb the psum reduction-order difference
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-8)
    np.testing.assert_array_equal(np.asarray(rep.spd_failure),
                                  np.asarray(reps.spd_failure))
    np.testing.assert_allclose(np.asarray(rep.solution_error),
                               np.asarray(reps.solution_error), rtol=1e-6)


def test_native_engine_matches_jax():
    # the C++ host engine runs the identical iteration in exact FMA
    # arithmetic; in f64 both engines track the same trajectory
    from sparse_solvers_tpu.backend import native as nat
    if not nat.available():
        pytest.skip("native backend unavailable")
    rng = np.random.RandomState(12)
    A, x_true, y = _cs_problem(rng, 48, 160, 4)
    xn, repn = ss.IrlsCg(A, engine="native").solve(y, tolerance=1e-8,
                                                   max_iterations=60)
    xj, repj = ss.IrlsCg(A, engine="jax").solve(y, tolerance=1e-8,
                                                max_iterations=60)
    assert not repn.spd_failure and not repj.spd_failure
    assert abs(repn.iter - repj.iter) <= 1
    np.testing.assert_allclose(xn, xj, atol=1e-6)
    np.testing.assert_allclose(xn, x_true, atol=1e-6)
    # auto routing: a small problem reports the native engine
    plan = ss.IrlsCg(A).explain()
    assert plan["engine"] == "native"
    # batch loop over the cached matrix matches per-signal solves exactly
    Xb, repb = ss.IrlsCg(A, engine="native").solve_batch(
        np.stack([y, y]), tolerance=1e-8, max_iterations=60)
    np.testing.assert_array_equal(np.asarray(Xb)[0], xn)
    assert int(np.asarray(repb.iter)[0]) == repn.iter


def test_native_batch_matches_sequential():
    # the threaded host batch runs the identical single-solve code path
    # per signal, so results are bit-equal to sequential solves
    from sparse_solvers_tpu.backend import native as nat
    if not nat.available():
        pytest.skip("native backend unavailable")
    rng = np.random.RandomState(14)
    A, _, _ = _cs_problem(rng, 32, 96, 3)
    Y = np.stack([
        _cs_problem(np.random.RandomState(30 + i), 32, 96, 3)[2]
        for i in range(8)
    ])
    solver = ss.IrlsCg(A, engine="native")
    X, rep = solver.solve_batch(Y, tolerance=1e-8, max_iterations=60)
    for i in range(8):
        xi, ri = solver.solve(Y[i], tolerance=1e-8, max_iterations=60)
        np.testing.assert_array_equal(np.asarray(X)[i], xi)
        assert int(np.asarray(rep.iter)[i]) == ri.iter
        assert bool(np.asarray(rep.spd_failure)[i]) == ri.spd_failure


def test_view_semantics():
    # non-contiguous inputs work zero-copy-equivalent, like the reference
    # binding's view tests (bindings/python/tests/test_binding.py:31-68)
    rng = np.random.RandomState(13)
    A, _, y = _cs_problem(rng, 24, 64, 3)
    big = np.zeros((24, 128))
    big[:, ::2] = A             # strided column view
    Av = big[:, ::2]
    assert not Av.flags["C_CONTIGUOUS"]
    x_ref, rep_ref = ss.IrlsCg(A).solve(y, tolerance=1e-8,
                                        max_iterations=60)
    x_v, rep_v = ss.IrlsCg(Av).solve(y, tolerance=1e-8, max_iterations=60)
    np.testing.assert_array_equal(x_v, x_ref)
    assert rep_v.iter == rep_ref.iter

    At = np.ascontiguousarray(A.T).T   # transposed (Fortran-order) view
    assert not At.flags["C_CONTIGUOUS"]
    x_t, rep_t = ss.IrlsCg(At).solve(y, tolerance=1e-8, max_iterations=60)
    np.testing.assert_array_equal(x_t, x_ref)
