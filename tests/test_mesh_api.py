"""Mesh-aware façade (round-5 item 3): Homotopy/Irls/IrlsCg/Omp
constructed with ``mesh=`` become the construct-once sharded solver
objects — A placed/sharded once, the replicated Gram / mesh-native QR
cached per mesh, solve/solve_batch routed through the
parallel.sharding drivers (reference construct-once shape:
include/ss/ss.h:27-64, binding.cpp:114-148) — and must match the
functional sharded path / the unsharded engines at the reference
tolerances, including batch/row padding and trimming."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.parallel import sharding as sh


def _sparse_problem(rng, m, n, batch, k):
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X0 = np.zeros((batch, n), np.float32)
    for i in range(batch):
        X0[i, rng.choice(n, k, replace=False)] = rng.uniform(0.3, 1, k)
    return A, X0, (X0 @ A.T).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return sh.make_mesh(n_row=4, n_data=2)


def test_homotopy_mesh_matches_unsharded(mesh):
    rng = np.random.RandomState(0)
    # m=37 (row padding), batch=7 (data padding) both exercised
    A, X0, Y = _sparse_problem(rng, 37, 64, 7, 3)
    solver = ss.Homotopy(A, mesh=mesh)
    X, rep = solver.solve_batch(Y, tolerance=1e-3, max_iterations=50)
    Xs, reps = ss.Homotopy(A, engine="jax").solve_batch(
        Y, tolerance=1e-3, max_iterations=50)
    assert np.asarray(X).shape == (7, 64)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-5)
    # construct-once: the replicated mesh Gram is cached after first use
    assert solver._G_mesh is not None
    # single-solve routes through the same sharded path
    x, r = solver.solve(Y[0], tolerance=1e-3)
    np.testing.assert_allclose(np.asarray(x), np.asarray(Xs)[0],
                               atol=1e-5)
    assert r.iter == int(np.asarray(reps.iter)[0])
    plan = solver.explain(batch=8)
    assert plan["sharded"] and plan["mesh"] == {"data": 2, "row": 4}
    assert plan["gram_cached"]


def test_homotopy_mesh_certified(mesh):
    rng = np.random.RandomState(3)
    A, X0, Y = _sparse_problem(rng, 40, 64, 8, 3)
    solver = ss.Homotopy(A, mesh=mesh, precision="certified")
    X, rep = solver.solve_batch(Y, tolerance=1e-2, max_iterations=50)
    c = (Y - np.asarray(X) @ A.T) @ A
    np.testing.assert_allclose(np.asarray(rep.solution_error),
                               np.max(np.abs(c), axis=-1),
                               rtol=1e-5, atol=1e-7)
    assert np.all(np.asarray(rep.solution_error) <= 1e-2)


def test_homotopy_mesh_compact_output(mesh):
    rng = np.random.RandomState(5)
    A, X0, Y = _sparse_problem(rng, 32, 64, 7, 3)
    solver = ss.Homotopy(A, mesh=mesh)
    vals, idxs, rep = solver.solve_batch(Y, tolerance=1e-3,
                                         max_iterations=40, dense=False)
    X, _ = solver.solve_batch(Y, tolerance=1e-3, max_iterations=40)
    from sparse_solvers_tpu.solvers.homotopy_batch import densify_batch
    np.testing.assert_allclose(
        np.asarray(densify_batch(vals, idxs, 64)), np.asarray(X),
        atol=0)
    assert np.asarray(vals).shape[0] == 7  # batch padding trimmed


def test_irls_mesh_no_host_qr(mesh):
    rng = np.random.RandomState(1)
    A, X0, Y = _sparse_problem(rng, 45, 20, 7, 3)
    solver = ss.Irls(A, mesh=mesh)
    X, rep = solver.solve_batch(Y, tolerance=1e-3, max_iterations=50)
    Xs, reps = ss.Irls(A, engine="jax").solve_batch(
        Y, tolerance=1e-3, max_iterations=50)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-4)
    # the host-side QR cache is never touched: the factorization ran on
    # the mesh (CholeskyQR2) and is cached there
    assert solver._QR_cache is None and solver._QR_mesh is not None
    assert solver.explain()["qr_cached"]


def test_omp_mesh_matches_unsharded(mesh):
    rng = np.random.RandomState(2)
    A, X0, Y = _sparse_problem(rng, 37, 64, 7, 3)
    solver = ss.Omp(A, mesh=mesh)
    X, rep = solver.solve_batch(Y, tolerance=1e-4, max_iterations=20)
    Xs, reps = ss.Omp(A, engine="jax").solve_batch(
        Y, tolerance=1e-4, max_iterations=20)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-5)
    assert solver.explain(batch=8)["sharded"]


def test_irls_cg_mesh_support_recovery(mesh):
    rng = np.random.RandomState(4)
    m, n, b, k = 16, 50, 7, 2
    A = rng.randn(m, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    X0 = np.zeros((b, n), np.float32)
    for i in range(b):
        X0[i, rng.choice(n, k, replace=False)] = rng.uniform(0.5, 1, k)
    Y = (X0 @ A.T).astype(np.float32)
    solver = ss.IrlsCg(A, mesh=mesh)
    X, rep = solver.solve_batch(Y, tolerance=1e-5, max_iterations=60)
    X = np.asarray(X)
    assert X.shape == (b, n)
    for i in range(b):
        want = set(np.flatnonzero(X0[i]))
        got = set(np.argsort(-np.abs(X[i]))[:k])
        assert got == want, (i, got, want)
    assert solver.explain()["sharded"]


def test_mesh_validation_errors(mesh):
    A = np.eye(8, dtype=np.float32)
    with pytest.raises(ValueError, match="jax.sharding.Mesh"):
        ss.Homotopy(A, mesh="nope")
    with pytest.raises(ValueError, match="axes"):
        from jax.sharding import Mesh
        bad = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("x",))
        ss.Homotopy(A, mesh=bad)
    with pytest.raises(ValueError, match="native"):
        ss.Homotopy(A, mesh=mesh, engine="native")
    with pytest.raises(ValueError, match="exact"):
        ss.Homotopy(A, mesh=mesh, mode="exact")
    with pytest.raises(ValueError, match="exact"):
        ss.Omp(A, mesh=mesh, mode="exact")
    with pytest.raises(ValueError, match="single-device"):
        ss.Homotopy(A, mesh=mesh).solve_path(np.ones(8, np.float32))


def test_mesh_update_column_incremental(mesh):
    """Gallery churn at mesh scale: update_column rewrites the placed
    row-sharded A shard-locally and the replicated Gram's row/col with
    one psum'd Aᵀv gemv (update_column_sharded) — no re-placement, no
    n² Gram rebuild — and subsequent solves see the new column."""
    rng = np.random.RandomState(6)
    A, X0, Y = _sparse_problem(rng, 37, 48, 4, 2)  # padded rows too
    solver = ss.Homotopy(A, mesh=mesh)
    solver.solve_batch(Y, tolerance=1e-3, max_iterations=30)
    assert solver._A_mesh is not None
    v = rng.randn(37).astype(np.float32)
    solver.update_column(5, v / np.linalg.norm(v))
    # incremental: placements stay live (not invalidated)
    assert solver._A_mesh is not None and solver._G_mesh is not None
    A2 = np.array(np.asarray(solver._A))
    np.testing.assert_allclose(np.asarray(solver._G_mesh), A2.T @ A2,
                               atol=1e-5)
    X, rep = solver.solve_batch(Y, tolerance=1e-3, max_iterations=30)
    Xs, reps = ss.Homotopy(A2, engine="jax").solve_batch(
        Y, tolerance=1e-3, max_iterations=30)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-5)
    # churn before first placement: lazy path reads the updated host A
    s2 = ss.Homotopy(A, mesh=mesh)
    s2.update_column(3, v / np.linalg.norm(v))
    assert s2._A_mesh is None
    s2.solve_batch(Y, tolerance=1e-3, max_iterations=30)
    assert s2._A_mesh is not None


def test_mesh_on_device_pads_batch_and_rows(mesh):
    """Review regression (round 5): the on-device mesh wrappers must
    pad a batch not divisible by the data axis AND rows not divisible
    by the row axis (m=37 on row=4) — feeding raw shapes into the
    shard_map crashed before the fix; results must be trimmed back."""
    rng = np.random.RandomState(9)
    A, X0, Y = _sparse_problem(rng, 37, 128, 5, 3)  # b=5 % data=2 != 0
    solver = ss.Homotopy(A, mesh=mesh, precision="high")
    Yd = jnp.asarray(Y)
    X, rep = solver.solve_batch_on_device(Yd, 1e-3, 50)
    assert np.asarray(X).shape == (5, 128)
    Xs, reps = solver.solve_batch(Y, tolerance=1e-3, max_iterations=50)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    # single solve through the on-device entry (batch 1 on data=2)
    x1, r1 = solver.solve_on_device(Yd[0], 1e-3, 50)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(Xs)[0],
                               atol=1e-6)
    # Omp and Irls wrappers share the fix
    om = ss.Omp(A, mesh=mesh, precision="high")
    Xo, ro = om.solve_batch_on_device(Yd, 1e-3, 20)
    assert np.asarray(Xo).shape == (5, 128)
    ir = ss.Irls(A[:, :20], mesh=mesh)
    Yi = jnp.asarray((X0[:, :20] @ A[:, :20].T).astype(np.float32))
    Xi, ri = ir.solve_batch_on_device(Yi, 1e-3, 20)
    assert np.asarray(Xi).shape == (5, 20)
    xc1, rc1 = ss.IrlsCg(A[:16], mesh=mesh).solve_batch_on_device(
        jnp.asarray(Y[:, :16]), 1e-3, 15)
    assert np.asarray(xc1).shape == (5, 128)
