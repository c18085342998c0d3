"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(conftest sets --xla_force_host_platform_device_count=8): row-sharded +
batch-sharded solves must match the single-device solver exactly
(homotopy) / within the reference tolerance regime (IRLS), including
per-lane iteration counts. This is the SURVEY §2.4 / BASELINE config-5
design validated before real pod runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sparse_solvers_tpu as ss
from sparse_solvers_tpu.parallel import sharding as sh


def _problem(rng, m, n, batch, k):
    A = rng.randn(m, n)
    A = A / np.abs(A).sum(axis=0)
    Y = []
    for _ in range(batch):
        x_true = np.zeros(n)
        sup = rng.choice(n, k, replace=False)
        x_true[sup] = rng.uniform(0.2, 1.0, k)
        Y.append(A @ x_true)
    return A, np.stack(Y)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return sh.make_mesh(n_row=4, n_data=2)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "row": 4}


def test_homotopy_sharded_matches_single(mesh):
    rng = np.random.RandomState(0)
    # m=37 deliberately not divisible by the row axis (padding path)
    A, Y = _problem(rng, 37, 20, 8, 3)
    Ad, Yd = sh.shard_inputs(mesh, A, Y)
    X, rep = sh.homotopy_sharded(mesh, Ad, Yd, 0.01, 50)

    Xs, reps = ss.Homotopy(A).solve_batch(Y, tolerance=0.01,
                                          max_iterations=50)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))
    np.testing.assert_allclose(np.asarray(rep.solution_error),
                               np.asarray(reps.solution_error), atol=1e-12)


def test_irls_sharded_matches_single(mesh):
    rng = np.random.RandomState(1)
    A, Y = _problem(rng, 40, 20, 8, 3)
    Q, R = np.linalg.qr(A)
    Qd, Yd = sh.shard_inputs(mesh, Q, Y)
    X, rep = sh.irls_sharded(mesh, Qd, jnp.asarray(R), Yd, 0.001, 50)

    Xs, reps = ss.Irls(A).solve_batch(Y, tolerance=0.001, max_iterations=50)
    # IRLS amplifies accumulation-order noise (see test_batch.py); the
    # reference property tolerance applies
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(rep.iter),
                                  np.asarray(reps.iter))


def test_homotopy_sharded_under_jit(mesh):
    """The sharded solve must compose under jit (the pod 'training step')."""
    rng = np.random.RandomState(2)
    A, Y = _problem(rng, 32, 16, 4, 2)
    Ad, Yd = sh.shard_inputs(mesh, A, Y)

    step = jax.jit(lambda a, y: sh.homotopy_sharded(mesh, a, y, 0.01, 30))
    X, rep = step(Ad, Yd)
    Xs, _ = ss.Homotopy(A).solve_batch(Y, tolerance=0.01, max_iterations=30)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xs), atol=1e-12)
