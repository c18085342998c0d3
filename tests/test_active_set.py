"""Active-set bookkeeping tests — analog of the reference's rank_index suite
(reference: src/linalg/rank_index_test.cpp): exhaustive insert/erase/rank
bookkeeping against a plain sorted-list model.
"""

import numpy as np
import jax.numpy as jnp

from sparse_solvers_tpu.linalg import active_set as aset

N = 20
CAP = 10


def model_insert(model, v):
    model.append(v)
    model.sort()
    return model.index(v)


def test_insert_returns_rank_and_stays_sorted():
    idx = aset.empty(CAP, N)
    model = []
    for v in [7, 3, 15, 0, 9, 4]:
        idx, r = aset.insert(idx, v, N)
        mr = model_insert(model, v)
        assert int(r) == mr
        np.testing.assert_array_equal(
            np.asarray(idx[: len(model)]), np.array(sorted(model)))
        # padding slots hold the sentinel
        assert np.all(np.asarray(idx[len(model):]) == N)


def test_rank_of_and_contains():
    idx = aset.empty(CAP, N)
    for v in [5, 2, 11]:
        idx, _ = aset.insert(idx, v, N)
    assert int(aset.rank_of(idx, 2)) == 0
    assert int(aset.rank_of(idx, 5)) == 1
    assert int(aset.rank_of(idx, 11)) == 2
    # rank a non-member would take
    assert int(aset.rank_of(idx, 7)) == 2
    assert bool(aset.contains(idx, 5))
    assert not bool(aset.contains(idx, 7))


def test_remove():
    idx = aset.empty(CAP, N)
    vals = [5, 2, 11, 8]
    for v in vals:
        idx, _ = aset.insert(idx, v, N)
    idx, r = aset.remove(idx, 8, N)
    assert int(r) == 2
    np.testing.assert_array_equal(np.asarray(idx[:3]), [2, 5, 11])
    assert np.all(np.asarray(idx[3:]) == N)
    idx, r = aset.remove(idx, 2, N)
    assert int(r) == 0
    np.testing.assert_array_equal(np.asarray(idx[:2]), [5, 11])


def test_exhaustive_random_sequence():
    rng = np.random.RandomState(0)
    idx = aset.empty(N, N)
    model = []
    for _ in range(200):
        v = int(rng.randint(0, N))
        if v in model:
            idx, r = aset.remove(idx, v, N)
            assert int(r) == model.index(v)
            model.remove(v)
        elif len(model) < N:
            idx, r = aset.insert(idx, v, N)
            mr = model_insert(model, v)
            assert int(r) == mr
        np.testing.assert_array_equal(
            np.asarray(idx[: len(model)]), np.array(model))
        assert np.all(np.asarray(idx[len(model):]) == N)


def test_rank_at():
    idx = aset.empty(CAP, N)
    for v in [5, 2, 11]:
        idx, _ = aset.insert(idx, v, N)
    assert int(aset.rank_at(idx, 0)) == 2
    assert int(aset.rank_at(idx, 2)) == 11
