"""Input-view tests — analog of the reference's ndspan tests
(reference: src/lib_test.cpp:12-118) and the binding's NumPy view-semantics
tests (reference: bindings/python/tests/test_binding.py:31-68): shape
mismatches raise, and non-contiguous NumPy views (row/column slices,
transposes) are consumed correctly.
"""

import numpy as np
import pytest

from sparse_solvers_tpu.utils import ndview


def test_matrix_requires_2d():
    with pytest.raises(ValueError, match="dimensions"):
        ndview.as_matrix(np.zeros(5))
    with pytest.raises(ValueError, match="dimensions"):
        ndview.as_matrix(np.zeros((2, 2, 2)))


def test_vector_requires_1d():
    with pytest.raises(ValueError, match="dimensions"):
        ndview.as_vector(np.zeros((5, 1)))


def test_vector_size_check():
    with pytest.raises(ValueError, match="length"):
        ndview.as_vector(np.zeros(4), size=5)


def test_dtype_follows_input():
    assert ndview.as_matrix(np.zeros((2, 2), np.float32)).dtype == np.float32
    assert ndview.as_matrix(np.zeros((2, 2), np.float64)).dtype == np.float64


def test_noncontiguous_views_roundtrip():
    base = np.arange(40, dtype=np.float64).reshape(5, 8)
    col_view = base[:, 2:6]          # column subset
    row_view = base[1:4, :]          # row subset
    t_view = base.T                  # transpose (non-contiguous)
    for v in (col_view, row_view, t_view):
        out = np.asarray(ndview.as_matrix(v))
        np.testing.assert_array_equal(out, np.ascontiguousarray(v))


def test_strided_vector():
    base = np.arange(10, dtype=np.float64)
    v = base[::2]
    np.testing.assert_array_equal(np.asarray(ndview.as_vector(v)), base[::2])
