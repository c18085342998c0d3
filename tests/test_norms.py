"""Norm tests — analog of reference src/linalg/norms_test.cpp (fixed-value
L1 normalization) plus inf-norm first-occurrence index semantics
(homotopy-cpu.cpp:33-44 ixamax)."""

import numpy as np
import jax.numpy as jnp

from sparse_solvers_tpu.linalg import norms


def test_l1_matrix():
    A = jnp.array([[1.0, 2, 0], [3, 4, 1]], jnp.float32)
    out = np.asarray(norms.l1_columns(A))
    expect = np.array([[0.25, 0.3333, 0], [0.75, 0.6667, 1]])
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_l1_vector():
    x = jnp.array([1.0, 2, 3, 4, 5, 0], jnp.float32)
    out = np.asarray(norms.l1_vector(x))
    expect = np.array([0.06667, 0.1333, 0.2, 0.2666, 0.3333, 0])
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_inf_norm_with_index_first_occurrence():
    v = jnp.array([1.0, -3.0, 3.0, 2.0])
    nrm, idx = norms.inf_norm_with_index(v)
    assert float(nrm) == 3.0
    assert int(idx) == 1  # first max-|v| element wins (ixamax semantics)
