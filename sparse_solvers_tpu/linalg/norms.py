"""Norms and normalization. Reference: src/linalg/norms.h:22-33 and the
``inf_norm`` helpers of the homotopy solver (src/solvers/homotopy-cpu.cpp:32-44).
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_columns(A: jnp.ndarray) -> jnp.ndarray:
    """Normalize each column of A by its L1 norm (norms.h l1(ndspan<T,2>))."""
    sums = jnp.sum(jnp.abs(A), axis=0)
    return A / sums


def l1_vector(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize a vector by its L1 norm (norms.h l1(ndspan<T,1>))."""
    return x / jnp.sum(jnp.abs(x))


def inf_norm_with_index(v: jnp.ndarray):
    """(‖v‖∞, index of first max-|v| element).

    Reference: homotopy-cpu.cpp:32-44 — ixamax returns the *first* index of
    the maximum absolute value, which the homotopy tie-breaking relies on;
    jnp.argmax has the same first-occurrence semantics.
    """
    idx = jnp.argmax(jnp.abs(v))
    return jnp.abs(v[idx]), idx


def inf_norm(v: jnp.ndarray):
    return jnp.max(jnp.abs(v))
