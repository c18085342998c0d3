"""Sensing-matrix operators — the seam between solver math and data layout.

The homotopy loop only touches A through four products (reference call
stack: SURVEY.md §3.2 / src/solvers/homotopy-cpu.cpp):
  * matvec        p = A d            (find_max_gamma :116)
  * rmatvec       c = Aᵀ r           (residual_vector :97, find_max_gamma :120)
  * column        v = A e_j          (inverse insert, :180-181)
  * gram column   g = AᵀA e_j, vᵀv   (online_inverse insert :217-218)

Abstracting these lets the identical while_loop run over
  * a dense single-device matrix (DenseOperator), or
  * a row-shard of A inside ``shard_map``, where every n-sized product ends
    with a ``psum`` over the row axis (RowShardedOperator) — the TPU-native
    replacement for the reference's single-address-space BLAS calls
    (SURVEY.md §2.4: partial correlations per shard + ICI allreduce).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import blas


class DenseOperator(NamedTuple):
    """Plain on-device dense sensing matrix."""
    A: jnp.ndarray

    @property
    def shape(self):
        return self.A.shape

    @property
    def dtype(self):
        return self.A.dtype

    def matvec(self, x):
        return blas.xgemv(self.A, x)

    def rmatvec(self, u):
        return blas.xgemv(self.A, u, trans=True)

    def column(self, j):
        return self.A[:, j]

    def gram_column(self, j):
        """((AᵀA)[:, j], ‖A e_j‖²)."""
        v = self.column(j)
        return self.rmatvec(v), blas.xdot(v, v)

    def gram_weighted(self, w):
        """Aᵀ(A ∘ w) — the IRLS Newton Gram matrix (irls-cpu.cpp:47-48)."""
        return blas.xgemm(self.A, self.A * w, trans_a=True)


class RowShardedOperator(NamedTuple):
    """A row-shard of A inside shard_map: A_local is (m_local, n); every
    reduction over rows finishes with a psum over ``axis``.

    The m-dimension quantities (p = A d, residual r) stay sharded — they are
    only ever consumed by a following rmatvec — so exactly one collective
    (the psum of the n-sized correlation) rides ICI per product, as in the
    SURVEY §2.4 target design.
    """
    A_local: jnp.ndarray
    axis: str

    @property
    def shape(self):
        # logical (global) shape is not recoverable here; callers inside
        # shard_map use n = A_local.shape[1] which is global.
        return self.A_local.shape

    @property
    def dtype(self):
        return self.A_local.dtype

    def matvec(self, x):
        return blas.xgemv(self.A_local, x)  # stays row-sharded

    def rmatvec(self, u_local):
        return lax.psum(blas.xgemv(self.A_local, u_local, trans=True),
                        self.axis)

    def column(self, j):
        return self.A_local[:, j]  # local shard of the column

    def gram_column(self, j):
        v = self.column(j)
        g = lax.psum(blas.xgemv(self.A_local, v, trans=True), self.axis)
        vtv = lax.psum(blas.xdot(v, v), self.axis)
        return g, vtv

    def gram_weighted(self, w):
        return lax.psum(
            blas.xgemm(self.A_local, self.A_local * w, trans_a=True),
            self.axis)
