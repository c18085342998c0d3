"""CPU baseline — a faithful NumPy/BLAS implementation of the reference
homotopy solver, used by bench.py as the "reference C++ on this machine's
CPU" comparison point.

The reference publishes no benchmark numbers (BASELINE.md), and its C++
build needs submodules that aren't vendored, so the baseline is this
implementation of the same algorithm with the same cost structure
(reference: src/solvers/homotopy-cpu.cpp): per iteration 4 O(MN) gemvs
through the platform BLAS (numpy dot), the incremental O(Km)+O(K²) online
inverse update with a cached A_Γᵀ (online_inverse.h:184-293), and the O(N)
γ scan. It is validated against the oracle/jax solvers by the test suite.
"""

from __future__ import annotations

import numpy as np


def solve(A: np.ndarray, y: np.ndarray, tolerance: float,
          max_iterations: int = 100):
    """Returns (x, iters, c_inf). Single signal, single thread of control."""
    A = np.ascontiguousarray(A)
    y = np.asarray(y)
    dt = A.dtype
    m, n = A.shape

    x = np.zeros(n, dt)
    mask = np.zeros(n, dtype=bool)
    indices: list[int] = []       # ascending active columns (rank_index)
    At = np.empty((0, m), dt)     # A_Γᵀ cache (online_inverse._At)
    inv = np.empty((0, 0), dt)    # (A_ΓᵀA_Γ)⁻¹ in rank order

    def insert(col):
        nonlocal At, inv, indices
        v = A[:, col]
        r = int(np.searchsorted(indices, col))
        k = len(indices)
        if k == 0:
            inv = np.array([[1.0 / (v @ v)]], dt)
        else:
            u1 = At @ v                       # O(Km)
            d = 1.0 / (v @ v - u1 @ (inv @ u1))
            u2 = inv @ u1
            B = inv + d * np.outer(u2, u2)
            new = np.empty((k + 1, k + 1), dt)
            new[:k, :k] = B
            new[:k, k] = -d * u2
            new[k, :k] = -d * u2
            new[k, k] = d
            perm = list(range(r)) + [k] + list(range(r, k))
            inv = new[np.ix_(perm, perm)]
        At = np.insert(At, r, v, axis=0)
        indices.insert(r, col)
        mask[col] = True

    def remove(col):
        nonlocal At, inv, indices
        r = indices.index(col)
        k = len(indices)
        perm = list(range(r)) + list(range(r + 1, k)) + [r]
        p = inv[np.ix_(perm, perm)]
        d = p[-1, -1]
        u = p[:-1, -1]
        inv = p[:-1, :-1] - np.outer(u, u) / d
        At = np.delete(At, r, axis=0)
        indices.pop(r)
        mask[col] = False

    # init (homotopy-cpu.cpp:215-229)
    c = A.T @ y
    idx = int(np.argmax(np.abs(c)))
    c_inf = abs(c[idx])
    insert(idx)
    direction = np.zeros(n, dt)
    direction[idx] = (1.0 if c_inf > tolerance else 0.0) * inv[0, 0]

    big = np.finfo(dt).max
    it = 0
    while True:
        it += 1
        # γ scan (homotopy-cpu.cpp:100-164), vectorized
        p = A @ direction
        q = A.T @ p
        with np.errstate(divide="ignore", invalid="ignore"):
            t_act = -x / direction
            tl = (c_inf - c) / (1.0 - q)
            tr = (c_inf + c) / (1.0 + q)
        cand_act = np.where((t_act > 0) & (t_act < big), t_act, big)
        cl = np.where(((1.0 - q) != 0) & (tl > 0) & (tl < big), tl, big)
        cr = np.where(((1.0 + q) != 0) & (tr > 0) & (tr < big), tr, big)
        cand = np.where(mask, cand_act, np.minimum(cl, cr))
        idx = int(np.argmin(cand))
        gamma = cand[idx]

        if mask[idx]:
            remove(idx)
        else:
            insert(idx)
        if not indices:
            break

        x = x + gamma * direction
        c = A.T @ (y - A @ x)

        cg = c[indices]
        sg = np.zeros_like(cg)
        sg[cg > tolerance] = 1
        sg[cg < -tolerance] = -1
        direction = np.zeros(n, dt)
        direction[indices] = inv @ sg

        c_inf = np.max(np.abs(c))
        if not (it < max_iterations and c_inf > tolerance):
            break

    return x, it, c_inf
