"""Batch-native homotopy driver — the TPU throughput path.

Semantically identical to ``jax.vmap(solve_homotopy)`` in fast mode (same
updates, same per-lane do-while/freeze semantics — vmap lowers a
while_loop to exactly this shape), but with the batch dimension explicit
so the per-lane small-state transition can run as ONE fused Pallas kernel
(ops/pallas/active_set.py) instead of ~15 vmapped XLA ops. The heavy
A-products are plain batched gemms.

Lane lifecycle: a lane is live while the reference's do-while condition
holds for it (homotopy-cpu.cpp:236); frozen lanes take zero-length steps
and pass through the kernel untouched, so their state is bit-stable until
every lane finishes.

Used by api.Homotopy.solve_batch for fast-mode dense solves with a
precomputed Gram matrix; the vmapped per-lane core remains the engine for
single solves, exact mode, sharding, and CPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import blas, dispatch
from ..ops.pallas import active_set as _ak
from .homotopy import HomotopyReportArrays, _sign_deadzone


class _BState(NamedTuple):
    it: jnp.ndarray        # (b,) uint32 per-lane iteration count
    x: jnp.ndarray         # (b, n)
    c: jnp.ndarray         # (b, n)
    c_inf: jnp.ndarray     # (b,)
    d: jnp.ndarray         # (b, n)
    mask: jnp.ndarray      # (b, n) bool support membership
    inv: jnp.ndarray       # (b, K, K)
    gk: jnp.ndarray        # (b, K, K)
    c_act: jnp.ndarray     # (b, K)
    d_act: jnp.ndarray     # (b, K)
    indices: jnp.ndarray   # (b, K) int32, sentinel n
    kk: jnp.ndarray        # (b,) int32
    broke: jnp.ndarray     # (b,) bool


def _find_max_gamma_batch(q, c, x, d, c_inf, mask, dtype):
    """Batched γ-candidate scan (homotopy.py:_find_max_gamma over axis 1)."""
    big = jnp.array(jnp.finfo(dtype).max, dtype)
    t_active = -x / d
    cand_active = jnp.where((t_active > 0) & (t_active < big), t_active,
                            big)
    dl = 1 - q
    dr = 1 + q
    tl = (c_inf[:, None] - c) / dl
    tr = (c_inf[:, None] + c) / dr
    cl = jnp.where((dl != 0) & (tl > 0) & (tl < big), tl, big)
    cr = jnp.where((dr != 0) & (tr > 0) & (tr < big), tr, big)
    cand = jnp.where(mask, cand_active, jnp.minimum(cl, cr))
    idx = jnp.argmin(cand, axis=1)
    gamma = jnp.take_along_axis(cand, idx[:, None], axis=1)[:, 0]
    return gamma, idx.astype(jnp.int32)


def _take1(M, idx):
    """M[lane, idx[lane]] → (b,)."""
    return jnp.take_along_axis(M, idx[:, None], axis=1)[:, 0]


def solve_homotopy_batch(A: jnp.ndarray, G: jnp.ndarray, Y: jnp.ndarray,
                         tolerance, max_iterations: int, k_max: int,
                         use_kernel: bool | None = None):
    """Fast-mode batched homotopy with a precomputed Gram matrix.

    A: (m, n); G = AᵀA (n, n); Y: (b, m). Returns (X (b, n),
    HomotopyReportArrays with per-lane arrays).
    """
    b, _ = Y.shape
    n = A.shape[1]
    K = k_max
    dtype = A.dtype
    tol = jnp.asarray(tolerance, dtype)
    if use_kernel is None:
        use_kernel = dispatch.backend() == "pallas"
    interpret = not use_kernel
    bidx = jnp.arange(b)

    # --- init (solve_homotopy_core init, batched) ---
    C0 = blas.xgemm(Y, A)                       # c0 = Aᵀy per lane
    idx0 = jnp.argmax(jnp.abs(C0), axis=1).astype(jnp.int32)
    c_inf0 = jnp.abs(_take1(C0, idx0))
    gdiag = jnp.diagonal(G)
    vtv0 = jnp.take(gdiag, idx0)
    cg0 = _sign_deadzone(c_inf0, tol)
    ds0 = cg0 / vtv0                            # sign · (AᵀA)⁻¹ at k=1
    zK = jnp.zeros((b, K), dtype)
    init = _BState(
        it=jnp.zeros(b, jnp.uint32),
        x=jnp.zeros((b, n), dtype),
        c=C0,
        c_inf=c_inf0,
        d=jnp.zeros((b, n), dtype).at[bidx, idx0].set(ds0),
        mask=jnp.zeros((b, n), bool).at[bidx, idx0].set(True),
        inv=jnp.zeros((b, K, K), dtype).at[bidx, 0, 0].set(1 / vtv0),
        gk=jnp.zeros((b, K, K), dtype).at[bidx, 0, 0].set(vtv0),
        c_act=zK.at[:, 0].set(_take1(C0, idx0)),
        d_act=zK.at[:, 0].set(ds0),
        indices=jnp.full((b, K), n, jnp.int32).at[:, 0].set(idx0),
        kk=jnp.ones(b, jnp.int32),
        broke=jnp.zeros(b, bool),
    )

    def lane_live(s: _BState):
        # per-lane do-while (homotopy-cpu.cpp:236)
        return (s.it == 0) | (
            (~s.broke) & (s.it < jnp.uint32(max_iterations))
            & (s.c_inf > tol))

    def body(s: _BState) -> _BState:
        live = lane_live(s)

        q = blas.xgemm(blas.xgemm(s.d, A, trans_b=True), A)
        gamma, idx = _find_max_gamma_batch(q, s.c, s.x, s.d, s.c_inf,
                                           s.mask, dtype)
        present = _take1(s.mask, idx)
        empty = present & (s.kk == 1)
        if k_max <= max_iterations:
            # user-shrunk capacity may overflow; break instead (the
            # kernel's mask-based insert is naturally a no-op at k == K)
            empty = empty | (~present & (s.kk >= k_max))
        gamma = jnp.where(live & ~empty, gamma, jnp.array(0, dtype))

        row = jnp.take(G, idx, axis=0)          # (b, n) contiguous rows
        safe = jnp.minimum(s.indices, n - 1)
        u1 = jnp.where(s.indices < n,
                       jnp.take_along_axis(row, safe, axis=1),
                       jnp.array(0, dtype))
        vtv = jnp.take(gdiag, idx)

        c1 = s.c - gamma[:, None] * q
        x1 = s.x + gamma[:, None] * s.d
        c_new = _take1(c1, idx)

        inv1, gk1, c_act1, d_act1, ind1, kk1 = _ak.active_set_update(
            s.inv, s.gk, s.c_act, s.d_act, u1, s.indices, s.kk, idx,
            present, live, gamma, vtv, c_new, tol, n,
            interpret=interpret)

        d1 = jnp.zeros((b, n), dtype).at[bidx[:, None], ind1].set(
            d_act1, mode="drop")
        mval = jnp.where(live, ~present, present)
        mask1 = s.mask.at[bidx, idx].set(mval)
        c_inf1 = jnp.max(jnp.abs(c1), axis=1)

        return _BState(
            it=s.it + live.astype(jnp.uint32),
            x=x1, c=c1, c_inf=c_inf1, d=d1, mask=mask1,
            inv=inv1, gk=gk1, c_act=c_act1, d_act=d_act1,
            indices=ind1, kk=kk1,
            broke=s.broke | (live & empty),
        )

    final = lax.while_loop(lambda s: jnp.any(lane_live(s)), body, init)
    report = HomotopyReportArrays(iter=final.it,
                                  solution_error=final.c_inf)
    return final.x, report
