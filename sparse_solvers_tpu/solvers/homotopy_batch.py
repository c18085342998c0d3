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

Status (measured on one v5e, b=256, 4096×8192, k=64): the vmapped
per-lane core remains the fastest formulation (~175 ms/batch) and is the
default. This driver's two alternative bodies are kept as measured
baselines for future work: the fused Pallas kernel path (~1.5 ms/
transition — VMEM pass count exceeds XLA's fusion) and the XLA path with
a batch-level insert-only branch (~45 ms/iteration — the data-dependent
lax.cond inside the while_loop forces operand copies and defeats XLA's
fusion, costing far more than the per-lane branch select it avoids).
Both are exact: they match the vmap core iteration-for-iteration in the
test suite. Opt-in via SS_BATCH_NATIVE=1.
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
        gk=(jnp.zeros((b, K, K), dtype).at[bidx, 0, 0].set(vtv0)
            if use_kernel else jnp.zeros((b, 1, 1), dtype)),
        c_act=(zK.at[:, 0].set(_take1(C0, idx0)) if use_kernel
               else jnp.zeros((b, 1), dtype)),
        d_act=(zK.at[:, 0].set(ds0) if use_kernel
               else jnp.zeros((b, 1), dtype)),
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

        if use_kernel:
            inv1, gk1, c_act1, d_act1, ind1, kk1 = _ak.active_set_update(
                s.inv, s.gk, s.c_act, s.d_act, u1, s.indices, s.kk, idx,
                present, live, gamma, vtv, c_new, tol, n,
                interpret=interpret)
            d1 = jnp.zeros((b, n), dtype).at[bidx[:, None], ind1].set(
                d_act1, mode="drop")
        else:
            # XLA path with a BATCH-LEVEL branch: when no live lane
            # removes this iteration (the overwhelmingly common case —
            # pure-insertion paths never remove), run an insert-only body
            # with no per-lane cond at all. This is the one thing vmap of
            # a per-lane solver cannot express: under vmap, lax.cond
            # always computes both branches and pays a batched select
            # over the (b,K,K) state.
            import sparse_solvers_tpu.linalg.online_inverse as oinv

            def lane_state(inv, ind, kk):
                return oinv.InverseState(
                    inv=inv, indices=ind,
                    mask=jnp.zeros((n,), bool),  # unused by unordered ops
                    k=kk)

            def do_insert_only(ops):
                inv, ind, kk, u1_, idx_, vtv_, pr_ = ops
                def one(inv_l, ind_l, kk_l, u1_l, idx_l, vtv_l):
                    st = oinv.insert_unordered(
                        lane_state(inv_l, ind_l, kk_l), idx_l, u1_l, vtv_l)
                    return st.inv, st.indices, st.k
                return jax.vmap(one)(inv, ind, kk, u1_, idx_, vtv_)

            def do_full(ops):
                inv, ind, kk, u1_, idx_, vtv_, pr_ = ops
                def one(inv_l, ind_l, kk_l, u1_l, idx_l, vtv_l, pr_l):
                    st0 = lane_state(inv_l, ind_l, kk_l)
                    st = lax.cond(
                        pr_l,
                        lambda a, _u, _v: oinv.remove_unordered(a, idx_l),
                        lambda a, u, v: oinv.insert_unordered(a, idx_l,
                                                              u, v),
                        st0, u1_l, vtv_l)
                    return st.inv, st.indices, st.k
                return jax.vmap(one)(inv, ind, kk, u1_, idx_, vtv_, pr_)

            ops = (s.inv, s.indices, s.kk, u1, idx, vtv, present)
            inv_n, ind_n, kk_n = lax.cond(
                jnp.any(present & live), do_full, do_insert_only, ops)

            # freeze: lanes not live keep their state untouched
            lv1 = live[:, None]
            lv2 = live[:, None, None]
            inv1 = jnp.where(lv2, inv_n, s.inv)
            ind1 = jnp.where(lv1, ind_n, s.indices)
            kk1 = jnp.where(live, kk_n, s.kk)
            gk1, c_act1, d_act1 = s.gk, s.c_act, s.d_act  # dummies

            # direction: gather c at the (new) support, sign, small
            # matvec, scatter (homotopy-cpu.cpp:257-266)
            safe1 = jnp.minimum(ind1, n - 1)
            cg = jnp.where(ind1 < n,
                           jnp.take_along_axis(c1, safe1, axis=1),
                           jnp.array(0, dtype))
            sg = _sign_deadzone(cg, tol)
            ds = jnp.einsum("bij,bj->bi", inv1, sg,
                            precision=blas.current_precision())
            d1 = jnp.zeros((b, n), dtype).at[bidx[:, None], ind1].set(
                ds, mode="drop")
            d1 = jnp.where(lv1, d1, s.d)  # frozen lanes keep direction
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
