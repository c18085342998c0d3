"""Homotopy ℓ₁-minimization solver — TPU-native path-following.

Solves  min ‖x‖₁  s.t.  A x = y  by following the homotopy path of
  min_x ‖y − Ax‖₂² + λ‖x‖₁  as λ ↓ tolerance,
maintaining the active-set Gram inverse (A_ΓᵀA_Γ)⁻¹ incrementally.

Algorithmic parity target: the reference CPU solver
(reference: src/solvers/homotopy-cpu.cpp:186-275), including its exact
semantic quirks —
  * leftmost-minimum tie-break in the γ-candidate scan (:156-160),
  * sign deadzone at the solve tolerance (:59-67),
  * the *initial* direction uses sign(‖c‖∞) — i.e. +1 — not sign(c_idx)
    (:223-224),
  * do-while iteration semantics and the K==0 early break (:236-272),
  * report = {iter, solution_error = final ‖c‖∞} (:274).

TPU-native design (vs. the reference's dynamically-sized C++ loop):
  * the whole path loop is one ``lax.while_loop`` over fixed-shape state —
    the active set is a fixed-capacity sorted index vector + boolean mask
    (linalg/active_set.py) and the Gram inverse a zero-padded buffer
    (linalg/online_inverse.py);
  * the O(N) serial γ scan (:130-161) becomes a vectorized candidate
    computation + first-occurrence argmin reduction;
  * the per-iteration matvecs run on the MXU at HIGHEST precision; batching
    over many signals is ``vmap`` (each lane carries its own support state);
  * insert/remove of a support column is a ``lax.cond`` over the two masked
    rank-1 update paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..linalg import online_inverse as oinv
from ..ops import blas
from ..ops.operators import DenseOperator


class HomotopyReportArrays(NamedTuple):
    """Traced report fields (pytree) — mirrors ss::homotopy_report
    (reference: include/ss/policies.h:25-32)."""
    iter: jnp.ndarray            # uint32
    solution_error: jnp.ndarray  # final ‖c‖∞


class _LoopState(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    c: jnp.ndarray
    c_inf: jnp.ndarray
    direction: jnp.ndarray
    inv: oinv.InverseState
    broke: jnp.ndarray


def _sign_deadzone(v: jnp.ndarray, tol) -> jnp.ndarray:
    """sign with a ±tol deadzone (reference: homotopy-cpu.cpp:59-67)."""
    one = jnp.array(1, v.dtype)
    return jnp.where(v > tol, one, jnp.where(v < -tol, -one, 0))


def _residual_correlation(op, y, x):
    """c = Aᵀ(y − Ax) (reference: homotopy-cpu.cpp:87-98, two gemvs)."""
    return op.rmatvec(y - op.matvec(x))


def _find_max_gamma(q, c, x, direction, c_inf, mask, dtype):
    """Vectorized γ-candidate scan with leftmost-min tie-break.

    Reference: homotopy-cpu.cpp:100-164. For active indices the candidate is
    −x_i/d_i; for inactive ones the two path-crossing terms
    (c_inf ∓ c_i)/(1 ∓ q_i). Candidates must be strictly positive; invalid
    candidates take the dtype max (the reference's running-min init,
    :123). argmin's first-occurrence semantics reproduce the reference's
    "index where the running min last strictly decreased" (= leftmost global
    argmin).
    """
    big = jnp.array(jnp.finfo(dtype).max, dtype)

    t_active = -x / direction
    cand_active = jnp.where((t_active > 0) & (t_active < big), t_active, big)

    dl = 1 - q
    dr = 1 + q
    tl = (c_inf - c) / dl
    tr = (c_inf + c) / dr
    cl = jnp.where((dl != 0) & (tl > 0) & (tl < big), tl, big)
    cr = jnp.where((dr != 0) & (tr > 0) & (tr < big), tr, big)
    cand_inactive = jnp.minimum(cl, cr)

    cand = jnp.where(mask, cand_active, cand_inactive)
    idx = jnp.argmin(cand)
    return cand[idx], idx


def _toggle_support(op, state: oinv.InverseState, col) -> oinv.InverseState:
    """Insert or remove column ``col`` of A from the active set + inverse.

    Reference: homotopy-cpu.cpp:166-183 (inverse_add_or_remove). The insert
    branch needs the Gram row (AᵀA)[:, col] = Aᵀ(A e_col) — one extra gemv —
    which lax.cond skips on removals.
    """
    def do_remove(s):
        return oinv.remove(s, col)

    def do_insert(s):
        u1_full, vtv = op.gram_column(col)
        return oinv.insert(s, col, u1_full, vtv)

    present = state.mask[col]
    return lax.cond(present, do_remove, do_insert, state)


def _update_direction(inv_state: oinv.InverseState, c, tol, n, dtype):
    """direction = expand(inv · sign(c_Γ)) — gather/sign/gemv/scatter.

    Reference: homotopy-cpu.cpp:257-266 (vec_subset → sign → gemv → expand).
    """
    cg = jnp.take(c, inv_state.indices, mode="fill", fill_value=0)
    cg = _sign_deadzone(cg, tol)
    ds = blas.xgemv(inv_state.inv, cg)
    return jnp.zeros((n,), dtype).at[inv_state.indices].set(ds, mode="drop")


def solve_homotopy(A: jnp.ndarray, y: jnp.ndarray, tolerance,
                   max_iterations: int, k_max: int):
    """Run the homotopy solver on a dense on-device A;
    returns (x, HomotopyReportArrays). jit/vmap-safe; ``max_iterations`` and
    ``k_max`` (active-set capacity) are static."""
    return solve_homotopy_core(DenseOperator(A), A.shape[1], y, tolerance,
                               max_iterations, k_max)


def solve_homotopy_core(op, n: int, y: jnp.ndarray, tolerance,
                        max_iterations: int, k_max: int):
    """Homotopy path loop over an abstract sensing operator.

    ``op`` supplies matvec/rmatvec/gram_column (ops/operators.py) — dense on
    one device, or a row-shard with psum reductions inside shard_map. ``n``
    is the global column count (static).
    """
    dtype = op.dtype
    tol = jnp.asarray(tolerance, dtype)

    x0 = jnp.zeros((n,), dtype)

    # --- init (reference: homotopy-cpu.cpp:215-229) ---
    c0 = _residual_correlation(op, y, x0)
    idx0 = jnp.argmax(jnp.abs(c0))
    c_inf0 = jnp.abs(c0[idx0])

    inv0 = _toggle_support(op, oinv.init(k_max, n, dtype), idx0)

    # initial direction: sign(c_inf) * inv[0,0] scattered to idx0 —
    # note sign of the *norm*, not of c[idx0] (homotopy-cpu.cpp:223-227)
    cg0 = _sign_deadzone(c_inf0, tol)
    d0 = jnp.zeros((n,), dtype).at[idx0].set(cg0 * inv0.inv[0, 0])

    init = _LoopState(
        it=jnp.uint32(0), x=x0, c=c0, c_inf=c_inf0, direction=d0,
        inv=inv0, broke=jnp.bool_(False),
    )

    def cond(s: _LoopState):
        # do-while: the body always runs at least once (homotopy-cpu.cpp:236)
        return (s.it == 0) | (
            (~s.broke) & (s.it < jnp.uint32(max_iterations)) & (s.c_inf > tol)
        )

    def body(s: _LoopState) -> _LoopState:
        it = s.it + 1

        # γ scan: q = Aᵀ(A d) (homotopy-cpu.cpp:111-120)
        q = op.rmatvec(op.matvec(s.direction))
        gamma, idx = _find_max_gamma(q, s.c, s.x, s.direction, s.c_inf,
                                     s.inv.mask, dtype)

        inv1 = _toggle_support(op, s.inv, idx)

        def on_empty(_):
            # K == 0 → break before touching x/c (homotopy-cpu.cpp:248-249)
            return _LoopState(it=it, x=s.x, c=s.c, c_inf=s.c_inf,
                              direction=s.direction, inv=inv1,
                              broke=jnp.bool_(True))

        def on_live(_):
            x1 = s.x + gamma * s.direction
            c1 = _residual_correlation(op, y, x1)
            d1 = _update_direction(inv1, c1, tol, n, dtype)
            c_inf1 = jnp.max(jnp.abs(c1))
            return _LoopState(it=it, x=x1, c=c1, c_inf=c_inf1, direction=d1,
                              inv=inv1, broke=jnp.bool_(False))

        return lax.cond(inv1.k == 0, on_empty, on_live, None)

    final = lax.while_loop(cond, body, init)
    report = HomotopyReportArrays(iter=final.it, solution_error=final.c_inf)
    return final.x, report
