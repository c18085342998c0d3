"""Fused active-set update kernel — the homotopy iteration's entire
small-state transition in one VMEM-resident Pallas kernel.

Per lane and iteration, the XLA formulation of the fast path performs
~15 separate ops over the (k_max, k_max) inverse + Gram companions
(branch selects from the vmapped lax.cond, swap/border writes, rank-1
update, small matvecs, layout copies) — each a full HBM round trip of the
per-lane state, ~1 ms/iteration at batch 256, k_max 129. This kernel
performs the whole transition with the state resident in VMEM, reading
and writing HBM exactly once:

    c_act ← c_act − γ·(gk @ d_act)            (slot recurrence)
    insert (append at slot k) or remove (swap-with-last + Schur
    downdate) applied to inv and gk           (linalg/online_inverse)
    c_act/indices kept in lockstep; inserted slot's value = c_new
    d_act ← inv @ sign_deadzone(c_act, tol)   (direction)

Frozen lanes (live=False) pass through untouched.

Mosaic-lowering strategy — the product of several failed formulations
(see CLAUDE.md): the kernel is *fully lane-vectorized* (no per-lane
fori loop; a serial lane loop loses to XLA's batched ops). Everything is
elementwise arithmetic over (L,K,K)/(L,K) blocks with single-axis
broadcasts plus reductions over the minor (lane) axis only:
  * matvecs become `sum(M * v[:, None, :], axis=2)` — axis-2 reduces;
  * row extraction uses the SYMMETRY of both matrices (inverse and Gram
    are symmetric throughout), so rows are columns: axis-2 reduces again;
  * per-lane scalars are (L,1) rowwise reductions, folded into one vector
    operand of every outer product ((1,1)→(K,K) broadcasts don't lower);
  * slot masks are precomputed by the caller as float 0/1 (L,K) arrays;
  * the insert-vs-remove choice is a jnp.where select (a true select:
    the inert insert path contains 1/0 = inf for remove lanes — a column
    already in the span has zero Schur complement).

The update math is identical to linalg/online_inverse.{insert,remove}
_unordered (reference: src/linalg/online_inverse.h:184-293) — the kernel
is a scheduling fusion, not a new algorithm. solvers/homotopy_batch.py
uses it; off-TPU it runs in interpret mode (tests).

Status: compiles and matches the XLA formulation to ~1e-6 on real TPUs
(b=256, K=129: 1.5 ms/call), but does not yet beat XLA's fused batched
ops (~1 ms for the same transition): computing both branches plus the
mask-blend swaps costs ~50 VMEM passes over the state versus XLA's ~15
fused HBM passes. Kept opt-in (SS_BATCH_NATIVE=1) as the measured
baseline for future pass-reduction work (tile-level `pl.when` skip of
the remove path when no lane in the tile removes; fusing the blend
chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_TILE = 32  # lanes per grid program


def _kernel(tol_ref, sent_ref,                           # SMEM (1,)
            inv_ref, gk_ref,                             # VMEM (L,K,K)
            c_act_ref, d_act_ref, u1_ref, indf_ref,      # VMEM (L,K)
            ep_ref, el_ref, ek_ref, lt_ref,              # VMEM (L,K) 0/1
            live_ref, pres_ref, gamma_ref, vtv_ref,      # VMEM (L,1)
            cnew_ref, idxf_ref,
            inv_out, gk_out, c_act_out, d_act_out, indf_out):
    tol = tol_ref[0]
    sent = sent_ref[0]

    inv = inv_ref[...]        # (L,K,K), symmetric per lane
    gk = gk_ref[...]
    c_act = c_act_ref[...]    # (L,K)
    d_act = d_act_ref[...]
    u1 = u1_ref[...]
    indf = indf_ref[...]
    ep = ep_ref[...]
    el = el_ref[...]
    ek = ek_ref[...]
    lt = lt_ref[...]
    live = live_ref[...]      # (L,1)
    pres = pres_ref[...]
    gamma = gamma_ref[...]
    vtv = vtv_ref[...]

    def mv(M, v):
        """Per-lane symmetric matvec: (L,K,K) @ (L,K) -> (L,K), as an
        axis-2 (minor-axis) reduction — the only reduction direction with
        a reliable Mosaic lowering here."""
        return jnp.sum(M * v[:, None, :], axis=2)

    def dot1(a, b):
        """Per-lane <a,b> -> (L,1)."""
        return jnp.sum(a * b, axis=1, keepdims=True)

    # slot-space correlation recurrence (c_act0 kept for frozen lanes)
    c_act0 = c_act
    c_act = c_act - gamma * mv(gk, d_act)

    # ---- remove path: swap ep<->el (symmetric congruence) + Schur downdate
    def swap_mat(M):
        # rows via symmetry: row_at(mask) == column_at(mask) == mv(M, mask)
        rp = mv(M, ep)
        rl = mv(M, el)
        blend = 1.0 - ep - el
        Mr = (M * blend[:, :, None] + ep[:, :, None] * rl[:, None, :]
              + el[:, :, None] * rp[:, None, :])
        # Mr is row-swapped; its columns come from axis-2 reduces
        cp = jnp.sum(Mr * ep[:, None, :], axis=2)
        cl = jnp.sum(Mr * el[:, None, :], axis=2)
        return (Mr * blend[:, None, :] + ep[:, None, :] * cl[:, :, None]
                + el[:, None, :] * cp[:, :, None])

    def swap_vec(v, fill):
        vp = dot1(ep, v)
        vl = dot1(el, v)
        s = v * (1.0 - ep - el) + ep * vl + el * vp
        return s * lt + (1.0 - lt) * fill

    p = swap_mat(inv)
    pe = mv(p, el)                        # (L,K): p's last live column
    u = pe * lt
    d0 = dot1(el, pe)                     # (L,1): p[last,last]
    ud = u / d0
    keep = lt[:, :, None] * lt[:, None, :]
    inv_rm = (p - ud[:, :, None] * u[:, None, :]) * keep
    gk_rm = swap_mat(gk) * keep
    c_rm = swap_vec(c_act, 0.0)
    ind_rm = swap_vec(indf, sent)

    # ---- insert path: Sherman-Morrison bordering at slot k
    u2 = mv(inv, u1)
    di = 1.0 / (vtv - dot1(u1, u2))       # (L,1)
    u2di = u2 * di
    body = inv + u2di[:, :, None] * u2[:, None, :]
    border = ek * di + (1.0 - ek) * (-u2di)
    eki = ek * di
    blend_k = (1.0 - ek[:, :, None]) * (1.0 - ek[:, None, :])
    inv_in = (body * blend_k + ek[:, :, None] * border[:, None, :]
              + ek[:, None, :] * border[:, :, None]
              - eki[:, :, None] * ek[:, None, :])
    grow = ek * vtv + (1.0 - ek) * u1
    ekv = ek * vtv
    gk_in = (gk * blend_k + ek[:, :, None] * grow[:, None, :]
             + ek[:, None, :] * grow[:, :, None]
             - ekv[:, :, None] * ek[:, None, :])
    cnew = cnew_ref[...]
    idxf = idxf_ref[...]
    c_in = c_act * (1.0 - ek) + ek * cnew
    ind_in = indf * (1.0 - ek) + ek * idxf

    # ---- selects: branch (true select — see module docstring), then
    # live gating against the original state. Predicate masks are built
    # by broadcasting (L,1) columns against (L,K) mask arrays (single-axis
    # broadcasts only).
    pres1 = pres + jnp.zeros_like(c_act)                 # (L,K) f32
    live1 = live + jnp.zeros_like(c_act)
    rm1 = pres1 > 0.5
    lv1 = live1 > 0.5
    # 3-d predicates: broadcast in f32 first (i1 reshapes don't lower)
    rm2 = (pres1[:, :, None] + jnp.zeros_like(inv)) > 0.5
    lv2 = (live1[:, :, None] + jnp.zeros_like(inv)) > 0.5

    inv2 = jnp.where(rm2, inv_rm, inv_in)
    gk2 = jnp.where(rm2, gk_rm, gk_in)
    c2 = jnp.where(rm1, c_rm, c_in)
    ind2 = jnp.where(rm1, ind_rm, ind_in)

    sgn = jnp.where(c2 > tol, 1.0, jnp.where(c2 < -tol, -1.0, 0.0))
    ds = mv(inv2, sgn)

    inv_out[...] = jnp.where(lv2, inv2, inv)
    gk_out[...] = jnp.where(lv2, gk2, gk)
    c_act_out[...] = jnp.where(lv1, c2, c_act0)
    d_act_out[...] = jnp.where(lv1, ds, d_act)
    indf_out[...] = jnp.where(lv1, ind2, indf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def active_set_update(inv, gk, c_act, d_act, u1, indices, kk, idx, present,
                      live, gamma, vtv, c_new, tol, sentinel,
                      interpret: bool = False):
    """Apply one homotopy active-set transition to a batch of lanes.

    Shapes: inv/gk (b,k,k) f32; c_act/d_act/u1 (b,k) f32; indices (b,k)
    int32; kk/idx (b,) int32; present/live (b,) bool; gamma/vtv/c_new (b,)
    f32; tol f32 scalar; sentinel int (dropped-slot index value, = n).
    Returns (inv', gk', c_act', d_act', indices', kk').
    """
    b, K = c_act.shape
    L = _LANE_TILE
    pad = (-b) % L
    if pad:
        z = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        inv, gk, c_act, d_act, u1, indices, kk, idx, gamma, vtv, c_new = (
            map(z, (inv, gk, c_act, d_act, u1, indices, kk, idx, gamma,
                    vtv, c_new)))
        present = jnp.pad(present, (0, pad))
        live = jnp.pad(live, (0, pad))  # padded lanes are frozen
    bp = b + pad

    # slot masks as float 0/1, per-lane scalars as (b,1) columns — the
    # kernel is pure elementwise/reduction arithmetic over these
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    f32 = jnp.float32
    ep = (indices == idx[:, None]).astype(f32)
    el = (slots == (kk - 1)[:, None]).astype(f32)
    ek = (slots == kk[:, None]).astype(f32)
    lt = (slots < (kk - 1)[:, None]).astype(f32)
    col = lambda a: a.astype(f32)[:, None]

    smem_1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem1 = pl.BlockSpec((L, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem2 = pl.BlockSpec((L, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem3 = pl.BlockSpec((L, K, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(bp // L,),
        in_specs=[smem_1, smem_1, vmem3, vmem3,
                  vmem2, vmem2, vmem2, vmem2,
                  vmem2, vmem2, vmem2, vmem2,
                  vmem1, vmem1, vmem1, vmem1, vmem1, vmem1],
        out_specs=(vmem3, vmem3, vmem2, vmem2, vmem2),
        out_shape=(
            jax.ShapeDtypeStruct((bp, K, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.full((1,), tol, f32), jnp.full((1,), sentinel, f32),
      inv, gk, c_act, d_act, u1, indices.astype(f32),
      ep, el, ek, lt,
      col(live), col(present), gamma[:, None], vtv[:, None],
      c_new[:, None], idx.astype(f32)[:, None])

    inv2, gk2, c2, ds2, indf2 = out
    ind2 = indf2.astype(jnp.int32)
    # kk transition is trivial arithmetic — done here, not in the kernel
    # (scalar VMEM stores are unsupported)
    kk2 = jnp.where(live, jnp.where(present, kk - 1, kk + 1), kk)
    if pad:
        inv2, gk2 = inv2[:b], gk2[:b]
        c2, ds2, ind2, kk2 = c2[:b], ds2[:b], ind2[:b], kk2[:b]
    return inv2, gk2, c2, ds2, ind2, kk2
