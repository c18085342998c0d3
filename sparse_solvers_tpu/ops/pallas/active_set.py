"""Fused active-set update kernel — the homotopy iteration's entire
small-state transition in one VMEM-resident Pallas kernel.

Per lane and iteration, the XLA formulation of the fast path performs
~15 separate ops over the (k_max, k_max) inverse + Gram companions
(branch selects from the vmapped lax.cond, swap/border writes, rank-1
update, two small matvecs, layout copies) — each a full HBM round trip of
the per-lane state, ~1 ms/iteration at batch 256, k_max 129. This kernel
performs the whole transition with the state resident in VMEM, reading
and writing HBM exactly once:

    inputs:  inv, gk (b,k,k); c_act, d_act, u1 (b,k); indices (b,k);
             kk, idx, present, live, gamma, vtv, c_new (b,) scalars;
             tol, sentinel
    updates: c_act ← c_act − γ·(gk @ d_act)           (slot recurrence)
             insert (append at slot k) or remove (swap-with-last +
             Schur downdate) on inv and gk            (linalg/online_inverse)
             c_act/indices kept in lockstep; inserted slot's correlation
             set to c_new
             d_act ← inv @ sign_deadzone(c_act, tol)  (direction)
    frozen lanes (live=False) pass through untouched.

Grid: one program per tile of L lanes; each program loops its lanes with
the per-lane state block in VMEM and scalar controls in SMEM.

The update math is identical to linalg/online_inverse.{insert,remove}
_unordered (reference: src/linalg/online_inverse.h:184-293) — the kernel
is a scheduling fusion, not a new algorithm. solvers/homotopy_batch.py
uses it on TPU; everywhere else the XLA formulation runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_TILE = 8  # lanes per grid program


def _matvec(M, v, K):
    """(K,K) @ (K,) on the MXU at HIGHEST precision."""
    return jax.lax.dot_general(
        M, v.reshape(K, 1), (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).reshape(K)


def _kernel(kk_ref, idx_ref, present_ref, live_ref,   # SMEM (b,) full
            gamma_ref, vtv_ref, cnew_ref,             # SMEM (b,) full
            tol_ref, sent_ref,                        # SMEM (1,)
            inv_ref, gk_ref, c_act_ref, d_act_ref,    # VMEM blocks
            u1_ref, ind_ref,
            inv_out, gk_out, c_act_out, d_act_out, ind_out):
    L = inv_ref.shape[0]
    K = inv_ref.shape[1]
    base = pl.program_id(0) * L  # global lane offset for the SMEM scalars
    tol = tol_ref[0]
    sentinel = sent_ref[0]

    # pass-through defaults (frozen lanes keep their state)
    inv_out[...] = inv_ref[...]
    gk_out[...] = gk_ref[...]
    c_act_out[...] = c_act_ref[...]
    d_act_out[...] = d_act_ref[...]
    ind_out[...] = ind_ref[...]

    slots = lax.broadcasted_iota(jnp.int32, (K, 1), 0).reshape(K)

    def lane(l, _):
        g = base + l

        @pl.when(live_ref[g] != 0)
        def _():
            k = kk_ref[g]
            idx = idx_ref[g]
            gamma = gamma_ref[g]

            inv = inv_ref[l]          # (K, K)
            gk = gk_ref[l]
            c_act = c_act_ref[l]      # (K,)
            d_act = d_act_ref[l]
            u1 = u1_ref[l]
            ind = ind_ref[l]

            # slot-space correlation recurrence
            c_act = c_act - gamma * _matvec(gk, d_act, K)

            def do_remove(_):
                # idx occurs in exactly one live slot: its position is the
                # masked slot-id sum (Mosaic has no int argmax). All
                # dynamic row/col extractions are masked reductions —
                # dynamic_slice of kernel *values* has no TPU lowering.
                pos = jnp.sum(jnp.where(ind == idx, slots, 0),
                              dtype=jnp.int32)
                last = k - 1
                is_pos = slots == pos
                is_last = slots == last

                def swap_mat(M):
                    rp = jnp.sum(jnp.where(is_pos[:, None], M, 0.0),
                                 axis=0)
                    rl = jnp.sum(jnp.where(is_last[:, None], M, 0.0),
                                 axis=0)
                    M = jnp.where(is_pos[:, None], rl[None, :],
                                  jnp.where(is_last[:, None], rp[None, :],
                                            M))
                    cp = jnp.sum(jnp.where(is_pos[None, :], M, 0.0),
                                 axis=1)
                    cl = jnp.sum(jnp.where(is_last[None, :], M, 0.0),
                                 axis=1)
                    return jnp.where(is_pos[None, :], cl[:, None],
                                     jnp.where(is_last[None, :],
                                               cp[:, None], M))

                def swap_vec(v, fill, zero):
                    vp = jnp.sum(jnp.where(is_pos, v, zero), dtype=v.dtype)
                    vl = jnp.sum(jnp.where(is_last, v, zero), dtype=v.dtype)
                    s = jnp.where(is_pos, vl, jnp.where(is_last, vp, v))
                    return jnp.where(slots < last, s, fill)

                p = swap_mat(inv)
                d0 = jnp.sum(jnp.where(is_last[:, None] & is_last[None, :],
                                       p, 0.0))
                u = jnp.where(slots < last,
                              jnp.sum(jnp.where(is_last[None, :], p, 0.0),
                                      axis=1), 0.0)
                inv2 = p - jnp.outer(u, u) / d0
                keep2 = (slots < last)[:, None] & (slots < last)[None, :]
                inv2 = jnp.where(keep2, inv2, 0.0)
                gk2 = jnp.where(keep2, swap_mat(gk), 0.0)
                c2 = swap_vec(c_act, 0.0, 0.0)
                ind2 = swap_vec(ind, sentinel, 0)
                return inv2, gk2, c2, ind2, last

            def do_insert(_):
                u2 = _matvec(inv, u1, K)
                d0 = 1.0 / (vtv_ref[g] - jnp.sum(u1 * u2))
                inv2 = inv + d0 * jnp.outer(u2, u2)
                is_k = slots == k
                border = jnp.where(is_k, d0, -d0 * u2)
                inv2 = jnp.where(is_k[:, None], border[None, :],
                                 jnp.where(is_k[None, :], border[:, None],
                                           inv2))
                grow = jnp.where(is_k, vtv_ref[g], u1)
                gk2 = jnp.where(is_k[:, None], grow[None, :],
                                jnp.where(is_k[None, :], grow[:, None], gk))
                c2 = jnp.where(is_k, cnew_ref[g], c_act)
                ind2 = jnp.where(is_k, idx, ind)
                return inv2, gk2, c2, ind2, k + 1

            inv2, gk2, c2, ind2, _k2 = lax.cond(
                present_ref[g] != 0, do_remove, do_insert, 0)

            sgn = jnp.where(c2 > tol, 1.0, jnp.where(c2 < -tol, -1.0, 0.0))
            ds = _matvec(inv2, sgn, K)

            inv_out[l] = inv2
            gk_out[l] = gk2
            c_act_out[l] = c2
            d_act_out[l] = ds
            ind_out[l] = ind2

        return 0

    lax.fori_loop(0, L, lane, 0)


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

    smem_f = pl.BlockSpec(memory_space=pltpu.SMEM)  # full array
    vmem2 = pl.BlockSpec((L, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vmem3 = pl.BlockSpec((L, K, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(bp // L,),
        in_specs=[smem_f, smem_f, smem_f, smem_f, smem_f, smem_f, smem_f,
                  smem_f, smem_f,
                  vmem3, vmem3, vmem2, vmem2, vmem2, vmem2],
        out_specs=(vmem3, vmem3, vmem2, vmem2, vmem2),
        out_shape=(
            jax.ShapeDtypeStruct((bp, K, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.float32),
            jax.ShapeDtypeStruct((bp, K), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(kk.astype(jnp.int32), idx.astype(jnp.int32),
      present.astype(jnp.int32), live.astype(jnp.int32),
      gamma, vtv, c_new,
      jnp.full((1,), tol, jnp.float32),
      jnp.full((1,), sentinel, jnp.int32),
      inv, gk, c_act, d_act, u1, indices.astype(jnp.int32))

    inv2, gk2, c2, ds2, ind2 = out
    # kk transition is trivial arithmetic — done here, not in the kernel
    # (scalar VMEM stores are unsupported)
    kk2 = jnp.where(live, jnp.where(present, kk - 1, kk + 1), kk)
    if pad:
        inv2, gk2 = inv2[:b], gk2[:b]
        c2, ds2, ind2, kk2 = c2[:b], ds2[:b], ind2[:b], kk2[:b]
    return inv2, gk2, c2, ds2, ind2, kk2
