"""Fused active-set transition kernel — slot-space homotopy state update.

One ``pallas_call`` applies, per lane, the whole post-scan state
transition of a homotopy iteration with the state resident in VMEM:

    c_act ← c_act − γ·(gk @ d_act)                (slot-space correlation
      recurrence: gk = (AᵀA)[Γ,Γ] is kept in lockstep, so the active
      correlations — and therefore their deadzone-signs, which the
      reference recomputes from c every iteration — evolve exactly as
      c[Γ] does, without any (b,K) gather from the n-vector)
    x_act ← x_act + γ·d_act                       (live lanes)
    insert (Sherman–Morrison bordering at slot k) or remove
      (Schur downdate at slot p, last live slot moved into p)
      applied to the padded inverse and to gk     (linalg/online_inverse
      {insert,remove}_unordered; reference: src/linalg/online_inverse.h:
      184-293)
    d_act ← inv′ @ sign_deadzone(c_act′, tol)     (direction,
      reference: homotopy-cpu.cpp:257-266, sign deadzone :59-67)

Sign semantics note: signs must be recomputed from correlation *values*
each iteration — this reference variant's γ-candidate list does not
bound γ by λ, so on noisy paths an active correlation can legitimately
cross zero between support changes (observed on the removal-heavy test
workloads); carrying insert-time signs diverges. The c_act recurrence is
algebraically identical to gathering c[Γ] (restricted to the support,
q[Γ] = (AᵀA)[Γ,Γ]·d[Γ] exactly, since d is supported on Γ).

Design notes (v2 — replaces the round-1 ops/pallas/active_set.py, which
computed both branches for every lane in ~50 VMEM passes and lost to
XLA):

  * the **remove path runs only when some lane in the grid step removes**
    (``pl.when`` on a tile-level reduction) — path-following workloads
    are insert-dominated, so the common grid step pays only the insert
    arithmetic;
  * the insert lands as fused rank-1 *adds* on the (L,K,K) state — exact
    because vacant slots hold zero rows/cols (see the in-kernel note) —
    whose (L,K)/(L,1) ingredients are select-gated per lane, so
    inert-branch NaNs (e.g. the insert's 1/(vᵀv−u1ᵀu2) on a remove lane)
    never reach live state and frozen lanes add exactly zero; (L,K)
    vectors and the remove path keep true selects — never a γ=0
    multiplicative freeze (round-1 advisor findings 1–2);
  * everything is elementwise over (L,K,K)/(L,K) blocks with single-axis
    broadcasts and minor-axis reductions — the Mosaic-safe subset
    established in round 1.

Shapes: K may be arbitrary (Mosaic pads the lane dimension to 128); per-
lane scalars travel as (L,1) f32 columns; slot masks ep/el/ek are f32 0/1
arrays built by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_TILE = 32


def _kernel(scal_ref,                                   # SMEM (2,): sent, tol
            inv_ref, gk_ref, xact_ref, dact_ref, cact_ref, indf_ref, u1_ref,
            ep_ref, el_ref, ek_ref,
            live_ref, doins_ref, dorm_ref, gamma_ref, vtv_ref, cnew_ref,
            idxf_ref,
            inv_out, gk_out, xact_out, dact_out, cact_out, indf_out,
            deg_out):
    sent = scal_ref[0]
    tol = scal_ref[1]
    inv = inv_ref[...]          # (L,K,K) symmetric per lane
    gk = gk_ref[...]
    x = xact_ref[...]           # (L,K)
    d = dact_ref[...]
    ca = cact_ref[...]
    indf = indf_ref[...]
    u1 = u1_ref[...]
    ep = ep_ref[...]            # (L,K) 0/1: slot of the removed coordinate
    el = el_ref[...]            # (L,K) 0/1: last live slot (kk-1)
    ek = ek_ref[...]            # (L,K) 0/1: append slot (kk), empty if full
    live = live_ref[...]        # (L,1) 0/1
    doins = doins_ref[...]      # (L,1) 0/1: live & ~present & kk<K
    dorm = dorm_ref[...]        # (L,1) 0/1: live & present
    gamma = gamma_ref[...]      # (L,1)
    vtv = vtv_ref[...]
    cnew = cnew_ref[...]        # (L,1) c′ at the inserted coordinate
    idxf = idxf_ref[...]        # (L,1) toggled coordinate index (f32)

    def mv(M, v):
        """Per-lane symmetric matvec (L,K,K)@(L,K)→(L,K): minor-axis
        reduction (the Mosaic-reliable direction)."""
        return jnp.sum(M * v[:, None, :], axis=2)

    def dot1(a, b):
        return jnp.sum(a * b, axis=1, keepdims=True)

    def col3(m):  # (L,1) 0/1 → (L,K,K) bool
        return (m[:, :, None] + jnp.zeros_like(inv)) > 0.5

    # ---- degenerate-insert guard -------------------------------------
    # den = vᵀv − u1ᵀB u1 is the Schur complement of the bordered Gram —
    # the squared distance of the inserted column from span(A_Γ). When
    # the support approaches rank deficiency (e.g. |Γ| → m on thrashy
    # noise paths) the true den → 0 and the f32-computed value is
    # rounding noise (possibly ≤ 0); the reference divides by it
    # unguarded (online_inverse.h:219, 1/(vᵀv−u1ᵀu2)) and its arithmetic
    # degenerates to inf/NaN. Such a lane breaks cleanly instead
    # (solution intact, honest error > tol) via the deg flag. The guard
    # is the narrowest that keeps 1/den finite: |den| above subnormal
    # scale. Tiny and even *negative* dens proceed exactly as the
    # reference's arithmetic does — coherent dictionaries legitimately
    # produce noise-level dens whose garbage-ish inverse still converges
    # (the per-iteration sign recomputation self-corrects); actual
    # overflow to inf/NaN downstream is caught by the driver's per-lane
    # finiteness break (homotopy_batch.py).
    u2 = mv(inv, u1)
    den = vtv - dot1(u1, u2)
    tiny = 256 * 1.1754944e-38  # 256*finfo(f32).tiny — same threshold
    # as the core engine and csrc (engines must agree on the break)
    okins = jnp.where(jnp.abs(den) > tiny, 1.0, 0.0)
    okl = 1.0 - doins * (1.0 - okins)   # (L,1) 1 unless a bad insert
    live = live * okl
    doins = doins * okl
    deg_out[...] = (1.0 - okl)

    lv1 = (live + jnp.zeros_like(x)) > 0.5

    # slot-space steps with the pre-toggle labels (homotopy-cpu.cpp:252,
    # :255 restricted to Γ); frozen lanes select their original values
    x1 = jnp.where(lv1, x + gamma * d, x)
    ca1 = jnp.where(lv1, ca - gamma * mv(gk, d), ca)

    # ---- insert: bordering at slot k (online_inverse.h:184-251) ----
    # The driver maintains an empty-slot invariant (init, remove's
    # vswap, and the ladder embed all leave vacant slots with zero
    # rows/cols in inv/gk, u1 = 0, c_act = 0, index = sentinel), so the
    # bordered update collapses algebraically to fused rank-1 forms
    # with bit-identical entries:
    #     inv′ = inv + d·(u2 − e_k)⊗(u2 − e_k)
    #     gk′  = gk + u1⊗e_k + e_k⊗(u1 + vtv·e_k)
    # (diagonal: d and vtv; border: −d·u2 and u1; interior: +d·u2u2ᵀ —
    # exactly online_inverse.h:219-251). This runs in ~⅓ of the VMEM
    # passes of the blend/select formulation it replaces. Non-insert
    # and frozen lanes add exactly zero: the (L,K)/(L,1) ingredients
    # are select-gated below, which also keeps 0·NaN off broken lanes'
    # state (round-1 advisor finding — never freeze by multiplication).
    # di stays bounded even on remove lanes (|den| ≈ 0 there).
    di = 1.0 / jnp.where(jnp.abs(den) > tiny, den, 1.0)
    ins = doins > 0.5                       # (L,1)
    sv = jnp.where(ins, u2 - ek, 0.0)       # (L,K)
    giv = jnp.where(ins, di, 0.0)           # (L,1)
    u1g = jnp.where(ins, u1, 0.0)
    vtvg = jnp.where(ins, vtv, 0.0)
    inv_out[...] = inv + (giv * sv)[:, :, None] * sv[:, None, :]
    gk_out[...] = (gk + u1g[:, :, None] * ek[:, None, :]
                   + ek[:, :, None] * (u1g + vtvg * ek)[:, None, :])
    # slot k's ca1 is exactly 0 on insert lanes (zero gk row, zero ca),
    # so appending c′ is an add; likewise indf[k] = sentinel and the
    # integer arithmetic below is exact for n < 2²⁴ (kernel-wide guard)
    cact_out[...] = (jnp.where(lv1, ca1, ca)
                     + jnp.where(ins, cnew, 0.0) * ek)
    indf_out[...] = indf + jnp.where(ins, idxf - sent, 0.0) * ek
    xact_out[...] = x1

    # ---- remove: Schur downdate at p, then move last slot into p ----
    # (online_inverse.h:253-293, swap formulation); runs only when a lane
    # in this tile removes
    @pl.when(jnp.max(dorm) > 0.5)
    def _():
        rm1 = (dorm + jnp.zeros_like(x)) > 0.5
        rm3 = col3(dorm)
        bvec = (1.0 - ep) * (1.0 - el)
        same = dot1(ep, el)                  # 1 iff p == kk-1
        # p == l (removing the last live slot): the slot is simply
        # dropped — folding the gate into the ep vector keeps every
        # broadcast single-axis (Mosaic constraint) and is idempotent in
        # the quadratic term (0/1 mask)
        epm = ep * (1.0 - same)

        def move_last_to_p(M):
            """Zero rows/cols p and l, then place M's row/col l at p
            (diagonal (p,p) ← M[l,l]); no-op move when p == l."""
            rl = mv(M, el)
            dll = dot1(el, rl)
            rl2 = rl * bvec + epm * dll
            return (M * bvec[:, :, None] * bvec[:, None, :]
                    + epm[:, :, None] * rl2[:, None, :]
                    + epm[:, None, :] * rl2[:, :, None]
                    - (epm * dll)[:, :, None] * epm[:, None, :])

        rp = mv(inv, ep)                     # column p (= row p: symmetric)
        dpp = dot1(ep, rp)
        bd = inv - (rp / dpp)[:, :, None] * rp[:, None, :]
        inv_rm = move_last_to_p(bd)          # bd's row/col p are zero
        gk_rm = move_last_to_p(gk)           # gk row/col p just dropped

        def vswap(v, fill):
            vl = dot1(el, v)
            return v * bvec + (1.0 - same) * ep * vl + el * fill

        inv_out[...] = jnp.where(rm3, inv_rm, inv_out[...])
        gk_out[...] = jnp.where(rm3, gk_rm, gk_out[...])
        xact_out[...] = jnp.where(rm1, vswap(x1, 0.0), xact_out[...])
        cact_out[...] = jnp.where(rm1, vswap(ca1, 0.0), cact_out[...])
        indf_out[...] = jnp.where(rm1, vswap(indf, sent), indf_out[...])

    # ---- direction from the post-toggle state (homotopy-cpu.cpp:257-266)
    ca2 = cact_out[...]
    sgn = jnp.where(ca2 > tol, 1.0, jnp.where(ca2 < -tol, -1.0, 0.0))
    ds = mv(inv_out[...], sgn)
    dact_out[...] = jnp.where(lv1, ds, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def transition(inv, gk, x_act, d_act, c_act, indices, u1, idx, kk, gamma,
               vtv, cnew, live, doins, dorm, tol, sentinel: int,
               interpret: bool = False):
    """Apply one batched homotopy transition.

    inv/gk: (b,K,K) f32; x_act/d_act/c_act/u1: (b,K) f32; indices: (b,K)
    int32; idx/kk: (b,) int32; gamma/vtv/cnew: (b,) f32; live/doins/dorm:
    (b,) bool; tol: f32 scalar. Returns (inv′, gk′, x_act′, d_act′,
    c_act′, indices′, degenerate) where ``degenerate`` is a (b,) bool —
    the lane's insert had a noise-level Schur complement and its state
    was left untouched (the caller should break the lane).
    """
    b, K = x_act.shape
    L = _LANE_TILE
    pad = (-b) % L
    if pad:
        z = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        (inv, gk, x_act, d_act, c_act, indices, u1, idx, kk, gamma, vtv,
         cnew) = map(z, (inv, gk, x_act, d_act, c_act, indices, u1, idx,
                         kk, gamma, vtv, cnew))
        live, doins, dorm = (jnp.pad(live, (0, pad)),
                             jnp.pad(doins, (0, pad)),
                             jnp.pad(dorm, (0, pad)))
    bp = b + pad

    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    f32 = jnp.float32
    ep = ((indices == idx[:, None]) & dorm[:, None]).astype(f32)
    el = (slots == (kk - 1)[:, None]).astype(f32)
    ek = (slots == kk[:, None]).astype(f32)
    col = lambda a: a.astype(f32)[:, None]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    v1 = pl.BlockSpec((L, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((L, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v3 = pl.BlockSpec((L, K, K), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(bp // L,),
        in_specs=[smem, v3, v3, v2, v2, v2, v2, v2, v2, v2, v2,
                  v1, v1, v1, v1, v1, v1, v1],
        out_specs=(v3, v3, v2, v2, v2, v2, v1),
        out_shape=(
            jax.ShapeDtypeStruct((bp, K, K), f32),
            jax.ShapeDtypeStruct((bp, K, K), f32),
            jax.ShapeDtypeStruct((bp, K), f32),
            jax.ShapeDtypeStruct((bp, K), f32),
            jax.ShapeDtypeStruct((bp, K), f32),
            jax.ShapeDtypeStruct((bp, K), f32),
            jax.ShapeDtypeStruct((bp, 1), f32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=16 * bp * K * K, bytes_accessed=16 * bp * K * K,
            transcendentals=0),
        # update the state in place: without aliasing XLA round-trips the
        # two (b,K,K) buffers HBM<->VMEM every iteration (~0.7 ms/iter at
        # the headline config, benchmarks/results/profile_headline.json)
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
        interpret=interpret,
    )(jnp.asarray([sentinel, tol], f32),
      inv, gk, x_act, d_act, c_act, indices.astype(f32), u1,
      ep, el, ek,
      col(live), col(doins), col(dorm),
      gamma[:, None].astype(f32), vtv[:, None].astype(f32),
      cnew[:, None].astype(f32),
      idx.astype(f32)[:, None])

    inv2, gk2, x2, d2, ca2, indf2, degf = out
    ind2 = indf2.astype(jnp.int32)
    deg = degf[:, 0] > 0.5
    if pad:
        inv2, gk2, x2, d2, ca2, ind2, deg = (
            inv2[:b], gk2[:b], x2[:b], d2[:b], ca2[:b], ind2[:b], deg[:b])
    return inv2, gk2, x2, d2, ca2, ind2, deg
