"""Fused OMP insert + least-squares kernel — slot-space greedy update.

One ``pallas_call`` applies, per lane, the whole post-pick state update
of a batched OMP iteration (solvers/omp_batch.py) with the (L,K,K)
inverse resident in VMEM and aliased in place:

    insert (Sherman–Morrison bordering at slot k) into the padded
      online inverse                     (linalg/online_inverse.py
      insert_unordered; OMP never removes)
    coef ← inv′ @ b_act                  (the LS re-solve on the grown
      support: x_Γ = (A_ΓᵀA_Γ)⁻¹ A_Γᵀy, algorithms.md §4)

Same design rules as the homotopy transition kernel
(ops/pallas/transition.py — the established Mosaic-safe subset):
elementwise (L,K,K)/(L,K) blocks, single-axis broadcasts, minor-axis
reductions; the insert lands as a fused rank-1 *add* (exact because
vacant slots hold zero rows/cols — the driver's empty-slot invariant);
ingredients are select-gated per lane so inert lanes add exactly zero
and the degenerate-insert 1/den never reaches live state; in-place
input/output aliasing keeps the (b,K,K) buffer out of the per-iteration
HBM round trip XLA's functional update would pay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE_TILE = 32


def _kernel(inv_ref, u1_ref, ek_ref, bact_ref, doins_ref, vtv_ref,
            inv_out, coef_out, deg_out):
    inv = inv_ref[...]          # (L,K,K) symmetric per lane
    u1 = u1_ref[...]            # (L,K)
    ek = ek_ref[...]            # (L,K) 0/1 one-hot of the insert slot
    bact = bact_ref[...]        # (L,K) A_Γᵀy in slot order (appended)
    doins = doins_ref[...]      # (L,1) 0/1 live-insert gate
    vtv = vtv_ref[...]          # (L,1)

    def mv(M, v):
        """Per-lane symmetric matvec (L,K,K)@(L,K)→(L,K): minor-axis
        reduction (the Mosaic-reliable direction)."""
        return jnp.sum(M * v[:, None, :], axis=2)

    def dot1(a, b):
        return jnp.sum(a * b, axis=1, keepdims=True)

    # degenerate-insert guard: den = vᵀv − u1ᵀBu1 is the Schur
    # complement of the bordered Gram; at rank deficiency it is rounding
    # noise and 1/den overflows. Same threshold as every other engine
    # (solvers/omp.py, csrc OnlineInverse::insert).
    u2 = mv(inv, u1)
    den = vtv - dot1(u1, u2)
    tiny = 256 * 1.1754944e-38  # 256*finfo(f32).tiny
    okins = jnp.where(jnp.abs(den) > tiny, 1.0, 0.0)
    gate = doins * okins
    deg_out[...] = doins * (1.0 - okins)

    # bordered insert as one fused rank-1 add (empty-slot invariant:
    # vacant rows/cols are zero, so inv′ = inv + d·(u2−e_k)⊗(u2−e_k)
    # lands border −d·u2, corner d — linalg/online_inverse.py
    # insert_unordered, ops/pallas/transition.py insert path)
    di = 1.0 / jnp.where(jnp.abs(den) > tiny, den, 1.0)
    sv = jnp.where(gate > 0.5, u2 - ek, 0.0)
    giv = jnp.where(gate > 0.5, di, 0.0)
    inv1 = inv + (giv * sv)[:, :, None] * sv[:, None, :]
    inv_out[...] = inv1

    # LS coefficients on the grown support (gated lanes keep their
    # previous inverse, so coef is simply recomputed against it)
    coef_out[...] = mv(inv1, bact)


@functools.partial(jax.jit, static_argnames=("interpret",))
def omp_insert(inv, u1, kk, vtv, b_act, doins, interpret: bool = False):
    """Apply one batched OMP insert + LS re-solve.

    inv: (b,K,K) f32 (updated in place via aliasing); u1: (b,K) f32 —
    (AᵀA)[Γ, idx] over the live slots (sentinel slots zero); kk: (b,)
    int32 insert slot; vtv: (b,) f32; b_act: (b,K) f32 — A_Γᵀy with the
    new entry already written at slot kk; doins: (b,) bool. Returns
    (inv′, coef, degenerate) — ``degenerate`` lanes kept their state
    (the caller breaks them with the previous LS solution intact).
    """
    b, K = u1.shape
    L = _LANE_TILE
    pad = (-b) % L
    if pad:
        z = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        inv, u1, kk, vtv, b_act = map(z, (inv, u1, kk, vtv, b_act))
        doins = jnp.pad(doins, (0, pad))
    bp = b + pad

    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    f32 = jnp.float32
    ek = (slots == kk[:, None]).astype(f32)

    v1 = pl.BlockSpec((L, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v2 = pl.BlockSpec((L, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    v3 = pl.BlockSpec((L, K, K), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(bp // L,),
        in_specs=[v3, v2, v2, v2, v1, v1],
        out_specs=(v3, v2, v1),
        out_shape=(
            jax.ShapeDtypeStruct((bp, K, K), f32),
            jax.ShapeDtypeStruct((bp, K), f32),
            jax.ShapeDtypeStruct((bp, 1), f32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * bp * K * K, bytes_accessed=8 * bp * K * K,
            transcendentals=0),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(inv, u1, ek, b_act,
      doins.astype(f32)[:, None], vtv[:, None].astype(f32))

    inv2, coef, degf = out
    deg = degf[:, 0] > 0.5
    if pad:
        inv2, coef, deg = inv2[:b], coef[:b], deg[:b]
    return inv2, coef, deg
