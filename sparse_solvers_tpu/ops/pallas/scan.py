"""Fused γ-candidate scan kernel — the homotopy step-size search.

The reference's ``find_max_gamma`` is a serial O(N) scan over three
candidate-term lists with left-most-minimum tie-breaking
(reference: src/solvers/homotopy-cpu.cpp:100-164). The batched XLA form
(solvers/homotopy_batch.py round 1) materialized the full (b, n) candidate
array, ran a separate argmin, then a take_along_axis — measured ~320 µs of
fusion plus gather per iteration at b=256, n=8192 (benchmarks/results/
profile_headline.json). This kernel streams q and c tile-by-tile, keeps a
per-lane running (min, leftmost-position) pair in VMEM scratch, and folds
the *active-coordinate* candidates in slot space at the last tile — so the
solver never needs x or the direction materialized over n at all:

  inactive i (mask==0):  min of (c_inf−c_i)/(1−q_i), (c_inf+c_i)/(1+q_i)
                         each valid iff denom≠0, 0 < t < FLT_MAX
  active slot s:         −x_act[s]/d_act[s], valid iff 0 < t < FLT_MAX
                         (its tie-break position is indices[s], the
                         coordinate's n-position)

Left-most tie-break: the running pair updates on strictly-smaller value,
or equal value with smaller position — identical to the reference's
"running min last strictly decreased" semantics and to
``jnp.argmin``'s first-occurrence rule on the merged candidate vector
(solvers/homotopy.py:_find_max_gamma). Positions travel as exact f32
(requires n < 2²⁴, asserted by the caller).

When no candidate is valid the outputs are gamma = FLT_MAX, idx = 0 —
the reference's running-min initialization (homotopy-cpu.cpp:123) and the
JAX engines' argmin-of-all-big behavior (engine-contract note in
csrc/sparsesolvers_cpu.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = float(jnp.finfo(jnp.float32).max)  # python float: no traced capture


def _scan_kernel(cinf_ref, xact_ref, dact_ref, indf_ref,
                 q_ref, c_ref, mask_ref,
                 gamma_ref, idxf_ref,
                 rmin, rpos, *, nt: int, n_tiles: int):
    t = pl.program_id(0)
    cinf = cinf_ref[...]                      # (L,1)

    @pl.when(t == 0)
    def _():
        rmin[...] = jnp.full_like(rmin, _BIG)
        rpos[...] = jnp.zeros_like(rpos)

    q = q_ref[...]                            # (L,nt)
    c = c_ref[...]
    # int8 tiles don't support direct cmpi lowering here; widen first
    act = mask_ref[...].astype(jnp.float32) > 0.5   # (L,nt) active?

    dl = 1.0 - q
    dr = 1.0 + q
    tl = (cinf - c) / dl
    tr = (cinf + c) / dr
    cl = jnp.where((dl != 0) & (tl > 0) & (tl < _BIG), tl, _BIG)
    cr = jnp.where((dr != 0) & (tr > 0) & (tr < _BIG), tr, _BIG)
    cand = jnp.where(act, _BIG, jnp.minimum(cl, cr))

    pos = (jnp.float32(t * nt)  # int iota then convert: Mosaic has no f32 iota
           + jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1)
           .astype(jnp.float32))
    m = jnp.min(cand, axis=1, keepdims=True)                    # (L,1)
    p = jnp.min(jnp.where(cand == m, pos, _BIG), axis=1, keepdims=True)

    better = (m < rmin[...]) | ((m == rmin[...]) & (p < rpos[...]))
    rmin[...] = jnp.where(better, m, rmin[...])
    rpos[...] = jnp.where(better, p, rpos[...])

    @pl.when(t == n_tiles - 1)
    def _():
        # fold the active-coordinate candidates (slot space)
        xa = xact_ref[...]                    # (L,K)
        da = dact_ref[...]
        pf = indf_ref[...]                    # (L,K) n-positions as f32
        ta = -xa / da                         # padding slots: 0/0 -> NaN
        ca = jnp.where((ta > 0) & (ta < _BIG), ta, _BIG)
        ma = jnp.min(ca, axis=1, keepdims=True)
        pa = jnp.min(jnp.where(ca == ma, pf, _BIG), axis=1, keepdims=True)

        bet = (ma < rmin[...]) | ((ma == rmin[...]) & (pa < rpos[...]))
        gamma_ref[...] = jnp.where(bet, ma, rmin[...])
        best = jnp.where(bet, pa, rpos[...])
        # no-valid-candidate lanes: position stayed 0 -> idx 0 (reference
        # running-min init)
        idxf_ref[...] = jnp.where(best == _BIG, 0.0, best)


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_max_gamma_fused(q, c, mask_i8, c_inf, x_act, d_act, indices,
                         interpret: bool = False):
    """Batched fused γ scan. q/c: (b,n) f32; mask_i8: (b,n) int8 (1=active);
    c_inf: (b,) f32; x_act/d_act: (b,K) f32; indices: (b,K) int32 (sentinel
    ≥ n for empty slots). Returns (gamma (b,), idx (b,) int32)."""
    b, n = q.shape
    assert n < (1 << 24), "f32 position encoding requires n < 2^24"
    npad = (-n) % 128
    if npad:
        # padded columns are marked active (mask=1) so they can never be
        # candidates; their positions are > any real index
        q = jnp.pad(q, ((0, 0), (0, npad)))
        c = jnp.pad(c, ((0, 0), (0, npad)))
        mask_i8 = jnp.pad(mask_i8, ((0, 0), (0, npad)),
                          constant_values=jnp.int8(1))
        n += npad
    nt = 512 if n % 512 == 0 else 128
    n_tiles = n // nt

    pad = (-b) % 8
    if pad:
        # padded lanes produce gamma=FLT_MAX, idx=0 (no valid candidates)
        z = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        q, c, mask_i8, x_act, d_act, indices = map(
            z, (q, c, mask_i8, x_act, d_act, indices))
        c_inf = jnp.pad(c_inf, (0, pad))
        b += pad

    kern = functools.partial(_scan_kernel, nt=nt, n_tiles=n_tiles)
    const1 = pl.BlockSpec((b, 1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    constK = pl.BlockSpec((b, x_act.shape[1]), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((b, nt), lambda t: (0, t), memory_space=pltpu.VMEM)

    gamma, idxf = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[const1, constK, constK, constK, tile, tile, tile],
        out_specs=(const1, const1),
        out_shape=(jax.ShapeDtypeStruct((b, 1), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((b, 1), jnp.float32),
                        pltpu.VMEM((b, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * n, bytes_accessed=9 * b * n, transcendentals=0),
        interpret=interpret,
    )(c_inf[:, None], x_act, d_act, indices.astype(jnp.float32),
      q, c, mask_i8)
    g, i = gamma[:, 0], idxf[:, 0].astype(jnp.int32)
    return (g[:-pad], i[:-pad]) if pad else (g, i)
