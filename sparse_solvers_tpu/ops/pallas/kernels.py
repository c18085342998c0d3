"""Pallas TPU kernels — fused single-pass correlation products.

The homotopy loop's two heavy products both stream the sensing matrix
twice when written as a pair of gemms (reference shape: two cblas gemvs,
src/solvers/homotopy-cpu.cpp:87-98 and :111-120):

    q = Aᵀ(A d)        (γ-scan product)
    c = Aᵀ(y − A x)    (residual correlation)

Both have the form  out = Aᵀ f(A · v)  with f elementwise, so a single
pass over A suffices: for each row-tile T of A,

    t_T  = f(A[T, :] · v)          (contraction over n)
    out += A[T, :]ᵀ · t_T          (accumulate over T)

A[T, :] is loaded into VMEM once and used by both products — this halves
HBM traffic versus the two-gemm form, which is the whole ballgame in the
memory-bound regime (small batch; per-device shards). In the large-batch
regime the products are MXU-compute-bound and XLA's two-gemm schedule is
already optimal, so the wrappers fall back to plain XLA there (see
``_eligible``). Batched forms (v → (b, n)) run the same kernel with the
batch resident in VMEM.

Kernels are written against the guide in /opt/skills/guides/pallas_guide.md:
f32 tiles of (8k, 128), grid accumulation into a revisited output block,
``preferred_element_type`` pinned on every MXU dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import blas

# VMEM working-set budget for choosing tile sizes / eligibility (bytes).
# v4/v5e VMEM is large (~128 MiB) but Mosaic's working set for these
# kernels runs ~3x the naive estimate (transposed copies of the A tile,
# sublane-padded accumulators), so the scoped limit is raised explicitly
# and tiles sized against a conservative budget (measured on v5e: tile
# 64-256 compile and run; 1024 exceeds the limit).
_VMEM_BUDGET = 8 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel_precision():
    """Mosaic supports only DEFAULT/HIGHEST dot precision; map the blas
    layer's HIGH to HIGHEST (more accurate, modestly slower)."""
    p = blas.current_precision()
    return lax.Precision.DEFAULT if p == lax.Precision.DEFAULT \
        else lax.Precision.HIGHEST


def _tile_m(n: int, budget: int) -> int:
    """Largest multiple-of-8 row tile with A-tile double buffering in
    budget."""
    t = budget // (2 * 4 * n)
    return max(8, min(256, (t // 8) * 8))


def _eligible(b_pad: int, m: int, n: int, dtype) -> bool:
    """Fused kernel wins in the memory-bound small-batch regime; beyond
    that XLA's two-gemm form (compute-bound) is used. Measured crossover
    on v5e at 4096×8192 (benchmarks/results/kernels_v5e.jsonl): fused
    faster at b=8, parity at b=64, XLA faster at b=256."""
    if dtype != jnp.float32 or n % 128 or b_pad > 64:
        return False
    t = _tile_m(n, _VMEM_BUDGET)
    vm = 2 * (t * n * 4)          # double-buffered A tile
    vm += 2 * (b_pad * n * 4)     # v and out blocks
    vm += b_pad * max(t, 128) * 4  # intermediate t_T
    return vm <= _VMEM_BUDGET + 4 * 1024 * 1024


def _fused_normal_kernel(a_ref, d_ref, q_ref, *, precision):
    """Grid step i: q += A[T_i,:]ᵀ (A[T_i,:] d) — both dots on the MXU."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        q_ref[:] = jnp.zeros_like(q_ref)

    a = a_ref[:]  # (TILE_M, n)
    t = lax.dot_general(d_ref[:], a, (((1,), (1,)), ((), ())),
                        precision=precision,
                        preferred_element_type=jnp.float32)  # (b, TILE_M)
    q_ref[:] += lax.dot_general(t, a, (((1,), (0,)), ((), ())),
                                precision=precision,
                                preferred_element_type=jnp.float32)


def _fused_residual_kernel(a_ref, x_ref, y_ref, c_ref, *, precision):
    """Grid step i: c += A[T_i,:]ᵀ (y[T_i] − A[T_i,:] x)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

    a = a_ref[:]
    r = y_ref[:] - lax.dot_general(x_ref[:], a, (((1,), (1,)), ((), ())),
                                   precision=precision,
                                   preferred_element_type=jnp.float32)
    c_ref[:] += lax.dot_general(r, a, (((1,), (0,)), ((), ())),
                                precision=precision,
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def normal_matvec_fused(A: jnp.ndarray, D: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Q = (D Aᵀ) A in one pass over A. A: (m, n); D: (b, n) → (b, n).

    Falls back to the two-gemm XLA form when the shapes are outside the
    fused kernel's VMEM envelope. Precision follows blas.current_precision
    at trace time.
    """
    b, n = D.shape
    m = A.shape[0]
    b_pad = _round_up(b, 8)
    if not _eligible(b_pad, m, n, A.dtype):
        return blas.xgemm(blas.xgemm(D, A, trans_b=True), A)

    tile_m = _tile_m(n, _VMEM_BUDGET)
    m_pad = _round_up(m, tile_m)
    Ap = jnp.pad(A, ((0, m_pad - m), (0, 0))) if m_pad != m else A
    Dp = jnp.pad(D, ((0, b_pad - b), (0, 0))) if b_pad != b else D

    kern = functools.partial(_fused_normal_kernel,
                             precision=_kernel_precision())
    out = pl.pallas_call(
        kern,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * m_pad * n,
            bytes_accessed=m_pad * n * 4 + 2 * b_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(Ap, Dp)
    return out[:b] if b_pad != b else out


def _fused_normal_bf16_kernel(a_ref, d_ref, q_ref):
    """Grid step i: q += A[T_i,:]ᵀ bf16(A[T_i,:] d), all inputs bf16.

    The f32→bf16 round of the intermediate matches XLA's DEFAULT-precision
    two-gemm schedule (which rounds p = D Aᵀ to bf16 before the second
    MXU pass), so per-element values agree with the one-pass XLA form up
    to f32 accumulation order."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        q_ref[:] = jnp.zeros_like(q_ref)

    a = a_ref[:]  # (TILE_M, n) bf16
    t = lax.dot_general(d_ref[:], a, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (b, TILE_M)
    q_ref[:] += lax.dot_general(t.astype(jnp.bfloat16), a,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)


def _bf16_eligible(b_pad: int, m: int, n: int) -> bool:
    """VMEM envelope for the bf16 single-pass q kernel: double-buffered
    bf16 A tile + bf16 D block + f32 q accumulator + intermediate."""
    if n % 128 or b_pad % 8:
        return False
    t = _tile_m_bf16(n)
    vm = 2 * (t * n * 2) + b_pad * n * 2 + b_pad * n * 4
    vm += b_pad * max(t, 128) * 4
    return vm <= 40 * 1024 * 1024  # ~3x Mosaic factor under _VMEM_LIMIT


def _tile_m_bf16(n: int) -> int:
    t = _VMEM_BUDGET // (2 * 2 * n)
    return max(8, min(512, (t // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def normal_matvec_fused_bf16(A16: jnp.ndarray, D: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Q = bf16(D Aᵀ) A in ONE pass over a bf16 sensing matrix.

    A16: (m, n) bfloat16; D: (b, n) f32 (rounded to bf16 on entry, as
    XLA's DEFAULT precision would) → Q: (b, n) f32. The one-pass-regime
    form of ``normal_matvec_fused``: at DEFAULT MXU precision the
    two-gemm schedule is HBM-bound on two reads of A; streaming the
    bf16 copy once halves that (reference product:
    src/solvers/homotopy-cpu.cpp:111-120).
    """
    b, n = D.shape
    m = A16.shape[0]
    b_pad = _round_up(b, 8)
    D16 = D.astype(jnp.bfloat16)
    if A16.dtype != jnp.bfloat16 or not _bf16_eligible(b_pad, m, n):
        Af = A16.astype(D.dtype)
        return blas.xgemm(blas.xgemm(D, Af, trans_b=True), Af)

    tile_m = _tile_m_bf16(n)
    m_pad = _round_up(m, tile_m)
    Ap = jnp.pad(A16, ((0, m_pad - m), (0, 0))) if m_pad != m else A16
    Dp = jnp.pad(D16, ((0, b_pad - b), (0, 0))) if b_pad != b else D16

    out = pl.pallas_call(
        _fused_normal_bf16_kernel,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * m_pad * n,
            bytes_accessed=m_pad * n * 2 + 3 * b_pad * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(Ap, Dp)
    return out[:b] if b_pad != b else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def residual_correlation_fused(A: jnp.ndarray, X: jnp.ndarray,
                               Y: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """C = Aᵀ(Y' − X Aᵀ)' per batch row in one pass over A.

    A: (m, n); X: (b, n); Y: (b, m) → C: (b, n). Zero rows added by
    padding change nothing (their residual enters with zero A rows).
    """
    b, n = X.shape
    m = A.shape[0]
    b_pad = _round_up(b, 8)
    if not _eligible(b_pad, m, n, A.dtype):
        return blas.xgemm(Y - blas.xgemm(X, A, trans_b=True), A)

    tile_m = _tile_m(n, _VMEM_BUDGET)
    m_pad = _round_up(m, tile_m)
    Ap = jnp.pad(A, ((0, m_pad - m), (0, 0))) if m_pad != m else A
    Xp = jnp.pad(X, ((0, b_pad - b), (0, 0))) if b_pad != b else X
    Yp = jnp.pad(Y, ((0, b_pad - b), (0, m_pad - m)))

    kern = functools.partial(_fused_residual_kernel,
                             precision=_kernel_precision())
    out = pl.pallas_call(
        kern,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * m_pad * n,
            bytes_accessed=m_pad * n * 4 + 3 * b_pad * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(Ap, Xp, Yp)
    return out[:b] if b_pad != b else out
