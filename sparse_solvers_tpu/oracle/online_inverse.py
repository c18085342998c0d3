"""NumPy oracle for the online Gram-inverse update — independent math
check for `linalg/online_inverse.py` (reference analog:
bindings/python/reference/update_inverse_columns.py, the blueprint for
src/linalg/online_inverse.h; derivation: docs/algorithms.md §3 and the
reference's docs/algorithms/online-matrix-inverse/src.tex:108-142).

Maintains B = (A_Γᵀ A_Γ)⁻¹ as a column v of A enters or leaves the
active set Γ at a given rank. Written directly from the block-bordering
identities, dense and unpadded — the simplest correct statement of the
math, against which the fixed-capacity masked device implementation and
the C++ backend are property-tested (tests/test_online_inverse.py).
"""

from __future__ import annotations

import numpy as np


def gram_inverse_insert(A_gamma: np.ndarray, B: np.ndarray, rank: int,
                        v: np.ndarray) -> np.ndarray:
    """Insert column v at position ``rank`` of the active set.

    A_gamma: (m, K) current active columns; B: (K, K) = (A_ΓᵀA_Γ)⁻¹;
    returns the (K+1, K+1) inverse for Γ with v spliced in at ``rank``.

    Bordering: append v last, where with u₁ = A_Γᵀv, u₂ = B u₁ and the
    Schur complement d = 1/(vᵀv − u₁ᵀu₂),

        B⁺ = [ B + d·u₂u₂ᵀ   −d·u₂ ]
             [   −d·u₂ᵀ        d   ]

    then symmetrically permute the last row/col into ``rank``.
    """
    K = B.shape[0]
    u1 = A_gamma.T @ v
    u2 = B @ u1
    d = 1.0 / (v @ v - u1 @ u2)
    out = np.empty((K + 1, K + 1), dtype=B.dtype)
    out[:K, :K] = B + d * np.outer(u2, u2)
    out[:K, K] = -d * u2
    out[K, :K] = -d * u2
    out[K, K] = d
    # move the appended entry from the end to `rank` (a cyclic shift of
    # the trailing block keeps the relative order of the others)
    order = list(range(K + 1))
    order.insert(rank, order.pop())
    order = np.asarray(order)
    return out[np.ix_(order, order)]


def gram_inverse_remove(B: np.ndarray, rank: int) -> np.ndarray:
    """Remove the active-set member at position ``rank``.

    Inverse of the bordering step: permute ``rank`` to the end, then
    with β the corner and b the last column's head,
    B⁻ = B₁₁ − b bᵀ/β.
    """
    K = B.shape[0]
    order = list(range(K))
    order.append(order.pop(rank))
    order = np.asarray(order)
    P = B[np.ix_(order, order)]
    beta = P[K - 1, K - 1]
    b = P[:K - 1, K - 1]
    return P[:K - 1, :K - 1] - np.outer(b, b) / beta
