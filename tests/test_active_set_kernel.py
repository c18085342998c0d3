"""Fused active-set kernel vs the pure-JAX slot-space formulation.

Builds algebraically consistent lane states (true Gram submatrices and
inverses over random supports), applies one transition through both the
Pallas kernel (interpret mode off-TPU) and the vmapped JAX helpers from
solvers/homotopy.py, and compares every output field.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparse_solvers_tpu.ops import blas
from sparse_solvers_tpu.ops.pallas import active_set as ak
from sparse_solvers_tpu.solvers import homotopy as H

_INTERPRET = jax.default_backend() != "tpu"


def _make_states(b, n, K, seed):
    rng = np.random.RandomState(seed)
    A = rng.randn(2 * n, n).astype(np.float32)
    A /= np.linalg.norm(A, axis=0)
    G = (A.T @ A).astype(np.float32)

    inv = np.zeros((b, K, K), np.float32)
    gk = np.zeros((b, K, K), np.float32)
    c_act = np.zeros((b, K), np.float32)
    d_act = np.zeros((b, K), np.float32)
    u1 = np.zeros((b, K), np.float32)
    indices = np.full((b, K), n, np.int32)
    kk = np.zeros(b, np.int32)
    idx = np.zeros(b, np.int32)
    present = np.zeros(b, bool)
    mask = np.zeros((b, n), bool)
    gamma = rng.uniform(0.1, 1.0, b).astype(np.float32)
    vtv = np.zeros(b, np.float32)
    c_new = rng.randn(b).astype(np.float32)

    for l in range(b):
        k = rng.randint(2, K - 2)
        sup = rng.permutation(n)[:k].astype(np.int32)
        indices[l, :k] = sup
        kk[l] = k
        mask[l, sup] = True
        gsub = G[np.ix_(sup, sup)]
        gk[l, :k, :k] = gsub
        inv[l, :k, :k] = np.linalg.inv(gsub)
        c_act[l, :k] = rng.randn(k)
        d_act[l, :k] = rng.randn(k)
        if l % 3 == 0:  # removal lane
            idx[l] = sup[rng.randint(k)]
            present[l] = True
        else:           # insertion lane
            rest = np.setdiff1d(np.arange(n), sup)
            idx[l] = rest[rng.randint(len(rest))]
        u1[l] = np.where(indices[l] < n, G[np.minimum(indices[l], n - 1),
                                           idx[l]], 0)
        vtv[l] = G[idx[l], idx[l]]
    return (inv, gk, c_act, d_act, u1, indices, kk, idx, present, gamma,
            vtv, c_new)


def _reference(inv, gk, c_act, d_act, u1, indices, kk, idx, present, gamma,
               vtv, c_new, tol, n, K):
    """One transition via the vmapped JAX helpers (the XLA formulation)."""
    import sparse_solvers_tpu.linalg.online_inverse as oinv

    def lane(inv, gk, c_act, d_act, u1, ind, k, idx, gamma, vtv, c_new):
        st = oinv.InverseState(inv=inv, indices=ind,
                               mask=jnp.zeros((n,), bool).at[ind].set(
                                   True, mode="drop"),
                               k=k)
        q_act = blas.xgemv(gk, d_act)
        c1 = c_act - gamma * q_act
        st2, gk2, c2 = H._toggle_support_unordered(st, gk, c1, idx, u1, vtv)
        c2 = jnp.where(st.mask[idx], c2, c2.at[k].set(c_new))
        ds = blas.xgemv(st2.inv, H._sign_deadzone(c2, jnp.float32(tol)))
        return st2.inv, gk2, c2, ds, st2.indices, st2.k

    return jax.vmap(lane)(
        jnp.asarray(inv), jnp.asarray(gk), jnp.asarray(c_act),
        jnp.asarray(d_act), jnp.asarray(u1), jnp.asarray(indices),
        jnp.asarray(kk), jnp.asarray(idx), jnp.asarray(gamma),
        jnp.asarray(vtv), jnp.asarray(c_new))


@pytest.mark.parametrize("b,n,K,seed", [(8, 32, 9, 0), (11, 24, 7, 1),
                                        (16, 48, 13, 2)])
def test_kernel_matches_jax_formulation(b, n, K, seed):
    tol = 0.01
    (inv, gk, c_act, d_act, u1, indices, kk, idx, present, gamma, vtv,
     c_new) = _make_states(b, n, K, seed)

    ref = _reference(inv, gk, c_act, d_act, u1, indices, kk, idx, present,
                     gamma, vtv, c_new, tol, n, K)

    live = np.ones(b, bool)
    out = ak.active_set_update(
        jnp.asarray(inv), jnp.asarray(gk), jnp.asarray(c_act),
        jnp.asarray(d_act), jnp.asarray(u1), jnp.asarray(indices),
        jnp.asarray(kk), jnp.asarray(idx), jnp.asarray(present),
        jnp.asarray(live), jnp.asarray(gamma), jnp.asarray(vtv),
        jnp.asarray(c_new), tol, n, interpret=_INTERPRET)

    names = ["inv", "gk", "c_act", "d_act", "indices", "kk"]
    for name, got, want in zip(names, out, ref):
        got, want = np.asarray(got), np.asarray(want)
        if got.dtype == np.int32:
            np.testing.assert_array_equal(got, want, err_msg=name)
        else:
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=name)


def test_frozen_lanes_pass_through():
    b, n, K = 8, 32, 9
    (inv, gk, c_act, d_act, u1, indices, kk, idx, present, gamma, vtv,
     c_new) = _make_states(b, n, K, 3)
    live = np.zeros(b, bool)
    out = ak.active_set_update(
        jnp.asarray(inv), jnp.asarray(gk), jnp.asarray(c_act),
        jnp.asarray(d_act), jnp.asarray(u1), jnp.asarray(indices),
        jnp.asarray(kk), jnp.asarray(idx), jnp.asarray(present),
        jnp.asarray(live), jnp.asarray(gamma), jnp.asarray(vtv),
        jnp.asarray(c_new), 0.01, n, interpret=_INTERPRET)
    for got, want in zip(out, (inv, gk, c_act, d_act, indices, kk)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
