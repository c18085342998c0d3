// Native host backend — C++17 implementations of the homotopy and IRLS
// l1-minimization solvers, exposed through a C ABI for ctypes.
//
// Role in the framework (mirrors the reference library's C++ core,
// reference: src/solvers/homotopy-cpu.cpp, irls-cpu.cpp, linalg/*):
//   * the CPU execution backend for problems too small to amortize an
//     accelerator dispatch, and for hosts without one;
//   * the measured CPU baseline for the benchmark harness (the reference
//     publishes no numbers; this is the strongest same-algorithm CPU
//     implementation we can field, so speedups are hardware+design, not
//     a strawman).
//
// This is a fresh implementation from the algorithm specs (SURVEY.md §3,
// docs/algorithms in the reference): insertion-ordered active set with an
// incrementally bordered Gram inverse, gamma scan with leftmost-min
// tie-breaking, sign deadzone, correlation recurrence. Not a translation
// of the reference sources.
//
// Build: make -C csrc   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- helpers

template <typename T>
T dot(const T* a, const T* b, int n) {
  T s = 0;
  for (int i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

template <typename T>
void axpy(T alpha, const T* x, T* y, int n) {
  for (int i = 0; i < n; ++i) y[i] += alpha * x[i];
}

// sign with a +-tol deadzone (reference semantics: homotopy-cpu.cpp:59-67)
template <typename T>
T sign_deadzone(T v, T tol) {
  if (v > tol) return T(1);
  if (v < -tol) return T(-1);
  return T(0);
}

// ------------------------------------------------- insertion-ordered inverse
//
// Maintains B = (A_G^T A_G)^-1 for the active columns G in *insertion*
// order inside a fixed (cap x cap) row-major buffer, exactly the update
// math of the TPU path (linalg/online_inverse.py insert_unordered /
// remove_unordered; reference math: online_inverse.h:184-293).

template <typename T>
struct OnlineInverse {
  int cap, k = 0;
  std::vector<T> B;           // cap*cap, live k*k block
  std::vector<int> cols;      // cap, column id per slot
  std::vector<T> u1, u2;      // scratch, cap

  explicit OnlineInverse(int capacity)
      : cap(capacity), B(size_t(capacity) * capacity, T(0)),
        cols(capacity, -1), u1(capacity), u2(capacity) {}

  T& at(int i, int j) { return B[size_t(i) * cap + j]; }

  int slot_of(int col) const {
    for (int i = 0; i < k; ++i)
      if (cols[i] == col) return i;
    return -1;
  }

  // u1[i] = <A[:,cols[i]], A[:,col]> supplied by the caller; vtv = |A col|^2.
  // Returns false (state untouched) when the insert is numerically
  // degenerate: |den| at subnormal scale, where 1/den overflows to inf
  // (den = vtv - u1^T B u1, the Schur complement of the bordered Gram;
  // the reference divides unguarded, online_inverse.h:219). Tiny and
  // even negative dens proceed exactly as the reference's arithmetic
  // does — coherent dictionaries produce noise-level dens whose paths
  // still converge via the per-iteration sign recomputation. Same rule
  // as the JAX engines (solvers/homotopy.py, ops/pallas/transition.py);
  // run_solver additionally breaks on a non-finite direction.
  bool insert(int col, const T* u1_in, T vtv) {
    for (int i = 0; i < k; ++i) u1[i] = u1_in[i];
    // u2 = B u1 over the live block
    for (int i = 0; i < k; ++i) u2[i] = dot(&B[size_t(i) * cap], u1.data(), k);
    T den = vtv - dot(u1.data(), u2.data(), k);
    if (!(std::abs(den) > T(256) * std::numeric_limits<T>::min()))
      return false;
    T d = T(1) / den;
    // B += d u2 u2^T ; border row/col k = -d u2 ; corner = d
    for (int i = 0; i < k; ++i) {
      T* row = &B[size_t(i) * cap];
      T s = d * u2[i];
      for (int j = 0; j < k; ++j) row[j] += s * u2[j];
      row[k] = -s;
      at(k, i) = -s;
    }
    at(k, k) = d;
    cols[k] = col;
    ++k;
    return true;
  }

  void remove(int col) {
    int pos = slot_of(col);
    int last = k - 1;
    if (pos != last) {
      for (int j = 0; j < k; ++j) std::swap(at(pos, j), at(last, j));
      for (int i = 0; i < k; ++i) std::swap(at(i, pos), at(i, last));
      std::swap(cols[pos], cols[last]);
    }
    T d = at(last, last);
    for (int i = 0; i < last; ++i) {
      T s = at(i, last) / d;
      for (int j = 0; j < last; ++j) at(i, j) -= s * at(last, j);
    }
    for (int j = 0; j < k; ++j) { at(last, j) = 0; at(j, last) = 0; }
    cols[last] = -1;
    --k;
  }
};

// ------------------------------------------------------------- homotopy

// A is stored column-major (each column of length m contiguous) so that
// column dots and the correlation gemv stream unit-stride.
template <typename T>
struct HomotopyWork {
  int m, n, cap;
  const T* At;                 // n x m row-major = A columns contiguous
  std::vector<T> c, x, d, p, q, u1col;
  OnlineInverse<T> inv;

  HomotopyWork(const T* At_, int m_, int n_, int capacity)
      : m(m_), n(n_), cap(capacity), At(At_), c(n_), x(n_), d(n_), p(m_),
        q(n_), u1col(capacity), inv(capacity) {}

  const T* col(int j) const { return At + size_t(j) * m; }

  int solve(const T* y, T tol, int max_iter, T* x_out, T* err_out) {
    std::fill(c.begin(), c.end(), T(0));
    std::fill(x.begin(), x.end(), T(0));
    std::fill(d.begin(), d.end(), T(0));
    inv.k = 0;
    std::fill(inv.B.begin(), inv.B.end(), T(0));
    std::fill(inv.cols.begin(), inv.cols.end(), -1);

    // c0 = A^T y ; first index = argmax |c| (leftmost on ties, matching
    // cblas ixamax semantics the reference relies on)
    int idx = 0;
    T c_inf = 0;
    for (int j = 0; j < n; ++j) {
      c[j] = dot(col(j), y, m);
      if (std::abs(c[j]) > c_inf) { c_inf = std::abs(c[j]); idx = j; }
    }

    toggle(idx);
    d[idx] = sign_deadzone(c_inf, tol) * inv.at(0, 0);

    int iter = 0;
    const T big = std::numeric_limits<T>::max();
    do {
      ++iter;
      // q = A^T (A d) with d supported on the active set:
      // p = sum_s d[cols_s] * A[:,cols_s]   (k columns, not n)
      std::fill(p.begin(), p.end(), T(0));
      for (int s = 0; s < inv.k; ++s)
        axpy(d[inv.cols[s]], col(inv.cols[s]), p.data(), m);
      for (int j = 0; j < n; ++j) q[j] = dot(col(j), p.data(), m);

      // gamma scan, leftmost running-min (homotopy-cpu.cpp:100-164)
      T gmin = big;
      int gidx = -1;
      for (int j = 0; j < n; ++j) {
        T cand;
        if (inv.slot_of(j) >= 0) {
          cand = -x[j] / d[j];
        } else {
          T lo = (c_inf - c[j]) / (T(1) - q[j]);
          T hi = (c_inf + c[j]) / (T(1) + q[j]);
          cand = big;
          if (std::isfinite(lo) && lo > 0 && lo < cand) cand = lo;
          if (std::isfinite(hi) && hi > 0 && hi < cand) cand = hi;
        }
        if (cand > 0 && cand < gmin) { gmin = cand; gidx = j; }
      }
      // no valid candidate: proceed with idx=0, gamma=FLT_MAX — the
      // reference's running-min initialization (homotopy-cpu.cpp:123)
      // and the JAX engines' argmin-of-all-big behavior; all engines
      // agree on this degenerate state (round-1 advisor finding 3)
      if (gidx < 0) gidx = 0;
      T gamma = gmin;

      // a full-capacity insert breaks the path cleanly, like the JAX
      // engines (solvers/homotopy.py k_max overflow guard) and the
      // empty-set case below — continuing with a stale support would
      // re-select the same column forever; likewise a degenerate insert
      // (Schur complement at rounding noise — see inverse::insert)
      if (inv.slot_of(gidx) < 0 && inv.k >= cap) break;
      if (!toggle(gidx)) break;
      if (inv.k == 0) break;

      // x += gamma d ; c -= gamma q (correlation recurrence); new c_inf
      for (int j = 0; j < n; ++j) x[j] += gamma * d[j];
      c_inf = 0;
      for (int j = 0; j < n; ++j) {
        c[j] -= gamma * q[j];
        if (std::abs(c[j]) > c_inf) c_inf = std::abs(c[j]);
      }

      // direction = B * sign(c_G) scattered to the active columns
      std::fill(d.begin(), d.end(), T(0));
      for (int s = 0; s < inv.k; ++s)
        u1col[s] = sign_deadzone(c[inv.cols[s]], tol);
      bool dbad = false;
      for (int s = 0; s < inv.k; ++s) {
        T ds = dot(&inv.B[size_t(s) * inv.cap], u1col.data(), inv.k);
        d[inv.cols[s]] = ds;
        dbad |= !std::isfinite(ds);
      }
      // finiteness break: on rank-deficient supports the (deliberately
      // reference-faithful) tiny/negative-den inserts can overflow the
      // inverse; stop with the committed finite x/c instead of stepping
      // a non-finite direction (same rule as the batch driver)
      if (dbad) break;
    } while (iter < max_iter && c_inf > tol);

    std::memcpy(x_out, x.data(), sizeof(T) * n);
    *err_out = c_inf;
    return iter;
  }

  bool toggle(int j) {
    if (inv.slot_of(j) >= 0) {
      inv.remove(j);
      return true;
    }
    if (inv.k >= cap) return true;  // caller breaks on capacity first
    const T* v = col(j);
    for (int s = 0; s < inv.k; ++s) u1col[s] = dot(col(inv.cols[s]), v, m);
    return inv.insert(j, u1col.data(), dot(v, v, m));
  }
};

// ---------------------------------------------------------------- QR / IRLS

// Economy Householder QR of column-major A (m x n, m >= n): V holds the
// reflectors, R upper-triangular (n x n), Q materialized m x n.
template <typename T>
struct QRFactors {
  int m, n;
  std::vector<T> Q;  // m x n column-major
  std::vector<T> R;  // n x n row-major

  QRFactors(const T* At, int m_, int n_) : m(m_), n(n_) {
    std::vector<T> W(At, At + size_t(n) * m);  // working copy, cols contiguous
    std::vector<T> tau(n);
    std::vector<std::vector<T>> V(n);
    for (int j = 0; j < n; ++j) {
      T* wj = &W[size_t(j) * m];
      T normx = std::sqrt(dot(wj + j, wj + j, m - j));
      if (normx == 0) { tau[j] = 0; V[j].assign(m - j, T(0)); continue; }
      T alpha = wj[j] >= 0 ? -normx : normx;
      std::vector<T> v(wj + j, wj + m);
      v[0] -= alpha;
      T vnorm2 = dot(v.data(), v.data(), m - j);
      tau[j] = vnorm2 > 0 ? T(2) / vnorm2 : T(0);
      // apply reflector to remaining columns
      for (int jj = j; jj < n; ++jj) {
        T* w = &W[size_t(jj) * m];
        T s = tau[j] * dot(v.data(), w + j, m - j);
        for (int i = 0; i < m - j; ++i) w[j + i] -= s * v[i];
      }
      V[j] = std::move(v);
    }
    R.assign(size_t(n) * n, T(0));
    for (int i = 0; i < n; ++i)
      for (int j = i; j < n; ++j) R[size_t(i) * n + j] = W[size_t(j) * m + i];
    // materialize Q = H_0 ... H_{n-1} [I_n ; 0]
    Q.assign(size_t(n) * m, T(0));
    for (int j = 0; j < n; ++j) Q[size_t(j) * m + j] = T(1);
    for (int j = n - 1; j >= 0; --j) {
      if (tau[j] == 0) continue;
      for (int jj = 0; jj < n; ++jj) {
        T* qcol = &Q[size_t(jj) * m];
        T s = tau[j] * dot(V[j].data(), qcol + j, m - j);
        for (int i = 0; i < m - j; ++i) qcol[j + i] -= s * V[j][i];
      }
    }
  }
};

// Cholesky of a row-major n x n SPD matrix, in place lower; false if not SPD.
template <typename T>
bool cholesky(std::vector<T>& A, int n) {
  for (int j = 0; j < n; ++j) {
    T s = A[size_t(j) * n + j];
    for (int p = 0; p < j; ++p) s -= A[size_t(j) * n + p] * A[size_t(j) * n + p];
    // SPD criterion: pivot sqrt > machine eps (matches linalg/cholesky.py
    // and the reference's pivot check, cholesky_decomposition.h:80-83);
    // negated comparison also rejects NaN pivots.
    const T eps = std::numeric_limits<T>::epsilon();
    if (!(s > eps * eps)) return false;
    T ljj = std::sqrt(s);
    A[size_t(j) * n + j] = ljj;
    for (int i = j + 1; i < n; ++i) {
      T t = A[size_t(i) * n + j];
      for (int p = 0; p < j; ++p)
        t -= A[size_t(i) * n + p] * A[size_t(j) * n + p];
      A[size_t(i) * n + j] = t / ljj;
    }
  }
  return true;
}

template <typename T>
void chol_solve(const std::vector<T>& L, int n, std::vector<T>& b) {
  for (int i = 0; i < n; ++i) {
    T s = b[i];
    for (int j = 0; j < i; ++j) s -= L[size_t(i) * n + j] * b[j];
    b[i] = s / L[size_t(i) * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    T s = b[i];
    for (int j = i + 1; j < n; ++j) s -= L[size_t(j) * n + i] * b[j];
    b[i] = s / L[size_t(i) * n + i];
  }
}

// IRLS (Chartrand–Yin p=0.9 reweighting) over a cached QR — the same
// iteration as solvers/irls.py (reference: irls-cpu.cpp:39-124).
template <typename T>
struct IrlsWork {
  const QRFactors<T>& qr;
  int m, n;
  std::vector<T> w, xv, G, rhs, s, t;

  explicit IrlsWork(const QRFactors<T>& f)
      : qr(f), m(f.m), n(f.n), w(f.n), xv(f.n), G(size_t(f.n) * f.n),
        rhs(f.n), s(f.n), t(f.m) {}

  int solve(const T* y, T tol, int max_iter, T* x_out, T* err_out,
            int* spd_fail) {
    const T p = T(0.9);
    std::fill(w.begin(), w.end(), T(1));
    T eps = 1, abstol = 1, x2 = 1;
    int iter = 0;
    *spd_fail = 0;
    do {
      // G = Q^T (Q o w) with w scaling Q's *columns*: G[i][j] = w_j <Q_i,Q_j>
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
          const T* qi = &qr.Q[size_t(i) * m];
          const T* qj = &qr.Q[size_t(j) * m];
          G[size_t(i) * n + j] = w[j] * dot(qi, qj, m);
        }
      if (!cholesky(G, n)) { *spd_fail = 1; break; }
      for (int i = 0; i < n; ++i) rhs[i] = dot(&qr.Q[size_t(i) * m], y, m);
      s = rhs;
      chol_solve(G, n, s);
      // t = Q s ; xv = Q^T t ; solve R xv
      std::fill(t.begin(), t.end(), T(0));
      for (int j = 0; j < n; ++j) axpy(s[j], &qr.Q[size_t(j) * m], t.data(), m);
      for (int j = 0; j < n; ++j) xv[j] = dot(&qr.Q[size_t(j) * m], t.data(), m);
      for (int i = n - 1; i >= 0; --i) {
        T acc = xv[i];
        for (int j = i + 1; j < n; ++j) acc -= qr.R[size_t(i) * n + j] * xv[j];
        xv[i] = acc / qr.R[size_t(i) * n + i];
      }
      ++iter;
      // threshold + eps + weight update (irls-cpu.cpp:100-114)
      T amax = *std::max_element(xv.begin(), xv.end());
      abstol = amax * tol;
      for (auto& v : xv)
        if (v < abstol) v = 0;
      if (n < 2) {
        x2 = 0;  // no second-largest; the loop exits below
      } else {
        std::vector<T> srt(xv);
        std::nth_element(srt.begin(), srt.begin() + 1, srt.end(),
                         std::greater<T>());
        x2 = srt[1];
      }
      eps = std::min(eps, x2 / T(n));
      T wsum = 0;
      for (int j = 0; j < n; ++j) {
        w[j] = std::pow(xv[j] * xv[j] + eps, p / 2 - 1);
        wsum += w[j];
      }
      for (auto& v : w) v /= wsum;
    } while (iter < max_iter && x2 > abstol);
    T xsum = 0;
    for (auto v : xv) xsum += v;
    for (int j = 0; j < n; ++j) x_out[j] = xsum != 0 ? xv[j] / xsum : xv[j];
    *err_out = eps;
    return iter;
  }
};

// CG-IRLS (DDFG basis pursuit for m <= n) — the same iteration as
// solvers/irls_cg.py (arXiv:1509.04063): inverse weights
// D = (x^2 + eps^2)^(1 - p/2), warm-started conjugate-gradient solve of
// (A D A^T) z = y, x = D o (A^T z), eps <- min(eps, r_{K+1}(x)/n),
// termination on the relative sup-norm change of x (do-while). A CG
// breakdown (pBp <= 0 / non-finite, or an overflowing step) maps to the
// jax engine's spd_failure, with the iterate left at its last finite
// value. No reference analog (its IRLS rejects m < n, irls_test.cpp:53).
template <typename T>
struct IrlsCgWork {
  const T* A;  // row-major m x n
  int m, n;
  std::vector<T> D, x, xn, z, r, pv, Bp, tn, srt;

  IrlsCgWork(const T* a, int m_, int n_)
      : A(a), m(m_), n(n_), D(n_), x(n_), xn(n_), z(m_), r(m_), pv(m_),
        Bp(m_), tn(n_), srt(n_) {}

  void rmatvec(const T* u, T* out) {  // out = A^T u
    std::fill(out, out + n, T(0));
    for (int i = 0; i < m; ++i) axpy(u[i], A + size_t(i) * n, out, n);
  }

  void bmatvec(const T* v, T* out) {  // out = A (D o (A^T v))
    rmatvec(v, tn.data());
    for (int j = 0; j < n; ++j) tn[j] *= D[j];
    for (int i = 0; i < m; ++i)
      out[i] = dot(A + size_t(i) * n, tn.data(), n);
  }

  // CG for (A D A^T) z = y, warm-started at the current z; false on
  // curvature breakdown (z rolled back to its last finite value)
  bool cg(const T* y, T tol2, int max_cg) {
    bmatvec(z.data(), Bp.data());
    for (int i = 0; i < m; ++i) r[i] = y[i] - Bp[i];
    pv = r;
    T rs = dot(r.data(), r.data(), m);
    for (int it = 0; it < max_cg && rs > tol2; ++it) {
      bmatvec(pv.data(), Bp.data());
      T pBp = dot(pv.data(), Bp.data(), m);
      if (!(std::isfinite(pBp) && pBp > 0)) return false;
      T alpha = rs / pBp;
      axpy(alpha, pv.data(), z.data(), m);
      axpy(-alpha, Bp.data(), r.data(), m);
      T rs2 = dot(r.data(), r.data(), m);
      if (!std::isfinite(rs2)) {  // alpha overflowed: roll back, break
        axpy(-alpha, pv.data(), z.data(), m);
        axpy(alpha, Bp.data(), r.data(), m);
        return false;
      }
      T beta = rs2 / rs;
      for (int i = 0; i < m; ++i) pv[i] = r[i] + beta * pv[i];
      rs = rs2;
    }
    return true;
  }

  int solve(const T* y, T tol, int max_iter, T p, int K, int max_cg,
            T cg_rel, T* x_out, T* eps_out, int* broke_out) {
    std::fill(x.begin(), x.end(), T(0));
    std::fill(z.begin(), z.end(), T(0));
    T eps = 1;
    int iter = 0;
    *broke_out = 0;
    const T tol2 = cg_rel * cg_rel * dot(y, y, m);
    const T tiny = std::numeric_limits<T>::min();
    T change = std::numeric_limits<T>::infinity();
    do {
      const T pexp = T(1) - p / 2;
      for (int j = 0; j < n; ++j)
        D[j] = std::pow(x[j] * x[j] + eps * eps, pexp);
      if (!cg(y, tol2, max_cg)) { *broke_out = 1; break; }
      rmatvec(z.data(), xn.data());
      for (int j = 0; j < n; ++j) xn[j] *= D[j];
      T xmax = 0, dmax = 0;
      for (int j = 0; j < n; ++j) {
        xmax = std::max(xmax, std::abs(xn[j]));
        dmax = std::max(dmax, std::abs(xn[j] - x[j]));
      }
      change = dmax / std::max(xmax, tiny);
      for (int j = 0; j < n; ++j) srt[j] = std::abs(xn[j]);
      int kk = std::min(K, n - 1);  // (K+1)-th largest, 0-based index K
      std::nth_element(srt.begin(), srt.begin() + kk, srt.end(),
                       std::greater<T>());
      eps = std::min(eps, srt[kk] / T(n));
      x = xn;
      ++iter;
    } while (iter < max_iter && change > tol);
    std::copy(x.begin(), x.end(), x_out);
    *eps_out = eps;
    return iter;
  }
};

// <=0 / non-positive knobs select the engine defaults (the jax engine's:
// K = m/4, max_cg = min(m, 128), cg_rel = tol/10 clamped to
// [10*eps_mach, sqrt(eps_mach)])
template <typename T>
void resolve_cg_defaults(int m, T tol, int& k_sparsity, int& max_cg,
                         T& cg_rel) {
  if (k_sparsity <= 0) k_sparsity = std::max(1, m / 4);
  if (max_cg <= 0) max_cg = std::min(m, 128);
  if (!(cg_rel > 0)) {
    const T me = std::numeric_limits<T>::epsilon();
    cg_rel = std::max(T(10) * me, std::min(std::sqrt(me), tol / 10));
  }
}

template <typename T>
int irls_cg_impl(const T* A, int m, int n, const T* y, T tol, int max_iter,
                 T p, int k_sparsity, int max_cg, T cg_rel, T* x_out,
                 T* eps_out, int* broke_out) {
  resolve_cg_defaults(m, tol, k_sparsity, max_cg, cg_rel);
  IrlsCgWork<T> w(A, m, n);
  return w.solve(y, tol, max_iter, p, k_sparsity, max_cg, cg_rel, x_out,
                 eps_out, broke_out);
}

template <typename T>
void transpose_to_colmajor(const T* A, int m, int n, std::vector<T>& At) {
  At.resize(size_t(n) * m);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) At[size_t(j) * m + i] = A[size_t(i) * n + j];
}

}  // namespace

// ------------------------------------------------------------------ C ABI

// Batched homotopy across a thread pool; Y row-major batch x m, X batch x n,
// iters/errs length batch. nthreads<=0 = hardware concurrency. Both dtypes,
// like every reference instantiation pair (homotopy-cpu.cpp:277-297).
template <typename T>
static void homotopy_batch_impl(const T* A, int m, int n, const T* Y,
                                int batch, T tol, int max_iter, int k_max,
                                int nthreads, T* X_out, int* iters_out,
                                T* errs_out) {
  std::vector<T> At;
  transpose_to_colmajor(A, m, n, At);
  int cap = std::min(k_max, n);
  int nt = nthreads > 0 ? nthreads
                        : int(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, batch));
  std::atomic<int> next(0);
  auto worker = [&]() {
    HomotopyWork<T> w(At.data(), m, n, cap);
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= batch) return;
      iters_out[b] = w.solve(Y + size_t(b) * m, tol, max_iter,
                             X_out + size_t(b) * n, errs_out + b);
    }
  };
  std::vector<std::thread> ts;
  for (int i = 0; i < nt; ++i) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// Batched CG-IRLS across the same thread pool. One workspace per worker
// (solve() fully re-initializes it), defaults resolved once; each solve
// runs the identical single-solve iteration, so batch results are
// bit-identical to sequential solves regardless of thread count.
template <typename T>
static void irls_cg_batch_impl(const T* A, int m, int n, const T* Y,
                               int batch, T tol, int max_iter, T p,
                               int k_sparsity, int max_cg, T cg_rel,
                               int nthreads, T* X_out, int* iters_out,
                               T* eps_out, int* broke_out) {
  resolve_cg_defaults(m, tol, k_sparsity, max_cg, cg_rel);
  int nt = nthreads > 0 ? nthreads
                        : int(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, batch));
  std::atomic<int> next(0);
  auto worker = [&]() {
    IrlsCgWork<T> w(A, m, n);
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= batch) return;
      iters_out[b] = w.solve(Y + size_t(b) * m, tol, max_iter, p,
                             k_sparsity, max_cg, cg_rel,
                             X_out + size_t(b) * n, eps_out + b,
                             broke_out + b);
    }
  };
  std::vector<std::thread> ts;
  for (int i = 0; i < nt; ++i) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

// Batched IRLS over a shared const QRFactors handle, same thread-pool
// shape as the other batches: one IrlsWork per worker (solve() fully
// re-initializes its weights/eps state), so batch results are
// bit-identical to sequential per-signal solves regardless of thread
// count. Y row-major batch x m.
template <typename T>
static void irls_batch_impl(const QRFactors<T>& qr, const T* Y, int batch,
                            T tol, int max_iter, int nthreads, T* X_out,
                            int* iters_out, T* errs_out, int* spd_out) {
  int nt = nthreads > 0 ? nthreads
                        : int(std::thread::hardware_concurrency());
  nt = std::max(1, std::min(nt, batch));
  std::atomic<int> next(0);
  auto worker = [&]() {
    IrlsWork<T> w(qr);
    for (;;) {
      int b = next.fetch_add(1);
      if (b >= batch) return;
      iters_out[b] = w.solve(Y + size_t(b) * qr.m, tol, max_iter,
                             X_out + size_t(b) * qr.n, errs_out + b,
                             spd_out + b);
    }
  };
  std::vector<std::thread> ts;
  for (int i = 0; i < nt; ++i) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
}

extern "C" {

// Homotopy, single solve. A row-major m x n. Returns iterations.
int ss_homotopy_solve_f32(const float* A, int m, int n, const float* y,
                          float tol, int max_iter, int k_max, float* x_out,
                          float* err_out) {
  std::vector<float> At;
  transpose_to_colmajor(A, m, n, At);
  HomotopyWork<float> w(At.data(), m, n, std::min(k_max, n));
  return w.solve(y, tol, max_iter, x_out, err_out);
}

int ss_homotopy_solve_f64(const double* A, int m, int n, const double* y,
                          double tol, int max_iter, int k_max, double* x_out,
                          double* err_out) {
  std::vector<double> At;
  transpose_to_colmajor(A, m, n, At);
  HomotopyWork<double> w(At.data(), m, n, std::min(k_max, n));
  return w.solve(y, tol, max_iter, x_out, err_out);
}

void ss_homotopy_solve_batch_f32(const float* A, int m, int n, const float* Y,
                                 int batch, float tol, int max_iter, int k_max,
                                 int nthreads, float* X_out, int* iters_out,
                                 float* errs_out) {
  homotopy_batch_impl<float>(A, m, n, Y, batch, tol, max_iter, k_max,
                             nthreads, X_out, iters_out, errs_out);
}

void ss_homotopy_solve_batch_f64(const double* A, int m, int n,
                                 const double* Y, int batch, double tol,
                                 int max_iter, int k_max, int nthreads,
                                 double* X_out, int* iters_out,
                                 double* errs_out) {
  homotopy_batch_impl<double>(A, m, n, Y, batch, tol, max_iter, k_max,
                              nthreads, X_out, iters_out, errs_out);
}

// IRLS with construct-once QR: create returns an opaque handle.
void* ss_irls_create_f32(const float* A, int m, int n) {
  if (m < n) return nullptr;
  std::vector<float> At;
  transpose_to_colmajor(A, m, n, At);
  return new QRFactors<float>(At.data(), m, n);
}

int ss_irls_solve_f32(void* handle, const float* y, float tol, int max_iter,
                      float* x_out, float* err_out, int* spd_fail) {
  auto* qr = static_cast<QRFactors<float>*>(handle);
  IrlsWork<float> w(*qr);
  return w.solve(y, tol, max_iter, x_out, err_out, spd_fail);
}

void ss_irls_destroy_f32(void* handle) {
  delete static_cast<QRFactors<float>*>(handle);
}

void ss_irls_solve_batch_f32(void* handle, const float* Y, int batch,
                             float tol, int max_iter, int nthreads,
                             float* X_out, int* iters_out, float* errs_out,
                             int* spd_out) {
  irls_batch_impl<float>(*static_cast<QRFactors<float>*>(handle), Y, batch,
                         tol, max_iter, nthreads, X_out, iters_out,
                         errs_out, spd_out);
}

void* ss_irls_create_f64(const double* A, int m, int n) {
  if (m < n) return nullptr;
  std::vector<double> At;
  transpose_to_colmajor(A, m, n, At);
  return new QRFactors<double>(At.data(), m, n);
}

int ss_irls_solve_f64(void* handle, const double* y, double tol, int max_iter,
                      double* x_out, double* err_out, int* spd_fail) {
  auto* qr = static_cast<QRFactors<double>*>(handle);
  IrlsWork<double> w(*qr);
  return w.solve(y, tol, max_iter, x_out, err_out, spd_fail);
}

void ss_irls_destroy_f64(void* handle) {
  delete static_cast<QRFactors<double>*>(handle);
}

void ss_irls_solve_batch_f64(void* handle, const double* Y, int batch,
                             double tol, int max_iter, int nthreads,
                             double* X_out, int* iters_out, double* errs_out,
                             int* spd_out) {
  irls_batch_impl<double>(*static_cast<QRFactors<double>*>(handle), Y, batch,
                          tol, max_iter, nthreads, X_out, iters_out,
                          errs_out, spd_out);
}

// CG-IRLS single solve (m <= n); returns iterations, broke -> the jax
// engine's spd_failure. k_sparsity <= 0, max_cg <= 0 and cg_rel <= 0
// select the engine defaults (m/4, min(m,128), tol/10 clamped).
int ss_irls_cg_solve_f32(const float* A, int m, int n, const float* y,
                         float tol, int max_iter, float p, int k_sparsity,
                         int max_cg, float cg_rel, float* x_out,
                         float* eps_out, int* broke_out) {
  return irls_cg_impl<float>(A, m, n, y, tol, max_iter, p, k_sparsity,
                             max_cg, cg_rel, x_out, eps_out, broke_out);
}

int ss_irls_cg_solve_f64(const double* A, int m, int n, const double* y,
                         double tol, int max_iter, double p, int k_sparsity,
                         int max_cg, double cg_rel, double* x_out,
                         double* eps_out, int* broke_out) {
  return irls_cg_impl<double>(A, m, n, y, tol, max_iter, p, k_sparsity,
                              max_cg, cg_rel, x_out, eps_out, broke_out);
}

void ss_irls_cg_solve_batch_f32(const float* A, int m, int n, const float* Y,
                                int batch, float tol, int max_iter, float p,
                                int k_sparsity, int max_cg, float cg_rel,
                                int nthreads, float* X_out, int* iters_out,
                                float* eps_out, int* broke_out) {
  irls_cg_batch_impl<float>(A, m, n, Y, batch, tol, max_iter, p, k_sparsity,
                            max_cg, cg_rel, nthreads, X_out, iters_out,
                            eps_out, broke_out);
}

void ss_irls_cg_solve_batch_f64(const double* A, int m, int n,
                                const double* Y, int batch, double tol,
                                int max_iter, double p, int k_sparsity,
                                int max_cg, double cg_rel, int nthreads,
                                double* X_out, int* iters_out,
                                double* eps_out, int* broke_out) {
  irls_cg_batch_impl<double>(A, m, n, Y, batch, tol, max_iter, p, k_sparsity,
                             max_cg, cg_rel, nthreads, X_out, iters_out,
                             eps_out, broke_out);
}

int ss_native_version() { return 4; }

}  // extern "C"
