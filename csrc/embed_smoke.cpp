// Embedding smoke test for ss_tpu.h — the C++ analog of the
// reference's test_util.h smoke fixtures (src/solvers/test_util.h:27-56
// usage of the ss.h surface). Built and run by `make -C csrc smoke`
// and tests/test_native.py::test_cpp_embedding_smoke.
//
// Exit code 0 = every check passed; prints the first failing check
// otherwise.

#include "ss_tpu.h"

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

namespace {

int failures = 0;

#define CHECK(cond)                                              \
  do {                                                           \
    if (!(cond)) {                                               \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__,         \
                   __LINE__, #cond);                             \
      ++failures;                                                \
    }                                                            \
  } while (0)

template <typename T>
void make_problem(int m, int n, int k, unsigned seed, std::vector<T>& A,
                  std::vector<T>& x_true, std::vector<T>& y) {
  std::mt19937 rng(seed);
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::uniform_real_distribution<double> mag(0.5, 1.0);
  A.assign(size_t(m) * n, T(0));
  for (auto& a : A) a = T(gauss(rng));
  // unit l2 columns (the fixtures' conditioning)
  for (int j = 0; j < n; ++j) {
    double s = 0;
    for (int i = 0; i < m; ++i) s += double(A[size_t(i) * n + j]) *
                                     double(A[size_t(i) * n + j]);
    s = std::sqrt(s);
    for (int i = 0; i < m; ++i) A[size_t(i) * n + j] = T(A[size_t(i) * n + j] / s);
  }
  x_true.assign(n, T(0));
  std::vector<int> perm(n);
  for (int j = 0; j < n; ++j) perm[j] = j;
  std::shuffle(perm.begin(), perm.end(), rng);
  for (int t = 0; t < k; ++t) x_true[perm[t]] = T(mag(rng));
  y.assign(m, T(0));
  sstpu::reconstruct_signal(A.data(), m, n, x_true.data(), y.data());
}

template <typename T>
int support_errors(const std::vector<T>& x, const std::vector<T>& x_true,
                   T thresh) {
  int bad = 0;
  for (size_t j = 0; j < x.size(); ++j)
    if ((std::abs(x[j]) > thresh) != (x_true[j] != T(0))) ++bad;
  return int(bad);
}

void homotopy_smoke() {
  const int m = 64, n = 128, k = 6;
  std::vector<float> A, x_true, y;
  make_problem<float>(m, n, k, 7, A, x_true, y);

  sstpu::homotopy<float> solver(A.data(), m, n);
  std::vector<float> x(n, 0.f);
  auto res = solver.solve(y.data(), 1e-3f, 100, x.data());
  CHECK(bool(res));
  CHECK(res->iter >= std::uint32_t(k));
  CHECK(res->solution_error <= 1e-3);
  CHECK(support_errors(x, x_true, 1e-3f) == 0);

  // batch of identical signals == single solve, lane for lane
  const int batch = 5;
  std::vector<float> Y(size_t(batch) * m), X(size_t(batch) * n, 0.f);
  for (int b = 0; b < batch; ++b)
    std::copy(y.begin(), y.end(), Y.begin() + size_t(b) * m);
  auto reps = solver.solve_batch(Y.data(), batch, 1e-3f, 100, X.data());
  CHECK(int(reps.size()) == batch);
  for (int b = 0; b < batch; ++b) {
    CHECK(reps[b].iter == res->iter);
    for (int j = 0; j < n; ++j) CHECK(X[size_t(b) * n + j] == x[j]);
  }
}

void irls_smoke() {
  const int m = 96, n = 48;
  std::vector<double> A, x_true, y;
  make_problem<double>(m, n, 1, 11, A, x_true, y);

  sstpu::irls<double> solver(A.data(), m, n);
  CHECK(solver.ok());
  std::vector<double> x(n, 0.0);
  auto res = solver.solve(y.data(), 1e-6, 60, x.data());
  CHECK(bool(res));
  CHECK(!res->spd_failure);
  int argmax = 0;
  for (int j = 0; j < n; ++j)
    if (std::abs(x[j]) > std::abs(x[argmax])) argmax = j;
  int true_arg = 0;
  for (int j = 0; j < n; ++j)
    if (x_true[j] != 0.0) true_arg = j;
  CHECK(argmax == true_arg);

  // move semantics: the moved-to solver owns the factorization
  sstpu::irls<double> moved(std::move(solver));
  CHECK(moved.ok());
  std::vector<double> x2(n, 0.0);
  auto res2 = moved.solve(y.data(), 1e-6, 60, x2.data());
  CHECK(bool(res2) && res2->iter == res->iter);

  // underdetermined construction is a reported error, not an abort
  std::vector<double> Aw(size_t(8) * 16, 0.1);
  sstpu::irls<double> bad(Aw.data(), 8, 16);
  CHECK(!bad.ok());
  auto resbad = bad.solve(y.data(), 1e-6, 10, x.data());
  CHECK(!resbad && !resbad.error().empty());
}

void irls_cg_smoke() {
  const int m = 48, n = 96;
  std::vector<float> A, x_true, y;
  make_problem<float>(m, n, 3, 23, A, x_true, y);

  sstpu::irls_cg<float> solver(A.data(), m, n);
  std::vector<float> x(n, 0.f);
  auto res = solver.solve(y.data(), 1e-5f, 80, x.data());
  CHECK(bool(res));
  CHECK(!res->spd_failure);
  CHECK(support_errors(x, x_true, 1e-2f) == 0);

  sstpu::irls_cg<float> bad(A.data(), n, m);  // m > n rejected
  auto resbad = bad.solve(y.data(), 1e-5f, 10, x.data());
  CHECK(!resbad);
}

void omp_smoke() {
  const int m = 64, n = 128, k = 5;
  std::vector<float> A, x_true, y;
  make_problem<float>(m, n, k, 31, A, x_true, y);

  sstpu::omp<float> solver(A.data(), m, n);
  std::vector<float> x(n, 0.f);
  auto res = solver.solve(y.data(), 1e-3f, 60, x.data());
  CHECK(bool(res));
  CHECK(res->iter == std::uint32_t(k));  // exact picks on a clean signal
  CHECK(res->solution_error <= 1e-3);
  CHECK(support_errors(x, x_true, 1e-2f) == 0);

  const int batch = 3;
  std::vector<float> Y(size_t(batch) * m), X(size_t(batch) * n, 0.f);
  for (int b = 0; b < batch; ++b)
    std::copy(y.begin(), y.end(), Y.begin() + size_t(b) * m);
  auto reps = solver.solve_batch(Y.data(), batch, 1e-3f, 60, X.data());
  CHECK(int(reps.size()) == batch);
  for (int b = 0; b < batch; ++b) {
    CHECK(reps[b].iter == res->iter);
    for (int j = 0; j < n; ++j) CHECK(X[size_t(b) * n + j] == x[j]);
  }

  // generalized OMP (picks=2): same recovered support on a clean
  // ensemble, half the correlation passes
  std::vector<float> xg(n, 0.f);
  auto resg = solver.solve(y.data(), 1e-3f, 60, xg.data(), 0, 2);
  CHECK(bool(resg));
  CHECK(resg->solution_error <= 1e-3);
  CHECK(support_errors(xg, x_true, 1e-2f) == 0);
}

void utilities_smoke() {
  // norm_l1: columns sum to 1 in |.| afterwards (ss.h:86-93)
  std::vector<double> A = {1, -2, 3, 4, 0, -6};  // 3x2 row-major
  sstpu::norm_l1(A.data(), 3, 2);
  CHECK(std::abs(std::abs(A[0]) + std::abs(A[2]) + std::abs(A[4]) - 1.0) <
        1e-12);
  CHECK(std::abs(std::abs(A[1]) + std::abs(A[3]) + std::abs(A[5]) - 1.0) <
        1e-12);

  CHECK(sstpu::engine_version() >= 6);
  int blas = sstpu::runtime_blas_active();
  CHECK(blas == 0 || blas == 1 || blas == 2);
}

}  // namespace

int main(int argc, char** argv) {
  // optional argv[1] = "path[:prefix[:suffix[:ilp64]]]" — a CBLAS to
  // load first so every smoke below runs the vendor-BLAS call sites
  // (tests pass numpy's bundled OpenBLAS here).
  if (argc > 1) {
    // left-optional fields, split left-to-right like the Python
    // SS_NATIVE_BLAS parser (backend/native.py _blas_candidates)
    std::string spec(argv[1]), part[4];
    size_t start = 0;
    for (int i = 0; i < 4; ++i) {
      auto pos = spec.find(':', start);
      if (pos == std::string::npos || i == 3) {
        part[i] = spec.substr(start);
        break;
      }
      part[i] = spec.substr(start, pos - start);
      start = pos + 1;
    }
    bool loaded = sstpu::load_runtime_blas(
        part[0].c_str(), part[1].c_str(), part[2].c_str(), part[3] == "1");
    CHECK(loaded && sstpu::runtime_blas_active() != 0);
  }
  homotopy_smoke();
  irls_smoke();
  irls_cg_smoke();
  omp_smoke();
  utilities_smoke();
  if (failures == 0) std::printf("embed smoke ok (blas=%d)\n",
                                 sstpu::runtime_blas_active());
  return failures == 0 ? 0 : 1;
}
