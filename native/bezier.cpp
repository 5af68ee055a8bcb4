// Bezier curve kernels — C++ core.
//
// The reference depends on the compiled third-party `bezier` package for
// curve evaluation and arc length on the decode hot path (reference
// osu_fusion/library/osu/data/fit_bezier.py:5); this is the native
// counterpart of osufusion_tpu/osu/bezier_math.py (same Bernstein-basis
// evaluation and 16-point Gauss-Legendre arc length, numerically identical).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// 16-point Gauss-Legendre nodes/weights on [-1, 1]
constexpr int kGL = 16;
constexpr double kGLNodes[kGL] = {
    -0.9894009349916499, -0.9445750230732326, -0.8656312023878318, -0.7554044083550030,
    -0.6178762444026438, -0.4580167776572274, -0.2816035507792589, -0.0950125098376374,
    0.0950125098376374,  0.2816035507792589,  0.4580167776572274,  0.6178762444026438,
    0.7554044083550030,  0.8656312023878318,  0.9445750230732326,  0.9894009349916499};
constexpr double kGLWeights[kGL] = {
    0.0271524594117541, 0.0622535239386479, 0.0951585116824928, 0.1246289712555339,
    0.1495959888165767, 0.1691565193950025, 0.1826034150449236, 0.1894506104550685,
    0.1894506104550685, 0.1826034150449236, 0.1691565193950025, 0.1495959888165767,
    0.1246289712555339, 0.0951585116824928, 0.0622535239386479, 0.0271524594117541};

void binomial_row(int n, std::vector<double>& row) {
  row.assign(n + 1, 1.0);
  for (int k = 1; k <= n; ++k) row[k] = row[k - 1] * (n - k + 1) / k;
}

}  // namespace

extern "C" void bezier_evaluate_multi(const double* nodes, int64_t n_nodes, int32_t dim,
                                      const double* ts, int64_t n_ts, double* out) {
  // Bernstein-basis evaluation: out[(t, d)] = sum_k C(n,k) t^k (1-t)^(n-k) P[k][d]
  int n = static_cast<int>(n_nodes) - 1;
  std::vector<double> coeff;
  binomial_row(n, coeff);
  for (int64_t i = 0; i < n_ts; ++i) {
    double t = ts[i];
    double omt = 1.0 - t;
    for (int d = 0; d < dim; ++d) out[i * dim + d] = 0.0;
    for (int k = 0; k <= n; ++k) {
      double basis = coeff[k] * std::pow(t, k) * std::pow(omt, n - k);
      for (int d = 0; d < dim; ++d) out[i * dim + d] += basis * nodes[k * dim + d];
    }
  }
}

extern "C" void bezier_hodograph_multi(const double* nodes, int64_t n_nodes, int32_t dim,
                                       const double* ts, int64_t n_ts, double* out) {
  int64_t n = n_nodes - 1;
  if (n < 1) {
    for (int64_t i = 0; i < n_ts * dim; ++i) out[i] = 0.0;
    return;
  }
  std::vector<double> hodo(n * dim);
  for (int64_t k = 0; k < n; ++k)
    for (int d = 0; d < dim; ++d)
      hodo[k * dim + d] = n * (nodes[(k + 1) * dim + d] - nodes[k * dim + d]);
  bezier_evaluate_multi(hodo.data(), n, dim, ts, n_ts, out);
}

extern "C" double bezier_curve_length(const double* nodes, int64_t n_nodes, int32_t dim) {
  if (n_nodes < 2) return 0.0;
  if (n_nodes == 2) {
    double acc = 0.0;
    for (int d = 0; d < dim; ++d) {
      double diff = nodes[dim + d] - nodes[d];
      acc += diff * diff;
    }
    return std::sqrt(acc);
  }
  double ts[kGL];
  for (int i = 0; i < kGL; ++i) ts[i] = 0.5 * (kGLNodes[i] + 1.0);
  std::vector<double> deriv(kGL * dim);
  bezier_hodograph_multi(nodes, n_nodes, dim, ts, kGL, deriv.data());
  double total = 0.0;
  for (int i = 0; i < kGL; ++i) {
    double acc = 0.0;
    for (int d = 0; d < dim; ++d) acc += deriv[i * dim + d] * deriv[i * dim + d];
    total += kGLWeights[i] * std::sqrt(acc);
  }
  return 0.5 * total;
}
