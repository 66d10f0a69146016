// Native host engine: reference-parity C++ implementation of the triplet
// row-builder + normal-equations solver (SURVEY.md §2 C1-C9; the reference's
// L1/L2 layers are C++ — this is the rebuild's native tier for host-side
// work: fast oracle checks, CPU deployment, and zero-Python assembly).
//
// Deliberately self-contained C++17, no Eigen: triplets -> CSR AᵀA ->
// Jacobi-preconditioned CG in double precision. Exposed as a C ABI consumed
// via ctypes (field_interpolation_tpu/native.py). Constraint conventions
// follow SPEC.md exactly (same rows as the Python oracle in explicit.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Triplet {
  int64_t row;
  int64_t col;
  double value;
};

struct Equation {
  std::vector<Triplet> triplets;
  std::vector<double> rhs;
};

constexpr double kStencils[4][4] = {
    {1, 0, 0, 0},
    {-1, 1, 0, 0},
    {1, -2, 1, 0},
    {-1, 3, -3, 1},
};
constexpr int kStencilLen[4] = {1, 2, 3, 4};

void add_equation(Equation* eq, double weight, double rhs, int n,
                  const int64_t* idxs, const double* coeffs) {
  if (weight == 0.0) return;
  const int64_t row = static_cast<int64_t>(eq->rhs.size());
  for (int i = 0; i < n; ++i) {
    if (coeffs[i] != 0.0) {
      eq->triplets.push_back({row, idxs[i], weight * coeffs[i]});
    }
  }
  eq->rhs.push_back(weight * rhs);
}

struct GridInfo {
  int ndim;
  int64_t sizes[3];
  int64_t strides[3];
  explicit GridInfo(int nd, const int64_t* sz) : ndim(nd) {
    for (int d = 0; d < nd; ++d) sizes[d] = sz[d];
    int64_t acc = 1;
    for (int d = nd - 1; d >= 0; --d) {
      strides[d] = acc;
      acc *= sizes[d];
    }
  }
  int64_t num_nodes() const {
    int64_t n = 1;
    for (int d = 0; d < ndim; ++d) n *= sizes[d];
    return n;
  }
};

bool corner_setup(const GridInfo& g, const double* pos, int64_t* corners,
                  double* frac) {
  for (int d = 0; d < g.ndim; ++d) {
    if (!(pos[d] >= 0.0) || !(pos[d] <= double(g.sizes[d] - 1))) return false;
  }
  int64_t cell[3];
  for (int d = 0; d < g.ndim; ++d) {
    cell[d] = std::min<int64_t>(int64_t(std::floor(pos[d])), g.sizes[d] - 2);
    if (cell[d] < 0) cell[d] = 0;
    frac[d] = pos[d] - double(cell[d]);
  }
  const int C = 1 << g.ndim;
  for (int c = 0; c < C; ++c) {
    int64_t idx = 0;
    for (int d = 0; d < g.ndim; ++d) {
      idx += (cell[d] + ((c >> d) & 1)) * g.strides[d];
    }
    corners[c] = idx;
  }
  return true;
}

void value_constraint(Equation* eq, const GridInfo& g, const double* pos,
                      double value, double weight) {
  int64_t corners[8];
  double frac[3], coeffs[8];
  if (weight == 0.0 || !corner_setup(g, pos, corners, frac)) return;
  const int C = 1 << g.ndim;
  for (int c = 0; c < C; ++c) {
    double w = 1.0;
    for (int d = 0; d < g.ndim; ++d) {
      w *= ((c >> d) & 1) ? frac[d] : 1.0 - frac[d];
    }
    coeffs[c] = w;
  }
  add_equation(eq, weight, value, C, corners, coeffs);
}

void gradient_constraint(Equation* eq, const GridInfo& g, const double* pos,
                         const double* gradient, double weight) {
  int64_t corners[8];
  double frac[3], coeffs[8];
  if (weight == 0.0 || !corner_setup(g, pos, corners, frac)) return;
  const int C = 1 << g.ndim;
  for (int a = 0; a < g.ndim; ++a) {
    for (int c = 0; c < C; ++c) {
      double w = 1.0;
      for (int d = 0; d < g.ndim; ++d) {
        if (d != a) w *= ((c >> d) & 1) ? frac[d] : 1.0 - frac[d];
      }
      coeffs[c] = ((c >> a) & 1) ? w : -w;
    }
    add_equation(eq, weight, gradient[a], C, corners, coeffs);
  }
}

void field_constraints(Equation* eq, const GridInfo& g, const double* model_w) {
  const int64_t n_nodes = g.num_nodes();
  if (model_w[0] != 0.0) {
    const double one = 1.0;
    for (int64_t i = 0; i < n_nodes; ++i) {
      add_equation(eq, model_w[0], 0.0, 1, &i, &one);
    }
  }
  for (int order = 1; order <= 3; ++order) {
    const double w = model_w[order];
    if (w == 0.0) continue;
    const int L = kStencilLen[order];
    for (int ax = 0; ax < g.ndim; ++ax) {
      const int64_t n = g.sizes[ax];
      if (n < L) continue;
      // Iterate all lines along `ax`: every node with coord[ax] == 0.
      for (int64_t node = 0; node < n_nodes; ++node) {
        const int64_t coord = (node / g.strides[ax]) % g.sizes[ax];
        if (coord != 0) continue;
        for (int64_t start = 0; start + L <= n; ++start) {
          int64_t idxs[4];
          for (int k = 0; k < L; ++k) {
            idxs[k] = node + (start + k) * g.strides[ax];
          }
          add_equation(eq, w, 0.0, L, idxs, kStencils[order]);
        }
      }
    }
  }
}

// ---- CSR normal equations + Jacobi-PCG -----------------------------------

struct Csr {
  std::vector<int64_t> indptr;
  std::vector<int64_t> indices;
  std::vector<double> values;
};

// Build AᵀA and Aᵀb directly from triplets: group triplets by row (each row
// is one constraint, few entries), accumulate outer products into a hash-free
// per-column map via sort+merge.
void normal_equations(const Equation& eq, int64_t ncols, Csr* ata,
                      std::vector<double>* atb) {
  std::vector<Triplet> t = eq.triplets;
  std::sort(t.begin(), t.end(), [](const Triplet& a, const Triplet& b) {
    return a.row < b.row;
  });
  atb->assign(ncols, 0.0);
  std::vector<Triplet> prods;  // (col_i, col_j, a_i*a_j) with col_i as .row
  prods.reserve(t.size() * 6);
  size_t i = 0;
  while (i < t.size()) {
    size_t j = i;
    while (j < t.size() && t[j].row == t[i].row) ++j;
    const double b = eq.rhs[t[i].row];
    for (size_t p = i; p < j; ++p) {
      (*atb)[t[p].col] += t[p].value * b;
      for (size_t q = i; q < j; ++q) {
        prods.push_back({t[p].col, t[q].col, t[p].value * t[q].value});
      }
    }
    i = j;
  }
  std::sort(prods.begin(), prods.end(), [](const Triplet& a, const Triplet& b) {
    return a.row != b.row ? a.row < b.row : a.col < b.col;
  });
  ata->indptr.assign(ncols + 1, 0);
  ata->indices.clear();
  ata->values.clear();
  size_t p = 0;
  for (int64_t row = 0; row < ncols; ++row) {
    while (p < prods.size() && prods[p].row == row) {
      int64_t col = prods[p].col;
      double v = 0.0;
      while (p < prods.size() && prods[p].row == row && prods[p].col == col) {
        v += prods[p].value;
        ++p;
      }
      ata->indices.push_back(col);
      ata->values.push_back(v);
    }
    ata->indptr[row + 1] = static_cast<int64_t>(ata->indices.size());
  }
}

void spmv(const Csr& m, const double* x, double* y) {
  const int64_t n = static_cast<int64_t>(m.indptr.size()) - 1;
  for (int64_t r = 0; r < n; ++r) {
    double acc = 0.0;
    for (int64_t p = m.indptr[r]; p < m.indptr[r + 1]; ++p) {
      acc += m.values[p] * x[m.indices[p]];
    }
    y[r] = acc;
  }
}

// Jacobi-PCG on AᵀA x = Aᵀb. Returns iterations used, or -1 if not converged.
int64_t pcg_solve(const Csr& ata, const std::vector<double>& atb, double tol,
                  int64_t maxiter, double* x, const double* x0) {
  const int64_t n = static_cast<int64_t>(atb.size());
  std::vector<double> diag(n, 1.0);
  for (int64_t r = 0; r < n; ++r) {
    for (int64_t p = ata.indptr[r]; p < ata.indptr[r + 1]; ++p) {
      if (ata.indices[p] == r && ata.values[p] > 0) diag[r] = ata.values[p];
    }
  }
  std::vector<double> r(n), z(n), p(n), ap(n);
  if (x0) std::memcpy(x, x0, n * sizeof(double));
  else std::memset(x, 0, n * sizeof(double));
  spmv(ata, x, ap.data());
  double bnorm2 = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    r[i] = atb[i] - ap[i];
    bnorm2 += atb[i] * atb[i];
  }
  if (bnorm2 == 0.0) {
    std::memset(x, 0, n * sizeof(double));
    return 0;
  }
  const double tol2 = tol * tol * bnorm2;
  double rz = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    z[i] = r[i] / diag[i];
    p[i] = z[i];
    rz += r[i] * z[i];
  }
  for (int64_t it = 0; it < maxiter; ++it) {
    double rr = 0.0;
    for (int64_t i = 0; i < n; ++i) rr += r[i] * r[i];
    if (rr <= tol2) return it;
    spmv(ata, p.data(), ap.data());
    double pap = 0.0;
    for (int64_t i = 0; i < n; ++i) pap += p[i] * ap[i];
    if (pap <= 0.0) return -1;
    const double alpha = rz / pap;
    for (int64_t i = 0; i < n; ++i) {
      x[i] += alpha * p[i];
      r[i] -= alpha * ap[i];
    }
    double rz_new = 0.0;
    for (int64_t i = 0; i < n; ++i) {
      z[i] = r[i] / diag[i];
      rz_new += r[i] * z[i];
    }
    const double beta = rz_new / rz;
    rz = rz_new;
    for (int64_t i = 0; i < n; ++i) p[i] = z[i] + beta * p[i];
  }
  return -1;
}

}  // namespace

extern "C" {

void* fi_equation_new() { return new Equation(); }
void fi_equation_free(void* eq) { delete static_cast<Equation*>(eq); }

int64_t fi_equation_rows(void* eq) {
  return static_cast<int64_t>(static_cast<Equation*>(eq)->rhs.size());
}
int64_t fi_equation_nnz(void* eq) {
  return static_cast<int64_t>(static_cast<Equation*>(eq)->triplets.size());
}

void fi_add_equation(void* eq, double weight, double rhs, int n,
                     const int64_t* idxs, const double* coeffs) {
  add_equation(static_cast<Equation*>(eq), weight, rhs, n, idxs, coeffs);
}

void fi_add_field_constraints(void* eq, int ndim, const int64_t* sizes,
                              const double* model_weights) {
  GridInfo g(ndim, sizes);
  field_constraints(static_cast<Equation*>(eq), g, model_weights);
}

void fi_add_value_constraints(void* eq, int ndim, const int64_t* sizes,
                              int64_t n, const double* positions,
                              const double* values, const double* weights) {
  GridInfo g(ndim, sizes);
  for (int64_t i = 0; i < n; ++i) {
    value_constraint(static_cast<Equation*>(eq), g, positions + i * ndim,
                     values[i], weights[i]);
  }
}

void fi_add_gradient_constraints(void* eq, int ndim, const int64_t* sizes,
                                 int64_t n, const double* positions,
                                 const double* gradients,
                                 const double* weights) {
  GridInfo g(ndim, sizes);
  for (int64_t i = 0; i < n; ++i) {
    gradient_constraint(static_cast<Equation*>(eq), g, positions + i * ndim,
                        gradients + i * ndim, weights[i]);
  }
}

// Export the raw rows for cross-checking against other implementations.
void fi_equation_export(void* eqp, int64_t* rows, int64_t* cols,
                        double* values, double* rhs) {
  const Equation* eq = static_cast<Equation*>(eqp);
  for (size_t i = 0; i < eq->triplets.size(); ++i) {
    rows[i] = eq->triplets[i].row;
    cols[i] = eq->triplets[i].col;
    values[i] = eq->triplets[i].value;
  }
  for (size_t i = 0; i < eq->rhs.size(); ++i) rhs[i] = eq->rhs[i];
}

// Solve min ||Ax-b||² via normal equations + Jacobi-PCG (double precision).
// Returns iterations used, or -1 if not converged.
int64_t fi_solve_normal_cg(void* eqp, int64_t ncols, double tol,
                           int64_t maxiter, double* x, const double* x0) {
  Equation* eq = static_cast<Equation*>(eqp);
  Csr ata;
  std::vector<double> atb;
  normal_equations(*eq, ncols, &ata, &atb);
  return pcg_solve(ata, atb, tol, maxiter, x, x0);
}

// Flagship one-call driver (reference C6): smoothness + per-point value row
// f(p)=0 + gradient rows ∇f(p)=n̂, then solve.
int64_t fi_sdf_from_points(int ndim, const int64_t* sizes,
                           const double* model_weights, double data_pos,
                           double data_gradient, int64_t n,
                           const double* positions, const double* normals,
                           const double* point_weights, double tol,
                           int64_t maxiter, double* x) {
  Equation eq;
  GridInfo g(ndim, sizes);
  field_constraints(&eq, g, model_weights);
  for (int64_t i = 0; i < n; ++i) {
    const double pw = point_weights ? point_weights[i] : 1.0;
    value_constraint(&eq, g, positions + i * ndim, 0.0, data_pos * pw);
    gradient_constraint(&eq, g, positions + i * ndim, normals + i * ndim,
                        data_gradient * pw);
  }
  Csr ata;
  std::vector<double> atb;
  normal_equations(eq, g.num_nodes(), &ata, &atb);
  return pcg_solve(ata, atb, tol, maxiter, x, nullptr);
}

// Reference C9 (solve_sparse_linear_approximate_lattice, SURVEY.md §3.5):
// assemble + solve the SAME constraint set on a downscaled lattice, then
// multilinearly upsample. Conventions identical to the Python oracle
// (explicit.py): coarse sizes max(2, (n-1)/downscale + 1), positions scaled
// per axis by (cn-1)/(fn-1), per-unit-length gradient targets divided by
// that scale, NO value rescale of the upsampled field (SDF callers rescale
// by the spacing ratio themselves). Returns coarse-solve iterations, or -1.
int64_t fi_solve_approximate_lattice(
    int ndim, const int64_t* sizes, const double* model_weights,
    double data_pos, double data_gradient, int64_t n,
    const double* positions, const double* values, const double* gradients,
    const double* point_weights, int64_t downscale, double tol,
    int64_t maxiter, double* x) {
  int64_t csizes[3];
  double scale[3];
  for (int d = 0; d < ndim; ++d) {
    csizes[d] = std::max<int64_t>(2, (sizes[d] - 1) / downscale + 1);
    scale[d] = static_cast<double>(csizes[d] - 1)
               / static_cast<double>(sizes[d] - 1);
  }
  Equation eq;
  GridInfo g(ndim, csizes);
  field_constraints(&eq, g, model_weights);
  std::vector<double> cpos(n * ndim), cgrad;
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < ndim; ++d) {
      cpos[i * ndim + d] = positions[i * ndim + d] * scale[d];
    }
  }
  if (gradients) {
    cgrad.resize(n * ndim);
    for (int64_t i = 0; i < n; ++i) {
      for (int d = 0; d < ndim; ++d) {
        cgrad[i * ndim + d] = gradients[i * ndim + d] / scale[d];
      }
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    const double pw = point_weights ? point_weights[i] : 1.0;
    value_constraint(&eq, g, cpos.data() + i * ndim, values[i],
                     data_pos * pw);
    if (gradients) {
      gradient_constraint(&eq, g, cpos.data() + i * ndim,
                          cgrad.data() + i * ndim, data_gradient * pw);
    }
  }
  Csr ata;
  std::vector<double> atb;
  normal_equations(eq, g.num_nodes(), &ata, &atb);
  std::vector<double> xc(g.num_nodes());
  const int64_t it = pcg_solve(ata, atb, tol, maxiter, xc.data(), nullptr);
  if (it < 0) return -1;
  // Separable endpoint-aligned multilinear upsample, one axis at a time
  // (same map as explicit._multilinear_resize).
  int64_t dims[3];
  for (int d = 0; d < ndim; ++d) dims[d] = csizes[d];
  for (int ax = 0; ax < ndim; ++ax) {
    const int64_t n_in = dims[ax];
    const int64_t n_out = sizes[ax];
    if (n_in == n_out) continue;
    int64_t inner = 1, outer = 1;
    for (int d = ax + 1; d < ndim; ++d) inner *= dims[d];
    for (int d = 0; d < ax; ++d) outer *= dims[d];
    std::vector<double> out(outer * n_out * inner);
    for (int64_t r = 0; r < n_out; ++r) {
      const double src = static_cast<double>(r)
                         * static_cast<double>(n_in - 1)
                         / static_cast<double>(n_out - 1);
      int64_t lo = static_cast<int64_t>(std::floor(src));
      lo = std::min(std::max<int64_t>(lo, 0), n_in - 2);
      const double t = src - static_cast<double>(lo);
      for (int64_t o = 0; o < outer; ++o) {
        for (int64_t i = 0; i < inner; ++i) {
          out[(o * n_out + r) * inner + i] =
              (1.0 - t) * xc[(o * n_in + lo) * inner + i]
              + t * xc[(o * n_in + lo + 1) * inner + i];
        }
      }
    }
    xc = std::move(out);
    dims[ax] = n_out;
  }
  std::memcpy(x, xc.data(), xc.size() * sizeof(double));
  return it;
}

}  // extern "C"
