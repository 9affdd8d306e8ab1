// Native setup kernels for amg_tpu: CSR SpGEMM (Gustavson), transpose,
// Galerkin RAP, and PMIS coarsening.
//
// These are the setup-time graph algorithms the reference obtains from
// hypre/Eigen (reference: hypre_CSRMatrixMultiply / hypre_ParMatmul,
// EigenMatMat src/SMEM_Setup.cpp:1256-1339, BoomerAMG PMIS coarsening) —
// implemented natively because they are irregular row-wise algorithms that
// do not map to TPU kernels; they run once per matrix on the host.
//
// C ABI for ctypes: output arrays are malloc'd here and released with
// amg_free. Indices are int32, values double (setup is always f64).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

void amg_free(void *p) { free(p); }

// C = A(m×k) * B(k×n), CSR in, CSR out (Gustavson, dense accumulator).
// Returns nnz(C); fills *c_indptr/*c_indices/*c_data (malloc'd).
int64_t spgemm_csr(int32_t m, int32_t k, int32_t n,
                   const int32_t *a_indptr, const int32_t *a_indices,
                   const double *a_data,
                   const int32_t *b_indptr, const int32_t *b_indices,
                   const double *b_data,
                   int32_t **c_indptr_out, int32_t **c_indices_out,
                   double **c_data_out) {
  int32_t *c_indptr = (int32_t *)malloc(sizeof(int32_t) * (m + 1));
  std::vector<double> acc(n, 0.0);
  std::vector<int32_t> mark(n, -1);
  std::vector<int32_t> cols;
  // pass 1+2 fused with growable output
  std::vector<int32_t> out_idx;
  std::vector<double> out_val;
  out_idx.reserve((size_t)m * 8);
  out_val.reserve((size_t)m * 8);
  c_indptr[0] = 0;
  for (int32_t i = 0; i < m; i++) {
    cols.clear();
    for (int32_t jj = a_indptr[i]; jj < a_indptr[i + 1]; jj++) {
      int32_t j = a_indices[jj];
      double av = a_data[jj];
      for (int32_t kk = b_indptr[j]; kk < b_indptr[j + 1]; kk++) {
        int32_t col = b_indices[kk];
        if (mark[col] != i) {
          mark[col] = i;
          acc[col] = 0.0;
          cols.push_back(col);
        }
        acc[col] += av * b_data[kk];
      }
    }
    // sorted output rows (match scipy's canonical form)
    std::sort(cols.begin(), cols.end());
    for (int32_t col : cols) {
      out_idx.push_back(col);
      out_val.push_back(acc[col]);
    }
    c_indptr[i + 1] = (int32_t)out_idx.size();
  }
  int64_t nnz = (int64_t)out_idx.size();
  int32_t *ci = (int32_t *)malloc(sizeof(int32_t) * (nnz ? nnz : 1));
  double *cv = (double *)malloc(sizeof(double) * (nnz ? nnz : 1));
  memcpy(ci, out_idx.data(), sizeof(int32_t) * nnz);
  memcpy(cv, out_val.data(), sizeof(double) * nnz);
  *c_indptr_out = c_indptr;
  *c_indices_out = ci;
  *c_data_out = cv;
  return nnz;
}

// B = A^T for A(m×n) CSR; B is n×m CSR. Counting sort, O(nnz).
void csr_transpose(int32_t m, int32_t n, const int32_t *a_indptr,
                   const int32_t *a_indices, const double *a_data,
                   int32_t *b_indptr, int32_t *b_indices, double *b_data) {
  int64_t nnz = a_indptr[m];
  memset(b_indptr, 0, sizeof(int32_t) * (n + 1));
  for (int64_t e = 0; e < nnz; e++) b_indptr[a_indices[e] + 1]++;
  for (int32_t i = 0; i < n; i++) b_indptr[i + 1] += b_indptr[i];
  std::vector<int32_t> next(b_indptr, b_indptr + n);
  for (int32_t i = 0; i < m; i++) {
    for (int32_t jj = a_indptr[i]; jj < a_indptr[i + 1]; jj++) {
      int32_t j = a_indices[jj];
      int32_t pos = next[j]++;
      b_indices[pos] = i;
      b_data[pos] = a_data[jj];
    }
  }
}

// PMIS C/F splitting on a strength pattern S (CSR, m×m, pattern only).
// measure = |S^T column count| + LCG pseudo-random in [0,1) seeded by
// `seed` (deterministic, like the reference's srand(0) pinning,
// reference: src/SMEM_Main.cpp:674). cf_out: 1 = C, 0 = F.
void pmis_coarsen(int32_t n, const int32_t *s_indptr,
                  const int32_t *s_indices, uint64_t seed, int8_t *cf_out) {
  std::vector<double> meas(n, 0.0);
  for (int32_t i = 0; i < n; i++)
    for (int32_t jj = s_indptr[i]; jj < s_indptr[i + 1]; jj++)
      meas[s_indices[jj]] += 1.0;  // in-degree = |S^T row|
  // splitmix64 per-index random, independent of iteration order
  for (int32_t i = 0; i < n; i++) {
    uint64_t z = seed + 0x9e3779b97f4a7c15ULL * (uint64_t)(i + 1);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    z = z ^ (z >> 31);
    meas[i] += (double)(z >> 11) / 9007199254740992.0;  // [0,1)
  }
  // symmetrized adjacency via S + S^T walk: build S^T indptr once
  std::vector<int32_t> st_indptr(n + 1, 0), st_indices(s_indptr[n]);
  for (int32_t i = 0; i < n; i++)
    for (int32_t jj = s_indptr[i]; jj < s_indptr[i + 1]; jj++)
      st_indptr[s_indices[jj] + 1]++;
  for (int32_t i = 0; i < n; i++) st_indptr[i + 1] += st_indptr[i];
  {
    std::vector<int32_t> next(st_indptr.begin(), st_indptr.end() - 1);
    for (int32_t i = 0; i < n; i++)
      for (int32_t jj = s_indptr[i]; jj < s_indptr[i + 1]; jj++)
        st_indices[next[s_indices[jj]]++] = i;
  }
  const int8_t UND = -1, F = 0, C = 1;
  std::vector<int8_t> cf(n, UND);
  // isolated points → F
  for (int32_t i = 0; i < n; i++)
    if (s_indptr[i + 1] == s_indptr[i] && st_indptr[i + 1] == st_indptr[i])
      cf[i] = F;
  bool changed = true;
  std::vector<int8_t> snap(n);
  while (changed) {
    changed = false;
    // round-synchronous independent set: decisions read a snapshot, so the
    // result is iteration-order independent (parallel PMIS semantics)
    memcpy(snap.data(), cf.data(), n);
    for (int32_t i = 0; i < n; i++) {
      if (snap[i] != UND) continue;
      bool win = true;
      for (int32_t jj = s_indptr[i]; win && jj < s_indptr[i + 1]; jj++) {
        int32_t j = s_indices[jj];
        if (snap[j] == UND && meas[j] >= meas[i] && j != i) win = false;
      }
      for (int32_t jj = st_indptr[i]; win && jj < st_indptr[i + 1]; jj++) {
        int32_t j = st_indices[jj];
        if (snap[j] == UND && meas[j] >= meas[i] && j != i) win = false;
      }
      if (win) {
        cf[i] = C;
        changed = true;
      }
    }
    // undecided points depending on a new C become F
    for (int32_t i = 0; i < n; i++) {
      if (cf[i] != UND) continue;
      for (int32_t jj = s_indptr[i]; jj < s_indptr[i + 1]; jj++) {
        if (cf[s_indices[jj]] == C) {
          cf[i] = F;
          changed = true;
          break;
        }
      }
    }
  }
  for (int32_t i = 0; i < n; i++) cf_out[i] = (cf[i] == C) ? 1 : 0;
}

}  // extern "C"
