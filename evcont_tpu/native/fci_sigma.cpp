// Native FCI kernels: single-excitation operator application.
//
// This is the framework's equivalent of the C core inside pyscf's FCI
// (fci.direct_spin0/1), which the reference leans on for every training
// state (evcont/FCI_EVCont.py:70-71). The hot operations are the
// scatter/gather loops applying all single-excitation operators E_pq to a
// CI matrix; the dense (pq|rs)-contraction between them stays in BLAS via
// numpy. Parallelized over target strings with OpenMP — each thread owns
// disjoint output rows/columns, so no atomics are needed.
//
// Link-table layout ("gather" form, built in solvers/fci_native.py):
//   for each target string I: entries k in [row_ptr[I], row_ptr[I+1]):
//     tbl_pq[k]   flat orbital-pair index (p*norb+q) of E_pq
//     tbl_src[k]  source string J  (E_pq |J> = sign |I>)
//     tbl_sign[k] +-1
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC fci_sigma.cpp
//            -o libfcisigma.so

#include <cstdint>
#include <cstring>

extern "C" {

// D[pq, I, :] += sign * C[J, :]    for all alpha links (row operations)
void expand_alpha(const double* C, double* D,
                  const int64_t* row_ptr, const int32_t* tbl_pq,
                  const int32_t* tbl_src, const double* tbl_sign,
                  int64_t n_str_a, int64_t n_col, int64_t n_pair) {
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t I = 0; I < n_str_a; ++I) {
        for (int64_t k = row_ptr[I]; k < row_ptr[I + 1]; ++k) {
            const double s = tbl_sign[k];
            const double* src = C + (int64_t)tbl_src[k] * n_col;
            double* dst = D + ((int64_t)tbl_pq[k] * n_str_a + I) * n_col;
            for (int64_t c = 0; c < n_col; ++c) dst[c] += s * src[c];
        }
    }
}

// D[pq, r, I] += sign * C[r, J]    for all beta links. Parallelized over
// alpha rows r: the per-row working set D[:, r, :] (n_pair * n_str_b
// doubles) stays cache-resident while the link table streams.
void expand_beta(const double* C, double* D,
                 const int64_t* row_ptr, const int32_t* tbl_pq,
                 const int32_t* tbl_src, const double* tbl_sign,
                 int64_t n_str_a, int64_t n_str_b, int64_t n_pair) {
    const int64_t n_links = row_ptr[n_str_b];
    // flatten the (I, k) iteration: precompute target I per link
#pragma omp parallel
    {
        // per-thread target-index expansion is cheap relative to the loops
#pragma omp for schedule(static)
        for (int64_t r = 0; r < n_str_a; ++r) {
            const double* Crow = C + r * n_str_b;
            double* Drow = D + r * n_str_b;  // + pq * n_str_a * n_str_b
            for (int64_t I = 0; I < n_str_b; ++I) {
                for (int64_t k = row_ptr[I]; k < row_ptr[I + 1]; ++k) {
                    Drow[(int64_t)tbl_pq[k] * n_str_a * n_str_b + I] +=
                        tbl_sign[k] * Crow[tbl_src[k]];
                }
            }
        }
    }
    (void)n_links;
}

// sigma[I, :] += sum over links  sign * G[pq, J, :]     (alpha contraction)
void contract_alpha(const double* G, double* sigma,
                    const int64_t* row_ptr, const int32_t* tbl_pq,
                    const int32_t* tbl_src, const double* tbl_sign,
                    int64_t n_str_a, int64_t n_col, int64_t n_pair) {
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t I = 0; I < n_str_a; ++I) {
        double* dst = sigma + I * n_col;
        for (int64_t k = row_ptr[I]; k < row_ptr[I + 1]; ++k) {
            const double s = tbl_sign[k];
            const double* src =
                G + ((int64_t)tbl_pq[k] * n_str_a + (int64_t)tbl_src[k])
                    * n_col;
            for (int64_t c = 0; c < n_col; ++c) dst[c] += s * src[c];
        }
    }
}

// sigma[r, I] += sum over links  sign * G[pq, r, J]     (beta contraction)
// Same row-parallel structure as expand_beta.
void contract_beta(const double* G, double* sigma,
                   const int64_t* row_ptr, const int32_t* tbl_pq,
                   const int32_t* tbl_src, const double* tbl_sign,
                   int64_t n_str_a, int64_t n_str_b, int64_t n_pair) {
#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n_str_a; ++r) {
        const double* Grow = G + r * n_str_b;
        double* srow = sigma + r * n_str_b;
        for (int64_t I = 0; I < n_str_b; ++I) {
            double acc = 0.0;
            for (int64_t k = row_ptr[I]; k < row_ptr[I + 1]; ++k) {
                acc += tbl_sign[k] *
                    Grow[(int64_t)tbl_pq[k] * n_str_a * n_str_b
                         + tbl_src[k]];
            }
            srow[I] += acc;
        }
    }
}

}  // extern "C"
