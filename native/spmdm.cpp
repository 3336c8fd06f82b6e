// ELL pack for the dynamic-sparsity spmdm slice phase.
//
// Reference: libxsmm_spmdm createSparseSlice converts dense A into blocked
// CSR slices in parallel (src/libxsmm_spmdm.c:540, per-ISA intrinsic
// templates).  TPU-native equivalent: the compute runs on the device from a
// fixed-width ELL layout (xsmm_tpu/ops/spmdm.py), and this single-pass C++
// pack keeps the host slice phase ~1ms at 1024x1024 where numpy needs ~9ms
// (nonzero + scatter passes) and a Python row loop is unusable.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int nthreads_for(int64_t m) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 1;
    return static_cast<int>(std::min<int64_t>(std::min<unsigned>(hw, 16),
                                              std::max<int64_t>(m / 64, 1)));
}

// Branchless per-row pack: always store, conditionally advance — no branch
// mispredictions on random sparsity masks.
int64_t pack_rows(const float* a, int64_t i0, int64_t i1, int64_t k,
                  float tol, int64_t r, float* vals, int32_t* cols) {
    int64_t nnz = 0;
    for (int64_t i = i0; i < i1; ++i) {
        const float* row = a + i * k;
        float* vo = vals + i * r;
        int32_t* co = cols + i * r;
        std::memset(vo, 0, r * sizeof(float));
        std::memset(co, 0, r * sizeof(int32_t));
        int64_t p = 0;
        for (int64_t j = 0; j < k; ++j) {
            const float v = row[j];
            // blind store at the cursor (no load/cmov): a rejected element
            // leaves garbage at position p only, overwritten by the next
            // kept element or re-zeroed after the loop.  Break once full —
            // a rejected trailing element must NOT clobber slot r-1 (a row
            // whose count equals r would lose its last value otherwise).
            vo[p] = v;
            co[p] = static_cast<int32_t>(j);
            p += static_cast<int64_t>(std::fabs(v) > tol);
            if (p == r) break;
        }
        if (p < r) {
            vo[p] = 0.0f;
            co[p] = 0;
        }
        nnz += p;
    }
    return nnz;
}

}  // namespace

extern "C" {

// Max per-row nonzero count of a row-major f32 [m,k] matrix (|a| > tol).
// Row-parallel like the reference's createSparseSlice thread split
// (libxsmm_spmdm.c:540).
int64_t xsmm_ell_rowmax(const float* a, int64_t m, int64_t k, float tol) {
    const int nt = nthreads_for(m);
    std::vector<int64_t> part(nt, 0);
    std::vector<std::thread> ts;
    const int64_t chunk = (m + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        ts.emplace_back([=, &part] {
            const int64_t i0 = t * chunk, i1 = std::min(m, i0 + chunk);
            int64_t rmax = 0;
            for (int64_t i = i0; i < i1; ++i) {
                const float* row = a + i * k;
                int64_t c = 0;
                for (int64_t j = 0; j < k; ++j)
                    c += (std::fabs(row[j]) > tol);
                rmax = std::max(rmax, c);
            }
            part[t] = rmax;
        });
    }
    for (auto& th : ts) th.join();
    int64_t rmax = 0;
    for (int64_t v : part) rmax = std::max(rmax, v);
    return rmax;
}

// Left-pack each row's nonzeros into ELL vals/cols [m, r]; pads with zeros
// (col 0 — in-bounds for the device gather, annihilated by the zero value).
// Returns total nnz.  r must be >= xsmm_ell_rowmax(...).
int64_t xsmm_ell_pack(const float* a, int64_t m, int64_t k, float tol,
                      int64_t r, float* vals, int32_t* cols) {
    const int nt = nthreads_for(m);
    if (nt == 1) return pack_rows(a, 0, m, k, tol, r, vals, cols);
    std::vector<int64_t> part(nt, 0);
    std::vector<std::thread> ts;
    const int64_t chunk = (m + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        ts.emplace_back([=, &part] {
            const int64_t i0 = t * chunk, i1 = std::min(m, i0 + chunk);
            part[t] = pack_rows(a, i0, i1, k, tol, r, vals, cols);
        });
    }
    for (auto& th : ts) th.join();
    int64_t nnz = 0;
    for (int64_t v : part) nnz += v;
    return nnz;
}

}  // extern "C"
