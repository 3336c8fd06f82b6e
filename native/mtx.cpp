// Fast MatrixMarket coordinate-format parser.
//
// Role analog: the reference reads .mtx operator matrices in its sparse
// generator CLI and sample drivers (generator_spgemm_csr_reader.c); large
// PyFR/SeisSol matrices parse slowly in pure Python, so the runtime's
// reader is native with a Python fallback.
//
// C ABI for ctypes: two-call protocol (open/parse -> copy out -> free).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>

namespace {

struct MtxData {
  int64_t rows, cols, nnz;
  int32_t* ri;
  int32_t* ci;
  double* v;
  int symmetric;
};

}  // namespace

extern "C" {

// Parse a coordinate-format .mtx file. Returns an opaque handle or null.
void* xsmm_mtx_parse(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  char line[512];
  if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return nullptr; }
  if (std::strncmp(line, "%%MatrixMarket", 14) != 0) {
    std::fclose(f);
    return nullptr;
  }
  int symmetric = std::strstr(line, "symmetric") != nullptr;
  int pattern = std::strstr(line, "pattern") != nullptr;
  if (std::strstr(line, "coordinate") == nullptr ||
      std::strstr(line, "skew") != nullptr ||
      std::strstr(line, "hermitian") != nullptr ||
      std::strstr(line, "complex") != nullptr) {
    // array format / skew-symmetric / hermitian / complex: defer to the
    // Python fallback (which rejects unsupported kinds loudly) — note
    // strstr("symmetric") would otherwise match "skew-symmetric" and
    // mirror with the wrong sign
    std::fclose(f);
    return nullptr;
  }
  // skip comments
  do {
    if (!std::fgets(line, sizeof line, f)) { std::fclose(f); return nullptr; }
  } while (line[0] == '%');

  MtxData* d = new MtxData();
  d->symmetric = symmetric;
  long long m = 0, n = 0, nz = 0;
  if (std::sscanf(line, "%lld %lld %lld", &m, &n, &nz) != 3) {
    delete d; std::fclose(f); return nullptr;
  }
  d->rows = m; d->cols = n; d->nnz = nz;
  d->ri = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * nz));
  d->ci = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * nz));
  d->v = static_cast<double*>(std::malloc(sizeof(double) * nz));
  if (!d->ri || !d->ci || !d->v) {
    std::free(d->ri); std::free(d->ci); std::free(d->v);
    delete d; std::fclose(f); return nullptr;
  }
  for (long long i = 0; i < nz; ++i) {
    long long r, c;
    double val = 1.0;
    int got;
    if (pattern) {
      got = std::fscanf(f, "%lld %lld", &r, &c);
    } else {
      got = std::fscanf(f, "%lld %lld %lf", &r, &c, &val);
    }
    if (got != (pattern ? 2 : 3) || r < 1 || c < 1 || r > m || c > n) {
      // truncated/corrupt body: fail loudly (a partially-filled handle
      // with uninitialized indices would silently build wrong kernels)
      std::free(d->ri); std::free(d->ci); std::free(d->v);
      delete d;
      std::fclose(f);
      return nullptr;
    }
    d->ri[i] = (int32_t)(r - 1);
    d->ci[i] = (int32_t)(c - 1);
    d->v[i] = val;
  }
  std::fclose(f);
  return d;
}

int64_t xsmm_mtx_rows(void* h) { return static_cast<MtxData*>(h)->rows; }
int64_t xsmm_mtx_cols(void* h) { return static_cast<MtxData*>(h)->cols; }
int64_t xsmm_mtx_nnz(void* h) { return static_cast<MtxData*>(h)->nnz; }
int xsmm_mtx_symmetric(void* h) {
  return static_cast<MtxData*>(h)->symmetric;
}

void xsmm_mtx_copy(void* h, int32_t* ri, int32_t* ci, double* v) {
  MtxData* d = static_cast<MtxData*>(h);
  std::memcpy(ri, d->ri, sizeof(int32_t) * d->nnz);
  std::memcpy(ci, d->ci, sizeof(int32_t) * d->nnz);
  std::memcpy(v, d->v, sizeof(double) * d->nnz);
}

void xsmm_mtx_free(void* h) {
  MtxData* d = static_cast<MtxData*>(h);
  if (!d) return;
  std::free(d->ri);
  std::free(d->ci);
  std::free(d->v);
  delete d;
}

}  // extern "C"
