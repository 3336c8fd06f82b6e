// Native prefetching training-data loader — the GxM data-layer analog.
//
// Reference: the GxM framework feeds training from an LMDB/JPEG data layer
// with background I/O threads (samples/deeplearning/gxm, documentation/
// gxm.md).  TPU-native equivalent: a C++ worker pool that reads a packed
// uint8 dataset file, decodes/normalizes records to float32, and keeps a
// ring of prefetched batches ready so the host input pipeline never stalls
// the device step.  Exposed through a plain C ABI (ctypes; no pybind11 in
// this environment) — see xsmm_tpu/utils/dataset.py.
//
// Dataset format "XSD1" (little-endian):
//   u32 magic 0x31445358 ("XSD1"), u32 nclasses, u64 count,
//   u32 h, u32 w, u32 c
//   then `count` records: u32 label, u8 image[h*w*c]
//
// Batches are drawn in a per-epoch shuffled order (xorshift-seeded), the
// analog of GxM's epoch shuffling; normalization is x/255 - 0.5.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <numeric>
#include <thread>
#include <vector>

namespace {

// Packed to match the Python writer's struct "<IIQIII" (28 bytes) exactly —
// the natural alignment of the u64 member would pad sizeof to 32 and shift
// every record offset.
#pragma pack(push, 1)
struct Header {
  uint32_t magic;
  uint32_t nclasses;
  uint64_t count;
  uint32_t h, w, c;
};
#pragma pack(pop)
static_assert(sizeof(Header) == 28, "header must match the packed format");

constexpr uint32_t kMagic = 0x31445358u;  // "XSD1"

struct Slot {
  std::vector<float> images;
  std::vector<int32_t> labels;
  uint64_t seq = 0;   // which batch index this slot holds
  bool full = false;
};

struct Loader {
  FILE* f = nullptr;
  Header hdr{};
  int batch = 0;
  uint64_t rec_bytes = 0;      // bytes per record (4 + h*w*c)
  uint64_t nbatches = 0;       // per epoch (count / batch, floor)
  uint64_t seed = 0;

  std::vector<Slot> ring;
  std::mutex mu;               // guards ring/seq counters
  std::condition_variable cv_produce, cv_consume;
  std::atomic<bool> stop{false};
  uint64_t next_produce = 0;   // next global batch index to produce
  uint64_t next_consume = 0;   // next global batch index to hand out
  std::vector<std::thread> workers;

  std::mutex io_mu;            // serializes pread-style access to f
  std::vector<uint32_t> perm;  // current epoch permutation of records
  uint64_t perm_epoch = ~0ull;

  ~Loader() {
    stop.store(true);
    cv_produce.notify_all();
    cv_consume.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    if (f) fclose(f);
  }
};

uint64_t xorshift(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

// Rebuild the record permutation for `epoch` (Fisher-Yates, seeded).
void ensure_perm(Loader* L, uint64_t epoch) {
  if (L->perm_epoch == epoch) return;
  L->perm.resize(L->hdr.count);
  std::iota(L->perm.begin(), L->perm.end(), 0u);
  uint64_t s = L->seed * 0x9E3779B97F4A7C15ull + epoch + 1;
  for (uint64_t i = L->hdr.count - 1; i > 0; --i) {
    uint64_t j = xorshift(&s) % (i + 1);
    std::swap(L->perm[i], L->perm[j]);
  }
  L->perm_epoch = epoch;
}

// Produce global batch `seq` into `slot`.
bool produce(Loader* L, uint64_t seq, Slot* slot) {
  const uint64_t epoch = seq / L->nbatches;
  const uint64_t bi = seq % L->nbatches;
  const uint64_t px = uint64_t(L->hdr.h) * L->hdr.w * L->hdr.c;
  std::vector<uint8_t> rec(L->rec_bytes);

  for (int i = 0; i < L->batch; ++i) {
    uint64_t ridx;
    {
      std::lock_guard<std::mutex> g(L->io_mu);
      ensure_perm(L, epoch);
      ridx = L->perm[bi * L->batch + i];
      const uint64_t off = sizeof(Header) + ridx * L->rec_bytes;
#if defined(_WIN32)
      if (fseek(L->f, long(off), SEEK_SET) != 0) return false;
#else
      if (fseeko(L->f, off_t(off), SEEK_SET) != 0) return false;
#endif
      if (fread(rec.data(), 1, L->rec_bytes, L->f) != L->rec_bytes)
        return false;
    }
    int32_t label;
    memcpy(&label, rec.data(), 4);
    slot->labels[i] = label;
    float* out = slot->images.data() + uint64_t(i) * px;
    const uint8_t* in = rec.data() + 4;
    for (uint64_t p = 0; p < px; ++p)
      out[p] = float(in[p]) * (1.0f / 255.0f) - 0.5f;
  }
  return true;
}

void worker(Loader* L) {
  for (;;) {
    uint64_t seq;
    Slot* slot;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_produce.wait(lk, [&] {
        return L->stop.load() ||
               L->next_produce < L->next_consume + L->ring.size();
      });
      if (L->stop.load()) return;
      seq = L->next_produce++;
      slot = &L->ring[seq % L->ring.size()];
      slot->full = false;
    }
    const bool ok = produce(L, seq, slot);
    {
      // publish under the lock: the consumer reads seq/full under mu
      std::lock_guard<std::mutex> g(L->mu);
      if (!ok) {
        // I/O failure: fail loudly so the consumer unblocks with -1
        // instead of waiting forever on a slot that will never fill
        L->stop.store(true);
        L->cv_consume.notify_all();
        L->cv_produce.notify_all();
        return;
      }
      slot->seq = seq;
      slot->full = true;
      L->cv_consume.notify_all();
    }
  }
}

}  // namespace

extern "C" {

void* xsmm_dl_open(const char* path, int batch, int prefetch, int nthreads,
                   uint64_t seed) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  Header hdr;
  if (fread(&hdr, sizeof(hdr), 1, f) != 1 || hdr.magic != kMagic ||
      hdr.count == 0 || batch <= 0 || uint64_t(batch) > hdr.count) {
    fclose(f);
    return nullptr;
  }
  auto* L = new Loader();
  L->f = f;
  L->hdr = hdr;
  L->batch = batch;
  L->rec_bytes = 4 + uint64_t(hdr.h) * hdr.w * hdr.c;
  L->nbatches = hdr.count / batch;
  L->seed = seed ? seed : 42;
  const uint64_t px = uint64_t(hdr.h) * hdr.w * hdr.c;
  if (prefetch < 2) prefetch = 2;
  L->ring.resize(prefetch);
  for (auto& s : L->ring) {
    s.images.resize(uint64_t(batch) * px);
    s.labels.resize(batch);
  }
  if (nthreads < 1) nthreads = 1;
  for (int t = 0; t < nthreads; ++t)
    L->workers.emplace_back(worker, L);
  return L;
}

int64_t xsmm_dl_count(void* h) { return int64_t(((Loader*)h)->hdr.count); }
int64_t xsmm_dl_batches_per_epoch(void* h) {
  return int64_t(((Loader*)h)->nbatches);
}
int32_t xsmm_dl_height(void* h) { return ((Loader*)h)->hdr.h; }
int32_t xsmm_dl_width(void* h) { return ((Loader*)h)->hdr.w; }
int32_t xsmm_dl_channels(void* h) { return ((Loader*)h)->hdr.c; }
int32_t xsmm_dl_nclasses(void* h) { return ((Loader*)h)->hdr.nclasses; }

// Copy the next prefetched batch into caller buffers.  Returns the epoch
// index of the batch, or -1 on shutdown/error.
int64_t xsmm_dl_next(void* hh, float* images, int32_t* labels) {
  auto* L = (Loader*)hh;
  uint64_t seq;
  Slot* slot;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    seq = L->next_consume;
    slot = &L->ring[seq % L->ring.size()];
    L->cv_consume.wait(lk, [&] {
      return L->stop.load() || (slot->full && slot->seq == seq);
    });
    if (L->stop.load()) return -1;
  }
  memcpy(images, slot->images.data(), slot->images.size() * sizeof(float));
  memcpy(labels, slot->labels.data(), slot->labels.size() * sizeof(int32_t));
  {
    std::lock_guard<std::mutex> g(L->mu);
    L->next_consume++;
    L->cv_produce.notify_all();
  }
  return int64_t(seq / L->nbatches);
}

void xsmm_dl_close(void* h) { delete (Loader*)h; }

}  // extern "C"
