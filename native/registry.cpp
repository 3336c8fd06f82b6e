// Native code registry: CRC32C-hashed open-addressing table of packed
// descriptor keys -> integer slots.
//
// TPU-native analog of the reference's internal_find_code registry
// (src/libxsmm_main.c:1697-1925 in the reference repo): same scheme —
// CRC32C of a <=32-byte packed descriptor, linear probing over a
// power-of-two table, lock-free reads via atomic slot states, first-writer
// wins on insert.  The "code pointer" here is an integer slot index into a
// Python-side table of compiled JAX callables (XLA owns the machine code;
// this table owns the dispatch).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

constexpr int kKeyMax = 48;

struct Entry {
  std::atomic<int> state;   // 0 empty, 1 writing, 2 ready
  int32_t value;
  uint8_t keylen;
  uint8_t key[kKeyMax];
};

struct Registry {
  Entry* entries;
  uint32_t mask;       // capacity - 1
  std::atomic<int64_t> size;
};

// CRC32C (Castagnoli), 8-bit table, software — the portable fallback the
// reference also ships (libxsmm_hash.c software path).
uint32_t g_crc_table[256];
bool g_crc_init = false;

void crc_init() {
  if (g_crc_init) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    g_crc_table[i] = c;
  }
  g_crc_init = true;
}

inline uint32_t crc32c(const uint8_t* data, size_t len, uint32_t seed) {
  uint32_t c = ~seed;
  for (size_t i = 0; i < len; ++i)
    c = g_crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return ~c;
}

inline bool key_eq(const Entry& e, const uint8_t* key, int len) {
  return e.keylen == len && std::memcmp(e.key, key, (size_t)len) == 0;
}

}  // namespace

extern "C" {

void* xsmm_reg_create(uint32_t capacity) {
  crc_init();
  // round capacity up to a power of two (reference: 131072 slots)
  uint32_t cap = 1;
  while (cap < capacity) cap <<= 1;
  Registry* r = new Registry();
  r->entries = static_cast<Entry*>(std::calloc(cap, sizeof(Entry)));
  if (!r->entries) { delete r; return nullptr; }
  r->mask = cap - 1;
  r->size.store(0);
  return r;
}

void xsmm_reg_destroy(void* h) {
  Registry* r = static_cast<Registry*>(h);
  if (!r) return;
  std::free(r->entries);
  delete r;
}

uint32_t xsmm_crc32(const void* data, uint64_t len, uint32_t seed) {
  crc_init();
  return crc32c(static_cast<const uint8_t*>(data), (size_t)len, seed);
}

// Returns the value for key, or -1 if absent. Lock-free.
int32_t xsmm_reg_find(void* h, const void* key, int32_t len) {
  Registry* r = static_cast<Registry*>(h);
  const uint8_t* k = static_cast<const uint8_t*>(key);
  if (len > kKeyMax) return -1;
  uint32_t idx = crc32c(k, (size_t)len, 25071975u) & r->mask;
  for (uint32_t probe = 0; probe <= r->mask; ++probe) {
    Entry& e = r->entries[(idx + probe) & r->mask];
    int s = e.state.load(std::memory_order_acquire);
    if (s == 0) return -1;                    // empty: not present
    if (s == 2 && key_eq(e, k, len)) return e.value;
    // s == 1 (being written) or collision: keep probing
  }
  return -1;
}

// Insert key -> value if absent; returns the winning value (== value if we
// won the race, the earlier writer's value otherwise), or -2 when full.
int32_t xsmm_reg_insert(void* h, const void* key, int32_t len,
                        int32_t value) {
  Registry* r = static_cast<Registry*>(h);
  const uint8_t* k = static_cast<const uint8_t*>(key);
  if (len > kKeyMax) return -2;
  uint32_t idx = crc32c(k, (size_t)len, 25071975u) & r->mask;
  for (uint32_t probe = 0; probe <= r->mask; ++probe) {
    Entry& e = r->entries[(idx + probe) & r->mask];
    int expected = 0;
    if (e.state.compare_exchange_strong(expected, 1,
                                        std::memory_order_acq_rel)) {
      // we own the empty slot
      e.value = value;
      e.keylen = (uint8_t)len;
      std::memcpy(e.key, k, (size_t)len);
      e.state.store(2, std::memory_order_release);
      r->size.fetch_add(1);
      return value;
    }
    // occupied (or being written): wait for ready, then compare
    int s;
    do {
      s = e.state.load(std::memory_order_acquire);
    } while (s == 1);
    if (s == 2 && key_eq(e, k, len)) return e.value;
  }
  return -2;  // table full
}

int64_t xsmm_reg_size(void* h) {
  return static_cast<Registry*>(h)->size.load();
}

void xsmm_reg_clear(void* h) {
  Registry* r = static_cast<Registry*>(h);
  uint32_t cap = r->mask + 1;
  std::memset(static_cast<void*>(r->entries), 0, sizeof(Entry) * cap);
  r->size.store(0);
}

}  // extern "C"
