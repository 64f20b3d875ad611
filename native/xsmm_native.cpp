// xsmm_native: native host runtime for libxsmm_tpu.
//
// C++ re-implementation of the reference's host-side L0/L3 machinery
// (/root/reference/src/libxsmm_hash.c CRC32, src/libxsmm_main.c code
// registry: open-addressed table, linear probing, striped locks, atomic
// slot publish — internal_find_code :2730-2969), adapted to its TPU role:
// the registry maps descriptor byte-blobs to opaque 64-bit handles (the
// Python layer owns the actual compiled callables), and a persistent
// key-value store keeps autotune decisions and serialized XLA executables
// across processes (the analogue of the reference's AOT static kernels +
// binary export, SURVEY.md §5.4).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC32C (software, slice-by-1; the reference dispatches to SSE4.2 when
// available — src/libxsmm_main.c:1172 — but this is never a hot path here)
// ---------------------------------------------------------------------------

uint32_t crc32c_table[256];
std::once_flag crc_init_flag;

void init_crc_table() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int j = 0; j < 8; ++j)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    crc32c_table[i] = c;
  }
}

uint32_t crc32c(const void* data, size_t size, uint32_t seed) {
  std::call_once(crc_init_flag, init_crc_table);
  uint32_t crc = ~seed;
  const uint8_t* p = static_cast<const uint8_t*>(data);
  for (size_t i = 0; i < size; ++i)
    crc = crc32c_table[(crc ^ p[i]) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

// ---------------------------------------------------------------------------
// Registry: open-addressed table of (key blob -> uint64 handle)
// Capacity and key limits mirror src/libxsmm_main.h:17-18 (131072 slots)
// and the <=96B descriptor contract (include/libxsmm_typedefs.h:142-153).
// ---------------------------------------------------------------------------

constexpr size_t kCapacity = 131072;      // power of two
constexpr size_t kMaxKey = 96;
constexpr size_t kNumLocks = 256;         // striped write locks

struct Slot {
  std::atomic<uint8_t> state{0};          // 0 empty, 1 busy(write), 2 full
  uint8_t keylen{0};
  uint8_t key[kMaxKey];
  uint64_t value{0};
};

struct Registry {
  std::vector<Slot> slots{kCapacity};
  std::mutex locks[kNumLocks];
  std::atomic<uint64_t> nentries{0};
  std::atomic<uint64_t> nhits{0};
  std::atomic<uint64_t> ncollisions{0};
};

bool key_eq(const Slot& s, const void* key, size_t len) {
  return s.keylen == len && 0 == std::memcmp(s.key, key, len);
}

}  // namespace

extern "C" {

uint32_t xsmm_crc32(const void* data, uint64_t size, uint32_t seed) {
  return crc32c(data, static_cast<size_t>(size), seed);
}

void* xsmm_registry_create() { return new Registry(); }

void xsmm_registry_destroy(void* r) { delete static_cast<Registry*>(r); }

// Insert key->value. Returns 0 on success, 1 if key existed (value
// unchanged, like the reference's first-build-wins publish), -1 if full
// or the key is oversized.
int xsmm_registry_insert(void* rp, const void* key, uint64_t keylen,
                         uint64_t value) {
  if (keylen == 0 || keylen > kMaxKey) return -1;
  Registry& r = *static_cast<Registry*>(rp);
  const uint32_t h = crc32c(key, keylen, 25071975u /* seed, arbitrary */);
  for (size_t probe = 0; probe < kCapacity; ++probe) {
    const size_t i = (h + probe) & (kCapacity - 1);
    Slot& s = r.slots[i];
    uint8_t st = s.state.load(std::memory_order_acquire);
    if (st == 2) {
      if (key_eq(s, key, keylen)) return 1;
      r.ncollisions.fetch_add(1, std::memory_order_relaxed);
      continue;
    }
    std::lock_guard<std::mutex> g(r.locks[i & (kNumLocks - 1)]);
    st = s.state.load(std::memory_order_acquire);
    if (st == 2) {
      if (key_eq(s, key, keylen)) return 1;
      continue;  // collided while we waited; keep probing
    }
    s.keylen = static_cast<uint8_t>(keylen);
    std::memcpy(s.key, key, keylen);
    s.value = value;
    s.state.store(2, std::memory_order_release);  // atomic publish
    r.nentries.fetch_add(1, std::memory_order_relaxed);
    return 0;
  }
  return -1;  // exhausted (reference: probe wrap -> NULL, :2902-2907)
}

// Lookup. Returns 1 and writes *value on hit, 0 on miss.
int xsmm_registry_find(void* rp, const void* key, uint64_t keylen,
                       uint64_t* value) {
  if (keylen == 0 || keylen > kMaxKey) return 0;
  Registry& r = *static_cast<Registry*>(rp);
  const uint32_t h = crc32c(key, keylen, 25071975u);
  for (size_t probe = 0; probe < kCapacity; ++probe) {
    const size_t i = (h + probe) & (kCapacity - 1);
    const Slot& s = r.slots[i];
    const uint8_t st = s.state.load(std::memory_order_acquire);
    if (st == 0) return 0;  // empty slot terminates the probe chain
    if (st == 2 && key_eq(s, key, keylen)) {
      *value = s.value;
      r.nhits.fetch_add(1, std::memory_order_relaxed);
      return 1;
    }
  }
  return 0;
}

void xsmm_registry_stats(void* rp, uint64_t* nentries, uint64_t* nhits,
                         uint64_t* ncollisions, uint64_t* capacity) {
  Registry& r = *static_cast<Registry*>(rp);
  *nentries = r.nentries.load();
  *nhits = r.nhits.load();
  *ncollisions = r.ncollisions.load();
  *capacity = kCapacity;
}

// ---------------------------------------------------------------------------
// Persistent KV store: append-only record log.
// Record: magic | crc32(of payload) | keylen | vallen | key | val
// Used for autotune decisions and serialized executables (SURVEY.md §5.4).
// ---------------------------------------------------------------------------

struct KvHeader {
  uint32_t magic;
  uint32_t crc;
  uint64_t keylen;
  uint64_t vallen;
};
constexpr uint32_t kMagic = 0x58534D4Du;  // "XSMM"

int xsmm_kv_append(const char* path, const void* key, uint64_t keylen,
                   const void* val, uint64_t vallen) {
  std::FILE* f = std::fopen(path, "ab");
  if (!f) return -1;
  KvHeader h{kMagic, 0, keylen, vallen};
  uint32_t crc = crc32c(key, keylen, 0);
  h.crc = crc32c(val, vallen, crc);
  int ok = 1;
  ok &= std::fwrite(&h, sizeof(h), 1, f) == 1;
  ok &= keylen == 0 || std::fwrite(key, 1, keylen, f) == keylen;
  ok &= vallen == 0 || std::fwrite(val, 1, vallen, f) == vallen;
  std::fclose(f);
  return ok ? 0 : -1;
}

// Scan the log for the LAST record matching key (later entries win so
// re-tuning overrides). Returns value length, copies min(len, bufsize)
// into buf; -1 when absent, -2 on corruption (bad crc records skipped).
int64_t xsmm_kv_lookup(const char* path, const void* key, uint64_t keylen,
                       void* buf, uint64_t bufsize) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<uint8_t> kbuf, vbuf, found;
  bool have = false;
  while (true) {
    KvHeader h;
    if (std::fread(&h, sizeof(h), 1, f) != 1) break;
    if (h.magic != kMagic || h.keylen > (1u << 20) ||
        h.vallen > (1u << 30)) {
      break;  // corrupt tail; stop scanning
    }
    kbuf.resize(h.keylen);
    vbuf.resize(h.vallen);
    if (h.keylen && std::fread(kbuf.data(), 1, h.keylen, f) != h.keylen)
      break;
    if (h.vallen && std::fread(vbuf.data(), 1, h.vallen, f) != h.vallen)
      break;
    uint32_t crc = crc32c(kbuf.data(), h.keylen, 0);
    crc = crc32c(vbuf.data(), h.vallen, crc);
    if (crc != h.crc) continue;  // skip damaged record
    if (h.keylen == keylen &&
        0 == std::memcmp(kbuf.data(), key, keylen)) {
      found = vbuf;
      have = true;
    }
  }
  std::fclose(f);
  if (!have) return -1;
  const uint64_t n = found.size() < bufsize ? found.size() : bufsize;
  if (n) std::memcpy(buf, found.data(), n);
  return static_cast<int64_t>(found.size());
}

}  // extern "C"
