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

#include <fcntl.h>
#include <unistd.h>

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
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
  uint32_t canary{0};                     // crc32c(key || value) at publish
};

struct Registry {
  std::vector<Slot> slots{kCapacity};
  std::mutex locks[kNumLocks];
  std::atomic<uint64_t> nentries{0};
  std::atomic<uint64_t> nhits{0};
  std::atomic<uint64_t> ncollisions{0};
  std::atomic<uint64_t> ncorrupt{0};
};

bool key_eq(const Slot& s, const void* key, size_t len) {
  return s.keylen == len && 0 == std::memcmp(s.key, key, len);
}

// Slot integrity canary: the reference validates its allocator info blocks
// with checksummed canaries on free (src/libxsmm_malloc.c:710, debug
// builds); here every published slot carries crc32c(key || value) so torn
// writes / stray-pointer damage surface as a detected corruption instead
// of a silently wrong kernel handle (SURVEY.md §5.2).
uint32_t slot_canary(const Slot& s) {
  const uint32_t kc = crc32c(s.key, s.keylen, 0x5107u);
  return crc32c(&s.value, sizeof(s.value), kc);
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
    s.canary = slot_canary(s);
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
      if (s.canary != slot_canary(s)) {
        // detected slot damage: surface as a MISS (caller rebuilds) and
        // count it — never hand back a possibly-wrong kernel handle
        r.ncorrupt.fetch_add(1, std::memory_order_relaxed);
        return 0;
      }
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

// Full-table integrity sweep (SURVEY.md §5.2 sanitizer-class check): walk
// every published slot and validate its canary. Returns the number of
// corrupt slots found (also added to the ncorrupt counter). Cheap enough
// to run from the atexit statistics dump.
uint64_t xsmm_registry_verify(void* rp) {
  Registry& r = *static_cast<Registry*>(rp);
  uint64_t bad = 0;
  for (size_t i = 0; i < kCapacity; ++i) {
    const Slot& s = r.slots[i];
    if (s.state.load(std::memory_order_acquire) == 2 &&
        s.canary != slot_canary(s)) {
      ++bad;
    }
  }
  if (bad) r.ncorrupt.fetch_add(bad, std::memory_order_relaxed);
  return bad;
}

uint64_t xsmm_registry_ncorrupt(void* rp) {
  return static_cast<Registry*>(rp)->ncorrupt.load();
}

// TEST-ONLY hook (tests/test_registry.py): flip a bit in the stored value
// of `key`'s slot WITHOUT refreshing the canary, simulating stray-pointer
// damage so the detection path itself is testable (the reference tests its
// checksummed allocator info the same way, tests/malloc.c).
int xsmm_registry_poison(void* rp, const void* key, uint64_t keylen) {
  if (keylen == 0 || keylen > kMaxKey) return 0;
  Registry& r = *static_cast<Registry*>(rp);
  const uint32_t h = crc32c(key, keylen, 25071975u);
  for (size_t probe = 0; probe < kCapacity; ++probe) {
    const size_t i = (h + probe) & (kCapacity - 1);
    Slot& s = r.slots[i];
    const uint8_t st = s.state.load(std::memory_order_acquire);
    if (st == 0) return 0;
    if (st == 2 && key_eq(s, key, keylen)) {
      s.value ^= 1ull << 17;
      return 1;
    }
  }
  return 0;
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
  // The whole record goes out in ONE write() on an O_APPEND fd: concurrent
  // appenders (parallel test shards, two xsmm-gen runs) each land a
  // contiguous record — buffered fwrite would flush a multi-MB executable
  // in several write()s that can interleave and corrupt the log for every
  // record after the damage (lookup stops at the first bad header).
  KvHeader h{kMagic, 0, keylen, vallen};
  uint32_t crc = crc32c(key, keylen, 0);
  h.crc = crc32c(val, vallen, crc);
  std::vector<uint8_t> rec(sizeof(h) + keylen + vallen);
  std::memcpy(rec.data(), &h, sizeof(h));
  if (keylen) std::memcpy(rec.data() + sizeof(h), key, keylen);
  if (vallen) std::memcpy(rec.data() + sizeof(h) + keylen, val, vallen);
  const int fd = ::open(path, O_WRONLY | O_APPEND | O_CREAT, 0644);
  if (fd < 0) return -1;
  size_t off = 0;  // POSIX serializes O_APPEND writes on regular files;
  while (off < rec.size()) {  // retry only on short/interrupted writes
    const ssize_t w = ::write(fd, rec.data() + off, rec.size() - off);
    if (w < 0) {
      if (errno == EINTR) continue;
      ::close(fd);
      return -1;
    }
    off += static_cast<size_t>(w);
  }
  ::close(fd);
  return 0;
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

// ---------------------------------------------------------------------------
// MatrixMarket (.mtx) reader.
// Native counterpart of the reference's CSR/CSC readers feeding the sparse
// generators and the PyFR/EDGE drivers (/root/reference/src/
// generator_spgemm_csr_reader.c, generator_spgemm_csc_reader.c): slurp the
// file once, pointer-walk with strtol/strtod (no per-line I/O), expand
// symmetric/skew/pattern storage. Handle protocol for ctypes:
//   open -> (m, n, nnz after expansion), fill -> COO arrays, close.
// ---------------------------------------------------------------------------

namespace {

struct MtxData {
  int64_t m = 0, n = 0;
  std::vector<int32_t> rows, cols;
  std::vector<double> vals;
};

}  // namespace

extern "C" {

// Returns 0 on success, -1 I/O error, -2 parse/format error.
int xsmm_mtx_open(const char* path, void** handle, int64_t* m, int64_t* n,
                  int64_t* nnz) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  if (fsize < 0) {  // FIFO/chardev: ESPIPE would turn into a size_t(-1)
    std::fclose(f);  // allocation whose exception escapes the C ABI
    return -1;
  }
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(fsize), '\0');
  const size_t got = std::fread(&buf[0], 1, buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;

  // header: %%MatrixMarket matrix <coordinate|array> <field> <symmetry>
  if (buf.compare(0, 14, "%%MatrixMarket") != 0) return -2;
  const size_t eol = buf.find('\n');
  if (eol == std::string::npos) return -2;
  const std::string header = buf.substr(0, eol);
  const bool coord = header.find("coordinate") != std::string::npos;
  const bool pattern = header.find("pattern") != std::string::npos;
  const bool symmetric = header.find("symmetric") != std::string::npos;
  const bool skew = header.find("skew-symmetric") != std::string::npos;
  const bool hermitian = header.find("hermitian") != std::string::npos;
  if (header.find("complex") != std::string::npos) return -2;

  const char* p = buf.c_str() + eol + 1;
  const char* end = buf.c_str() + buf.size();
  while (p < end && *p == '%') {              // comment lines
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  char* q = nullptr;
  const long mm = std::strtol(p, &q, 10);
  const long nn = std::strtol(q, &q, 10);
  if (q == p || mm < 0 || nn < 0) return -2;
  auto* d = new MtxData();
  d->m = mm;
  d->n = nn;

  if (coord) {
    const long declared = std::strtol(q, &q, 10);
    if (declared < 0) { delete d; return -2; }
    const size_t reserve = static_cast<size_t>(declared)
                           * ((symmetric || skew || hermitian) ? 2 : 1);
    d->rows.reserve(reserve);
    d->cols.reserve(reserve);
    d->vals.reserve(reserve);
    p = q;
    for (long e = 0; e < declared; ++e) {
      const long i = std::strtol(p, &q, 10);
      if (q == p) { delete d; return -2; }    // truncated file
      const long j = std::strtol(q, &q, 10);
      double v = 1.0;
      if (!pattern) v = std::strtod(q, &q);
      p = q;
      if (i < 1 || j < 1 || i > mm || j > nn) { delete d; return -2; }
      d->rows.push_back(static_cast<int32_t>(i - 1));
      d->cols.push_back(static_cast<int32_t>(j - 1));
      d->vals.push_back(v);
      if ((symmetric || skew || hermitian) && i != j) {
        d->rows.push_back(static_cast<int32_t>(j - 1));
        d->cols.push_back(static_cast<int32_t>(i - 1));
        d->vals.push_back(skew ? -v : v);
      }
    }
  } else {
    // array format: dense, column-major element order per the MM spec;
    // symmetric/hermitian variants store the lower triangle INCLUDING the
    // diagonal; skew-symmetric stores strictly below it (the diagonal is
    // identically zero and omitted from the file)
    if (pattern) { delete d; return -2; }
    const bool tri = symmetric || skew || hermitian;
    p = q;
    for (long col = 0; col < nn; ++col) {
      for (long row = tri ? (skew ? col + 1 : col) : 0; row < mm; ++row) {
        const double v = std::strtod(p, &q);
        if (q == p) { delete d; return -2; }
        p = q;
        d->rows.push_back(static_cast<int32_t>(row));
        d->cols.push_back(static_cast<int32_t>(col));
        d->vals.push_back(v);
        if (tri && row != col) {
          d->rows.push_back(static_cast<int32_t>(col));
          d->cols.push_back(static_cast<int32_t>(row));
          d->vals.push_back(skew ? -v : v);
        }
      }
    }
  }
  *handle = d;
  *m = d->m;
  *n = d->n;
  *nnz = static_cast<int64_t>(d->vals.size());
  return 0;
}

void xsmm_mtx_fill(void* handle, int32_t* rows, int32_t* cols,
                   double* vals) {
  const MtxData& d = *static_cast<MtxData*>(handle);
  std::memcpy(rows, d.rows.data(), d.rows.size() * sizeof(int32_t));
  std::memcpy(cols, d.cols.data(), d.cols.size() * sizeof(int32_t));
  std::memcpy(vals, d.vals.data(), d.vals.size() * sizeof(double));
}

void xsmm_mtx_close(void* handle) { delete static_cast<MtxData*>(handle); }

}  // extern "C"
