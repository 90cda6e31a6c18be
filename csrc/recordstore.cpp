// recordstore — memory-mapped key/value record shards for training data.
//
// TPU-native replacement for the reference's LMDB dependency
// (utils/lmdb.py; LMDB's C library is not available in this image).
// The data model is identical: byte blobs addressed by string keys with
// the reference's `{name}_shape` / `{name}_{i}_data` naming convention
// layered on top in Python (self_forcing_tpu/data/recordstore.py).
//
// File layout (little-endian):
//   [8]  magic "SFRS0001"
//   [8]  u64 num_records
//   [8]  u64 index_offset
//   ...  record payloads (raw bytes, 8-byte aligned)
//   index: per record { u64 offset, u64 size, u32 key_len, key bytes }
//
// The reader mmaps the file, builds an open-addressing hash table over the
// index at open (FNV-1a), and serves zero-copy pointers into the map.
// Readers are thread-safe after open; writers are offline Python scripts.
//
// Exposed C ABI (ctypes):
//   rs_open(path) -> handle      rs_close(handle)
//   rs_num_records(handle)
//   rs_get(handle, key, key_len, &size) -> const void* (NULL if missing)
//   rs_key_at(handle, i, &key_len) -> const char*
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  uint64_t offset;
  uint64_t size;
  const char* key;
  uint32_t key_len;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t map_size = 0;
  std::vector<Entry> entries;
  // open-addressing table of indices into `entries`, -1 = empty
  std::vector<int64_t> table;

  ~Store() {
    if (base) munmap(const_cast<uint8_t*>(base), map_size);
    if (fd >= 0) close(fd);
  }
};

uint64_t fnv1a(const char* s, uint32_t n) {
  uint64_t h = 1469598103934665603ULL;
  for (uint32_t i = 0; i < n; ++i) {
    h ^= static_cast<uint8_t>(s[i]);
    h *= 1099511628211ULL;
  }
  return h;
}

uint64_t rd_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

}  // namespace

extern "C" {

void* rs_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(mem);
  if (std::memcmp(base, "SFRS0001", 8) != 0) {
    munmap(mem, st.st_size);
    close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->base = base;
  s->map_size = st.st_size;

  uint64_t n = rd_u64(base + 8);
  uint64_t idx_off = rd_u64(base + 16);
  s->entries.reserve(n);
  const uint8_t* p = base + idx_off;
  const uint8_t* end = base + st.st_size;
  for (uint64_t i = 0; i < n; ++i) {
    if (p + 20 > end) { delete s; return nullptr; }
    Entry e;
    e.offset = rd_u64(p);
    e.size = rd_u64(p + 8);
    e.key_len = rd_u32(p + 16);
    p += 20;
    if (p + e.key_len > end) { delete s; return nullptr; }
    e.key = reinterpret_cast<const char*>(p);
    p += e.key_len;
    s->entries.push_back(e);
  }

  // hash table, load factor <= 0.5
  size_t cap = 16;
  while (cap < s->entries.size() * 2 + 1) cap <<= 1;
  s->table.assign(cap, -1);
  for (size_t i = 0; i < s->entries.size(); ++i) {
    const Entry& e = s->entries[i];
    uint64_t h = fnv1a(e.key, e.key_len);
    size_t mask = cap - 1;
    size_t j = h & mask;
    while (s->table[j] != -1) {
      // duplicate key: last write wins (matches the Python fallback and
      // the reference's LMDB overwrite semantics) — replace in place
      const Entry& prev = s->entries[s->table[j]];
      if (prev.key_len == e.key_len &&
          memcmp(prev.key, e.key, e.key_len) == 0) break;
      j = (j + 1) & mask;
    }
    s->table[j] = static_cast<int64_t>(i);
  }
  return s;
}

void rs_close(void* handle) {
  delete static_cast<Store*>(handle);
}

uint64_t rs_num_records(void* handle) {
  return static_cast<Store*>(handle)->entries.size();
}

const void* rs_get(void* handle, const char* key, uint32_t key_len,
                   uint64_t* size_out) {
  auto* s = static_cast<Store*>(handle);
  if (s->table.empty()) return nullptr;
  uint64_t h = fnv1a(key, key_len);
  size_t mask = s->table.size() - 1;
  size_t j = h & mask;
  while (true) {
    int64_t idx = s->table[j];
    if (idx == -1) return nullptr;
    const Entry& e = s->entries[idx];
    if (e.key_len == key_len && std::memcmp(e.key, key, key_len) == 0) {
      *size_out = e.size;
      return s->base + e.offset;
    }
    j = (j + 1) & mask;
  }
}

const char* rs_key_at(void* handle, uint64_t i, uint32_t* key_len_out) {
  auto* s = static_cast<Store*>(handle);
  if (i >= s->entries.size()) return nullptr;
  *key_len_out = s->entries[i].key_len;
  return s->entries[i].key;
}

}  // extern "C"
