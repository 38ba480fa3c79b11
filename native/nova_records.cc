// Native record reader for the NovaRecords format.
//
// TPU-native replacement for the reference's codewithgpu C-backed
// DatasetReader (`diffnext/data/flex_loaders.py:24,77-87`): memory-mapped
// random access over a packed record file with an index sidecar, plus
// background page prefetch so the host input pipeline never stalls the
// device step.
//
// Format (created by nova_pointcloud_tpu.data.records.RecordWriter):
//   data.bin  — concatenated records (TLV-encoded field dicts)
//   index.bin — uint64 little-endian offsets, num_records+1 entries
//
// Exposed as a C ABI for ctypes. Build:
//   g++ -O3 -shared -fPIC -o libnova_records.so nova_records.cc -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Reader {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t data_size = 0;
  std::vector<uint64_t> offsets;  // num_records + 1
  std::thread prefetcher;
  std::atomic<bool> stop{false};
};

bool read_index(const std::string& path, std::vector<uint64_t>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0 || size % 8) {
    std::fclose(f);
    return false;
  }
  out->resize(size / 8);
  size_t got = std::fread(out->data(), 8, out->size(), f);
  std::fclose(f);
  return got == out->size();
}

}  // namespace

extern "C" {

// Opens <dir>/data.bin + <dir>/index.bin. Returns nullptr on failure.
void* nr_open(const char* dir) {
  auto* r = new Reader();
  std::string base(dir);
  if (!read_index(base + "/index.bin", &r->offsets) || r->offsets.size() < 2) {
    delete r;
    return nullptr;
  }
  std::string data_path = base + "/data.bin";
  r->fd = ::open(data_path.c_str(), O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  if (fstat(r->fd, &st) != 0 || (uint64_t)st.st_size < r->offsets.back()) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  r->data_size = st.st_size;
  void* p = mmap(nullptr, r->data_size, PROT_READ, MAP_PRIVATE, r->fd, 0);
  if (p == MAP_FAILED) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  madvise(p, r->data_size, MADV_RANDOM);
  r->data = static_cast<const uint8_t*>(p);
  return r;
}

int64_t nr_num_records(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  return static_cast<int64_t>(r->offsets.size()) - 1;
}

// Pointer + size of record i (zero copy; valid until nr_close).
const uint8_t* nr_record(void* handle, int64_t i, uint64_t* size) {
  auto* r = static_cast<Reader*>(handle);
  if (i < 0 || i + 1 >= (int64_t)r->offsets.size()) {
    *size = 0;
    return nullptr;
  }
  uint64_t begin = r->offsets[i], end = r->offsets[i + 1];
  if (end > r->data_size || begin > end) {
    *size = 0;
    return nullptr;
  }
  *size = end - begin;
  return r->data + begin;
}

// Touch the pages of the given records on a background thread (readahead).
void nr_prefetch(void* handle, const int64_t* indices, int64_t n) {
  auto* r = static_cast<Reader*>(handle);
  std::vector<int64_t> idx(indices, indices + n);
  if (r->prefetcher.joinable()) r->prefetcher.join();
  r->stop.store(false);
  Reader* rp = r;
  r->prefetcher = std::thread([rp, idx]() {
    volatile uint64_t sink = 0;
    for (int64_t i : idx) {
      if (rp->stop.load()) break;
      if (i < 0 || i + 1 >= (int64_t)rp->offsets.size()) continue;
      uint64_t begin = rp->offsets[i], end = rp->offsets[i + 1];
      for (uint64_t off = begin; off < end && off < rp->data_size; off += 4096)
        sink += rp->data[off];
    }
    (void)sink;
  });
}

void nr_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  r->stop.store(true);
  if (r->prefetcher.joinable()) r->prefetcher.join();
  if (r->data) munmap(const_cast<uint8_t*>(r->data), r->data_size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
