// Native on-disk vector store: multithreaded random-row gather.
//
// C++ equivalent of the reference's MmapVectorStore (ann-search-rs
// src/binary/vec_store.rs:16-204 — raw native-endian f32 rows, mmap'd with
// random-access advice, used to rerank binary-index candidates). The hot
// operation is gathering k·rerank_factor scattered rows per query batch;
// python/numpy memmap fancy-indexing does this single-threaded with
// page-fault stalls. This library mmaps the file with MADV_RANDOM and
// gathers rows with a small thread pool, saturating disk/page-cache
// bandwidth.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Store {
  int fd = -1;
  const float* data = nullptr;  // mmap'd base
  size_t map_bytes = 0;
  int64_t n = 0;
  int64_t dim = 0;
};

}  // namespace

extern "C" {

// Open an existing raw f32 row-major file of shape [n, dim].
// Returns an opaque handle or nullptr.
void* vecstore_open(const char* path, int64_t n, int64_t dim) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  size_t bytes = static_cast<size_t>(n) * dim * sizeof(float);
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < bytes) {
    ::close(fd);
    return nullptr;
  }
  void* base = ::mmap(nullptr, bytes, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(base, bytes, MADV_RANDOM);
  auto* s = new Store();
  s->fd = fd;
  s->data = static_cast<const float*>(base);
  s->map_bytes = bytes;
  s->n = n;
  s->dim = dim;
  return s;
}

void vecstore_close(void* handle) {
  if (!handle) return;
  auto* s = static_cast<Store*>(handle);
  if (s->data) ::munmap(const_cast<float*>(s->data), s->map_bytes);
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

// Gather rows ids[0..count) into out[count * dim]; out-of-range ids yield
// zero rows. Parallel over a thread pool sized by n_threads (0 = hw).
int vecstore_gather(void* handle, const int64_t* ids, int64_t count,
                    float* out, int n_threads) {
  if (!handle) return -1;
  auto* s = static_cast<Store*>(handle);
  const int64_t dim = s->dim;
  const int64_t n = s->n;
  const float* base = s->data;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, std::max<int64_t>(count / 1024, 1)));

  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t id = ids[i];
      float* dst = out + i * dim;
      if (id < 0 || id >= n) {
        std::memset(dst, 0, dim * sizeof(float));
      } else {
        std::memcpy(dst, base + id * dim, dim * sizeof(float));
      }
    }
  };

  if (n_threads <= 1) {
    worker(0, count);
    return 0;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (count + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, count);
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Write a raw f32 file (row-major) — convenience for the python side.
int vecstore_write(const char* path, const float* data, int64_t n,
                   int64_t dim) {
  int fd = ::open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  size_t bytes = static_cast<size_t>(n) * dim * sizeof(float);
  const char* p = reinterpret_cast<const char*>(data);
  size_t done = 0;
  while (done < bytes) {
    ssize_t w = ::write(fd, p + done, bytes - done);
    if (w <= 0) {
      ::close(fd);
      return -1;
    }
    done += static_cast<size_t>(w);
  }
  ::close(fd);
  return 0;
}

}  // extern "C"
