// recordio: memory-mapped forcing-record store with fused time
// interpolation and OS-level prefetch.
//
// The native half of the forcing pipeline (extpom_tpu/forcing): the
// reference blocks every rank on collective PnetCDF reads inside the time
// loop (bounds_forcing.f:593-1020, io_pnetcdf.F:2912-3622); here records
// live in a flat mmap'd file, the bracketing records are combined into the
// time-interpolated field in C++ (multi-threaded for large records), and
// the next record is madvise-prefetched so the Python/JAX host thread
// never waits on disk.
//
// File format "EFR1": [magic u32][dtype u32: 0=f32 1=f64][ndim u32]
//                     [shape u64 x ndim, shape[0] = nrec][raw C-order data]
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread recordio.cpp -o librecordio.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31524645;  // "EFR1" little-endian

struct Header {
  uint32_t magic;
  uint32_t dtype;  // 0 = float32, 1 = float64
  uint32_t ndim;
};

struct Handle {
  int fd = -1;
  void* map = nullptr;
  size_t map_size = 0;
  uint32_t dtype = 0;
  uint64_t nrec = 0;
  uint64_t rec_elems = 0;   // elements per record
  const char* data = nullptr;
  size_t rec_bytes = 0;
  std::atomic<int64_t> last_prefetched{-1};
};

inline size_t dtype_size(uint32_t d) { return d == 0 ? 4 : 8; }

void prefetch(Handle* h, uint64_t n) {
  if (n >= h->nrec) return;
  int64_t prev = h->last_prefetched.load(std::memory_order_relaxed);
  if (prev == (int64_t)n) return;
  h->last_prefetched.store((int64_t)n, std::memory_order_relaxed);
  const char* p = h->data + n * h->rec_bytes;
  // align to page
  uintptr_t page = (uintptr_t)p & ~(uintptr_t)4095;
  size_t len = h->rec_bytes + ((uintptr_t)p - page);
  madvise((void*)page, len, MADV_WILLNEED);
}

template <typename T>
void interp_kernel(const T* a, const T* b, double w, T* out, size_t n,
                   int nthreads) {
  const T wa = (T)(1.0 - w), wb = (T)w;
  if (nthreads <= 1 || n < (1u << 16)) {
    for (size_t i = 0; i < n; ++i) out[i] = wa * a[i] + wb * b[i];
    return;
  }
  std::vector<std::thread> ts;
  size_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    size_t lo = t * chunk, hi = lo + chunk > n ? n : lo + chunk;
    if (lo >= hi) break;
    ts.emplace_back([=]() {
      for (size_t i = lo; i < hi; ++i) out[i] = wa * a[i] + wb * b[i];
    });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

void* efr_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  const Header* hd = (const Header*)map;
  if (hd->magic != kMagic || hd->ndim < 1 || hd->ndim > 8) {
    munmap(map, st.st_size);
    close(fd);
    return nullptr;
  }
  const uint64_t* shape = (const uint64_t*)((const char*)map + sizeof(Header));
  uint64_t rec_elems = 1;
  for (uint32_t i = 1; i < hd->ndim; ++i) rec_elems *= shape[i];

  Handle* h = new Handle();
  h->fd = fd;
  h->map = map;
  h->map_size = st.st_size;
  h->dtype = hd->dtype;
  h->nrec = shape[0];
  h->rec_elems = rec_elems;
  h->rec_bytes = rec_elems * dtype_size(hd->dtype);
  h->data = (const char*)map + sizeof(Header) + hd->ndim * sizeof(uint64_t);
  madvise((void*)h->data, h->map_size - sizeof(Header), MADV_SEQUENTIAL);
  return h;
}

int efr_info(void* hv, uint64_t* nrec, uint64_t* rec_elems, int* dtype) {
  if (!hv) return -1;
  Handle* h = (Handle*)hv;
  *nrec = h->nrec;
  *rec_elems = h->rec_elems;
  *dtype = (int)h->dtype;
  return 0;
}

int efr_read(void* hv, uint64_t n, void* out) {
  Handle* h = (Handle*)hv;
  if (!h || n >= h->nrec) return -1;
  memcpy(out, h->data + n * h->rec_bytes, h->rec_bytes);
  prefetch(h, n + 1);
  return 0;
}

// out = (1-frac) * rec[floor(x)] + frac * rec[floor(x)+1], records clamped
// to the series (hold-last), prefetching record floor(x)+2.
int efr_interp(void* hv, double x, void* out, int nthreads) {
  Handle* h = (Handle*)hv;
  if (!h || h->nrec == 0) return -1;
  if (x < 0) x = 0;
  uint64_t n = (uint64_t)x;
  double w = x - (double)n;
  uint64_t n0 = n < h->nrec ? n : h->nrec - 1;
  uint64_t n1 = n + 1 < h->nrec ? n + 1 : h->nrec - 1;
  const char* a = h->data + n0 * h->rec_bytes;
  const char* b = h->data + n1 * h->rec_bytes;
  if (h->dtype == 0) {
    interp_kernel<float>((const float*)a, (const float*)b, w, (float*)out,
                         h->rec_elems, nthreads);
  } else {
    interp_kernel<double>((const double*)a, (const double*)b, w,
                          (double*)out, h->rec_elems, nthreads);
  }
  prefetch(h, n + 2);
  return 0;
}

void efr_close(void* hv) {
  Handle* h = (Handle*)hv;
  if (!h) return;
  if (h->map) munmap(h->map, h->map_size);
  if (h->fd >= 0) close(h->fd);
  delete h;
}

}  // extern "C"
