// Parallel zarr-chunk decoder: blosc/zlib decompression across a thread pool.
//
// The training input pipeline reads many compressed zarr chunks per batch
// window; Python-side decompression is serialized by the GIL, so this helper
// decodes a whole set of chunks concurrently into a preallocated output
// buffer. Bound from Python via ctypes (no pybind11 in this environment);
// see neural_lam_tpu/native/__init__.py for the build-on-first-use logic.
//
// Build: g++ -O3 -shared -fPIC -o libchunkdec.so chunkdec.cpp -l:libblosc.so.1 -l:libz.so.1 -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {
// from libblosc (system library)
int blosc_decompress_ctx(const void* src, void* dest, size_t destsize,
                         int numinternalthreads);
}

namespace {

enum Codec : int32_t {
  CODEC_RAW = 0,
  CODEC_BLOSC = 1,
  CODEC_ZLIB = 2,
};

// Decode one chunk into out (chunk_nbytes destination bytes).
// Returns 0 on success.
int decode_one(const uint8_t* src, int64_t src_size, int32_t codec,
               uint8_t* out, int64_t chunk_nbytes) {
  switch (codec) {
    case CODEC_RAW: {
      if (src_size != chunk_nbytes) return -2;
      std::memcpy(out, src, chunk_nbytes);
      return 0;
    }
    case CODEC_BLOSC: {
      int n = blosc_decompress_ctx(src, out, (size_t)chunk_nbytes, 1);
      return n < 0 ? n : 0;
    }
    case CODEC_ZLIB: {
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      // 47 = auto-detect zlib/gzip wrappers (15 | 32)
      if (inflateInit2(&zs, 47) != Z_OK) return -3;
      zs.next_in = const_cast<Bytef*>(src);
      zs.avail_in = (uInt)src_size;
      zs.next_out = out;
      zs.avail_out = (uInt)chunk_nbytes;
      int ret = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      return (ret == Z_STREAM_END) ? 0 : -4;
    }
    default:
      return -5;
  }
}

}  // namespace

extern "C" {

// Decode n_chunks buffers in parallel.
//   srcs:        array of n_chunks pointers to compressed buffers
//   src_sizes:   compressed sizes
//   codecs:      per-chunk codec id (Codec enum)
//   out:         destination; chunk i decodes into out + i * chunk_nbytes
//   chunk_nbytes: decoded bytes per chunk (uniform chunk grid)
//   n_threads:   worker threads (<=0 -> hardware_concurrency)
// Returns 0 on success, otherwise the first non-zero per-chunk error code.
int decode_chunks(const uint8_t** srcs, const int64_t* src_sizes,
                  const int32_t* codecs, int64_t n_chunks, uint8_t* out,
                  int64_t chunk_nbytes, int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = (int32_t)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n_chunks) n_threads = (int32_t)n_chunks;

  std::atomic<int64_t> next(0);
  std::atomic<int> error(0);

  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_chunks || error.load() != 0) return;
      int rc = decode_one(srcs[i], src_sizes[i], codecs[i],
                          out + i * chunk_nbytes, chunk_nbytes);
      if (rc != 0) {
        int expected = 0;
        error.compare_exchange_strong(expected, rc);
      }
    }
  };

  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return error.load();
}

}  // extern "C"
