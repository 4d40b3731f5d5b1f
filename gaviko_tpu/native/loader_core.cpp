// Native data-loader core: multithreaded volume preprocessing.
//
// The reference feeds volumes through torchio transforms in torch DataLoader
// worker processes (ref: src/train.py:50-77, src/data/dataset.py). Here the
// host-side hot path -- per-volume min-max intensity rescale and dtype
// widening over ~12M-element MRI volumes -- runs as a small C++ core bound
// via ctypes (gaviko_tpu/data/native_loader.py), so a single host keeps up
// with TPU-side throughput without relying on numpy temporaries.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libloader_core.so loader_core.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

namespace {

template <typename F>
void parallel_chunks(std::size_t n, int nthreads, F&& fn) {
  nthreads = std::max(1, nthreads);
  if (nthreads == 1 || n < (1u << 16)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  std::size_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    std::size_t lo = t * chunk;
    if (lo >= n) break;
    std::size_t hi = std::min(n, lo + chunk);
    ts.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Min/max over a float32 buffer.
void volume_minmax_f32(const float* in, std::size_t n, int nthreads,
                       float* out_min, float* out_max) {
  std::vector<float> mins((std::size_t)std::max(1, nthreads), in[0]);
  std::vector<float> maxs((std::size_t)std::max(1, nthreads), in[0]);
  std::atomic<int> slot{0};
  parallel_chunks(n, nthreads, [&](std::size_t lo, std::size_t hi) {
    float mn = in[lo], mx = in[lo];
    for (std::size_t i = lo; i < hi; ++i) {
      mn = std::min(mn, in[i]);
      mx = std::max(mx, in[i]);
    }
    int s = slot.fetch_add(1);
    mins[(std::size_t)s] = mn;
    maxs[(std::size_t)s] = mx;
  });
  float mn = mins[0], mx = maxs[0];
  for (std::size_t i = 1; i < mins.size(); ++i) {
    mn = std::min(mn, mins[i]);
    mx = std::max(mx, maxs[i]);
  }
  *out_min = mn;
  *out_max = mx;
}

// out = (in - lo) * scale + out_min  (fused min-max rescale).
void rescale_f32(const float* in, float* out, std::size_t n, float lo,
                 float scale, float out_min, int nthreads) {
  parallel_chunks(n, nthreads, [&](std::size_t a, std::size_t b) {
    for (std::size_t i = a; i < b; ++i) {
      out[i] = (in[i] - lo) * scale + out_min;
    }
  });
}

// Widen common integer MRI dtypes to float32 (fused with the copy).
void widen_i16_f32(const int16_t* in, float* out, std::size_t n, int nthreads) {
  parallel_chunks(n, nthreads, [&](std::size_t a, std::size_t b) {
    for (std::size_t i = a; i < b; ++i) out[i] = (float)in[i];
  });
}

void widen_u16_f32(const uint16_t* in, float* out, std::size_t n, int nthreads) {
  parallel_chunks(n, nthreads, [&](std::size_t a, std::size_t b) {
    for (std::size_t i = a; i < b; ++i) out[i] = (float)in[i];
  });
}

}  // extern "C"
