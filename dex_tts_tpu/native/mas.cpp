// Monotonic alignment search — native host kernel.
//
// Same Viterbi DP + backtrace as the on-device lax.scan implementation
// (dex_tts_tpu/ops/mas.py) and behaviorally equivalent to the reference's
// Cython kernel (reference: DEX-TTS/model/monotonic_align/core.pyx:9-45):
// forward pass accumulates max-path scores in-place over the banded
// (token, frame) grid, backtrace walks the best path. OpenMP parallelizes
// over batch items.
//
// Used by the host data/eval tooling (offline alignment extraction, CPU
// parity checks); the training step uses the on-device kernel.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC mas.cpp -o libmas.so

#include <algorithm>
#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kNegInf = -1e9f;

void mas_single(float* value, int32_t* path, int t_x, int t_y, int ty_stride) {
  // forward DP: value[x, y] += max(stay, advance)
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      const float stay = (x == y) ? kNegInf : value[x * ty_stride + (y - 1)];
      float advance;
      if (x == 0) {
        advance = (y == 0) ? 0.0f : kNegInf;
      } else {
        advance = value[(x - 1) * ty_stride + (y - 1)];
      }
      value[x * ty_stride + y] += std::max(stay, advance);
    }
  }
  // backtrace
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * ty_stride + y] = 1;
    if (index != 0 &&
        (index == y || value[index * ty_stride + (y - 1)] <
                           value[(index - 1) * ty_stride + (y - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// values: (b, tx_max, ty_max) float32, mutated in place (DP accumulator).
// paths:  (b, tx_max, ty_max) int32, zero-initialized by the caller.
// t_xs/t_ys: per-item valid extents.
void mas_batch(float* values, int32_t* paths, const int32_t* t_xs,
               const int32_t* t_ys, int b, int tx_max, int ty_max) {
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < b; ++i) {
    mas_single(values + static_cast<int64_t>(i) * tx_max * ty_max,
               paths + static_cast<int64_t>(i) * tx_max * ty_max, t_xs[i],
               t_ys[i], ty_max);
  }
}

int mas_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
