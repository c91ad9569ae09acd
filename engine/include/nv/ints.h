// Integer arithmetic helpers shared by the int8 evaluators.
//
// The deployment contract (shared with the JAX engine simulation in
// nnue_vision_tpu/ops/engine_sim.py) is C truncating division by the
// quantization scale and saturating clamps. Keeping these in one header
// guarantees every layer uses identical rounding.
#pragma once

#include <algorithm>
#include <cstdint>

namespace nv {

// C '/' already truncates toward zero; named for symmetry with the JAX sim.
inline int32_t tdiv(int32_t acc, int32_t scale) { return acc / scale; }

inline int32_t clamp_i32(int32_t v, int32_t lo, int32_t hi) {
  return std::max(lo, std::min(hi, v));
}

inline int8_t sat_i8(int32_t v) {
  return static_cast<int8_t>(clamp_i32(v, -127, 127));
}

// Input quantization: float multiply then truncation toward zero, exactly
// static_cast<int32_t>(x * scale).
inline int32_t quant_input(float x, float scale) {
  return static_cast<int32_t>(x * scale);
}

// dst[(c)*rows + r] = src[(r)*cols + c] — the (rows, cols) → (cols, rows)
// int8 transpose used to build the inner-loop-contiguous weight layouts
// (tap-major depthwise kernels, input-major pointwise weights).
inline void transpose_i8(const int8_t* src, int rows, int cols,
                         int8_t* dst) {
  for (int r = 0; r < rows; ++r)
    for (int c = 0; c < cols; ++c) dst[static_cast<size_t>(c) * rows + r] =
        src[static_cast<size_t>(r) * cols + c];
}

}  // namespace nv
