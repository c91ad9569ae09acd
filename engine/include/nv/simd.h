// Vectorized integer micro-kernels for the engine hot loops.
//
// Layout mirrors the upstream engine's SIMD split (reference
// engine/src/simd_{scalar,avx2,neon}.cpp; SURVEY.md §2.7): every op has a
// portable scalar reference (`*_scalar`) that defines the semantics, and
// wide implementations selected at compile time (`-march=native` sets
// __AVX2__ / __ARM_NEON). The undecorated entry points dispatch to the
// widest available backend; engine/tests/test_simd.cpp asserts each
// backend is bit-identical to the scalar reference, including int16
// wraparound. The TPU-side equivalents of these loops are the MXU matmul
// feeds in nnue_vision_tpu/ops/engine_sim.py and ops/pallas_kernels.py.
#pragma once

#include <cstdint>

namespace nv {
namespace simd {

// Name of the backend the dispatched entry points use ("avx2", "neon",
// or "scalar"); printed by benchmark tools for provenance.
const char* backend();

// acc[i] += row[i] / acc[i] -= row[i] with int16 wraparound (the feature
// transformer's accumulate contract — reference simd_avx2.cpp:20-111).
void acc_add_i16_scalar(int16_t* acc, const int16_t* row, int n);
void acc_sub_i16_scalar(int16_t* acc, const int16_t* row, int n);
void acc_add_i16(int16_t* acc, const int16_t* row, int n);
void acc_sub_i16(int16_t* acc, const int16_t* row, int n);

// acc[i] += r0[i] + r1[i] + r2[i] + r3[i], int16 wraparound. Four FT
// rows fused into one pass over the accumulator: 1 acc load + 1 store
// per vector instead of 4 of each (the accumulator traffic dominates a
// full refresh at typical densities). Bit-exact vs four acc_add_i16
// calls — int16 wraparound addition is associative and commutative.
void acc_add4_i16_scalar(int16_t* acc, const int16_t* r0, const int16_t* r1,
                         const int16_t* r2, const int16_t* r3, int n);
void acc_add4_i16(int16_t* acc, const int16_t* r0, const int16_t* r1,
                  const int16_t* r2, const int16_t* r3, int n);

// sum_i int32(x[i]) * int32(w[i]) — dense-layer rows. x values are
// engine activations (0..127 after clipped ReLU; int16 covers the
// pairwise path), w is int8 weights. Exact int32 accumulation.
int32_t dot_i16_i8_scalar(const int16_t* x, const int8_t* w, int n);
int32_t dot_i16_i8(const int16_t* x, const int8_t* w, int n);
int32_t dot_i8_i8_scalar(const int8_t* x, const int8_t* w, int n);
int32_t dot_i8_i8(const int8_t* x, const int8_t* w, int n);

// sum_i int32(x[i]) * int32(w[i]) with x REQUIRED in [0, 127] ("u7") —
// the NNUE dense head's clipped-ReLU activations. The domain restriction
// enables the unsigned×signed byte dot (vpmaddubsw on AVX2, vpdpbusd on
// AVX-512-VNNI): two u7·i8 products sum to at most ±32258, inside int16,
// so the saturating pairwise add never saturates and the result is exact.
// Callers must clamp to [0,127] first (the engine head already does).
int32_t dot_u7_i8_scalar(const uint8_t* x, const int8_t* w, int n);
int32_t dot_u7_i8(const uint8_t* x, const int8_t* w, int n);

// acc[i] += int32(x[i]) * int32(w[i]) — elementwise multiply-accumulate
// into an int32 buffer (the depthwise-conv tap loop, channels innermost).
void madd_i8_i8_scalar(int32_t* acc, const int8_t* x, const int8_t* w, int n);
void madd_i8_i8(int32_t* acc, const int8_t* x, const int8_t* w, int n);

// acc[i] += x * int32(w[i]) with |x| ≤ 127 — one input value broadcast
// against a row of weights. This is the pointwise-conv formulation that
// vectorizes across OUTPUT channels (weights transposed input-major):
// for the tiny channel counts of EtinyNet blocks (8–32), per-output dot
// products never reach the 16/32-lane dot kernels' vector bodies and run
// scalar; the broadcast form keeps full lanes at any input width. The
// 8-lane SSE tail covers mid/out widths of 8.
void madd_scalar_i8_scalar(int32_t* acc, int x, const int8_t* w, int n);
void madd_scalar_i8(int32_t* acc, int x, const int8_t* w, int n);

// acc[i] += x * int32(w[i]) for ARBITRARY int32 x (32-bit low-half
// multiply, identical to the scalar int product) — the conv-frontend
// formulation: quantized inputs are unbounded by the format (trunc of
// any float·scale), so the int16-product op above cannot be used.
void madd_scalar_wide_i8_scalar(int32_t* acc, int32_t x, const int8_t* w,
                                int n);
void madd_scalar_wide_i8(int32_t* acc, int32_t x, const int8_t* w, int n);

}  // namespace simd
}  // namespace nv
