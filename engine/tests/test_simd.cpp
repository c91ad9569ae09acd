// SIMD backend parity: the dispatched entry points must be bit-identical
// to the scalar reference for every op, every length (including lengths
// that exercise both the wide body and the scalar tail), and inputs that
// force int16 wraparound. Mirrors the upstream SIMD-consistency tests
// (reference engine/tests/test_nnue_engine.cpp SIMD section).
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "../include/nv/simd.h"

namespace {

int failures = 0;

#define CHECK(cond, msg)                                      \
  do {                                                        \
    if (!(cond)) {                                            \
      std::printf("FAIL %s:%d %s\n", __FILE__, __LINE__, msg); \
      ++failures;                                             \
    }                                                         \
  } while (0)

std::mt19937 rng(12345);

std::vector<int16_t> rand_i16(int n, int lo, int hi) {
  std::uniform_int_distribution<int> d(lo, hi);
  std::vector<int16_t> v(n);
  for (auto& x : v) x = static_cast<int16_t>(d(rng));
  return v;
}

std::vector<int8_t> rand_i8(int n) {
  std::uniform_int_distribution<int> d(-127, 127);
  std::vector<int8_t> v(n);
  for (auto& x : v) x = static_cast<int8_t>(d(rng));
  return v;
}

void test_acc_ops(int n) {
  // Extreme values so wraparound actually occurs in both paths.
  auto acc0 = rand_i16(n, -32768, 32767);
  auto row = rand_i16(n, -32768, 32767);
  auto a = acc0, b = acc0;
  nv::simd::acc_add_i16(a.data(), row.data(), n);
  nv::simd::acc_add_i16_scalar(b.data(), row.data(), n);
  CHECK(a == b, "acc_add_i16 mismatch");
  a = acc0;
  b = acc0;
  nv::simd::acc_sub_i16(a.data(), row.data(), n);
  nv::simd::acc_sub_i16_scalar(b.data(), row.data(), n);
  CHECK(a == b, "acc_sub_i16 mismatch");

  // fused 4-row add: wide vs scalar reference, and scalar reference vs
  // four single adds (grouping must be bit-exact under wraparound)
  auto r0 = rand_i16(n, -32768, 32767), r1 = rand_i16(n, -32768, 32767);
  auto r2 = rand_i16(n, -32768, 32767), r3 = rand_i16(n, -32768, 32767);
  a = acc0;
  b = acc0;
  auto c = acc0;
  nv::simd::acc_add4_i16(a.data(), r0.data(), r1.data(), r2.data(), r3.data(),
                         n);
  nv::simd::acc_add4_i16_scalar(b.data(), r0.data(), r1.data(), r2.data(),
                                r3.data(), n);
  CHECK(a == b, "acc_add4_i16 mismatch");
  for (const auto* r : {&r0, &r1, &r2, &r3})
    nv::simd::acc_add_i16_scalar(c.data(), r->data(), n);
  CHECK(a == c, "acc_add4_i16 vs four single adds mismatch");
}

void test_dots(int n) {
  // Engine-range activations (0..127 int16 / full-range int8 weights).
  auto x16 = rand_i16(n, 0, 127);
  auto x8 = rand_i8(n);
  auto w = rand_i8(n);
  CHECK(nv::simd::dot_i16_i8(x16.data(), w.data(), n) ==
            nv::simd::dot_i16_i8_scalar(x16.data(), w.data(), n),
        "dot_i16_i8 mismatch");
  CHECK(nv::simd::dot_i8_i8(x8.data(), w.data(), n) ==
            nv::simd::dot_i8_i8_scalar(x8.data(), w.data(), n),
        "dot_i8_i8 mismatch");
  // Full-range int16 side too (accumulator values before clipping).
  auto xw = rand_i16(n, -32768, 32767);
  CHECK(nv::simd::dot_i16_i8(xw.data(), w.data(), n) ==
            nv::simd::dot_i16_i8_scalar(xw.data(), w.data(), n),
        "dot_i16_i8 full-range mismatch");

  // u7×i8 fast path: random draws plus the three saturation extremes —
  // every maddubs PAIR sum at its positive max (127·127·2 = +32258),
  // at the engine-range negative max (−32258), and at the absolute
  // int8 negative max w = −128 (pair sum −32512; still > int16 min, so
  // the saturating add must stay exact).
  std::uniform_int_distribution<int> du7(0, 127);
  std::vector<uint8_t> xu(n);
  for (auto& v : xu) v = static_cast<uint8_t>(du7(rng));
  CHECK(nv::simd::dot_u7_i8(xu.data(), w.data(), n) ==
            nv::simd::dot_u7_i8_scalar(xu.data(), w.data(), n),
        "dot_u7_i8 mismatch");
  std::vector<uint8_t> xmax(n, 127);
  std::vector<int8_t> wplus(n, 127);
  CHECK(nv::simd::dot_u7_i8(xmax.data(), wplus.data(), n) ==
            nv::simd::dot_u7_i8_scalar(xmax.data(), wplus.data(), n),
        "dot_u7_i8 positive-extreme mismatch");
  std::vector<int8_t> wminus(n, -127);
  CHECK(nv::simd::dot_u7_i8(xmax.data(), wminus.data(), n) ==
            nv::simd::dot_u7_i8_scalar(xmax.data(), wminus.data(), n),
        "dot_u7_i8 negative-extreme mismatch");
  std::vector<int8_t> wmin128(n, -128);
  CHECK(nv::simd::dot_u7_i8(xmax.data(), wmin128.data(), n) ==
            nv::simd::dot_u7_i8_scalar(xmax.data(), wmin128.data(), n),
        "dot_u7_i8 w=-128 extreme mismatch");
}

void test_madd(int n) {
  auto x = rand_i8(n);
  auto w = rand_i8(n);
  std::uniform_int_distribution<int32_t> d(-1000000, 1000000);
  std::vector<int32_t> a(n), b(n);
  for (int i = 0; i < n; ++i) a[i] = b[i] = d(rng);
  nv::simd::madd_i8_i8(a.data(), x.data(), w.data(), n);
  nv::simd::madd_i8_i8_scalar(b.data(), x.data(), w.data(), n);
  CHECK(a == b, "madd_i8_i8 mismatch");

  // broadcast madd: every scalar value incl. the ±127 extremes
  for (int xv : {-127, -1, 0, 6, 127}) {
    for (int i = 0; i < n; ++i) a[i] = b[i];
    nv::simd::madd_scalar_i8(a.data(), xv, w.data(), n);
    nv::simd::madd_scalar_i8_scalar(b.data(), xv, w.data(), n);
    CHECK(a == b, "madd_scalar_i8 mismatch");
  }
  // wide broadcast madd: arbitrary int32 multipliers (quantized conv
  // inputs are unbounded), incl. values far outside int16
  for (int32_t xv : {-100000, -193, 0, 127, 300, 1 << 20}) {
    for (int i = 0; i < n; ++i) a[i] = b[i];
    nv::simd::madd_scalar_wide_i8(a.data(), xv, w.data(), n);
    nv::simd::madd_scalar_wide_i8_scalar(b.data(), xv, w.data(), n);
    CHECK(a == b, "madd_scalar_wide_i8 mismatch");
  }
}

}  // namespace

int main() {
  std::printf("simd backend: %s\n", nv::simd::backend());
  // Lengths straddling the 8/16-lane widths, incl. pure-tail sizes.
  const int sizes[] = {1, 3, 7, 8, 15, 16, 17, 31, 32, 33,
                       64, 100, 128, 255, 1024, 1027};
  for (int n : sizes) {
    for (int rep = 0; rep < 8; ++rep) {
      test_acc_ops(n);
      test_dots(n);
      test_madd(n);
    }
  }
  if (failures) {
    std::printf("%d failure(s)\n", failures);
    return 1;
  }
  std::printf("all simd parity checks passed\n");
  return 0;
}
