// SIMD backends for the engine hot loops (see include/nv/simd.h).
//
// AVX2: 16-lane int16 add/sub for the feature-transformer accumulator;
// sign-extended int8→int16 feeds into _mm256_madd_epi16 for the dense
// dots (reference technique: engine/src/simd_avx2.cpp:20-152 upstream,
// re-derived here for our buffer layouts). NEON covers aarch64 hosts.
// All wide paths produce bit-identical results to the scalar reference:
// int16 add/sub wraps the same way, and madd's pairwise int32 sums are
// exact (|x|≤32767, |w|≤127 ⇒ each pair sum < 2^23; n ≤ 4096 rows keep
// the int32 accumulator far from overflow for engine-legal activations).

#include "../include/nv/simd.h"

#if defined(__AVX512BW__) || defined(__AVX2__)
#include <immintrin.h>
#elif defined(__ARM_NEON)
#include <arm_neon.h>
#endif

// NV_USE_AVX512 selects the (opt-in) AVX-512 backend below; see the
// rationale on that block. Without it, AVX-512-capable hosts use the
// AVX2 backend, which measures faster for these buffer lengths.

namespace nv {
namespace simd {

void acc_add_i16_scalar(int16_t* acc, const int16_t* row, int n) {
  for (int i = 0; i < n; ++i)
    acc[i] = static_cast<int16_t>(acc[i] + row[i]);
}

void acc_sub_i16_scalar(int16_t* acc, const int16_t* row, int n) {
  for (int i = 0; i < n; ++i)
    acc[i] = static_cast<int16_t>(acc[i] - row[i]);
}

int32_t dot_i16_i8_scalar(const int16_t* x, const int8_t* w, int n) {
  int32_t acc = 0;
  for (int i = 0; i < n; ++i) acc += int32_t(x[i]) * int32_t(w[i]);
  return acc;
}

int32_t dot_i8_i8_scalar(const int8_t* x, const int8_t* w, int n) {
  int32_t acc = 0;
  for (int i = 0; i < n; ++i) acc += int32_t(x[i]) * int32_t(w[i]);
  return acc;
}

void madd_i8_i8_scalar(int32_t* acc, const int8_t* x, const int8_t* w,
                       int n) {
  for (int i = 0; i < n; ++i) acc[i] += int32_t(x[i]) * int32_t(w[i]);
}

int32_t dot_u7_i8_scalar(const uint8_t* x, const int8_t* w, int n) {
  int32_t acc = 0;
  for (int i = 0; i < n; ++i) acc += int32_t(x[i]) * int32_t(w[i]);
  return acc;
}

void acc_add4_i16_scalar(int16_t* acc, const int16_t* r0, const int16_t* r1,
                         const int16_t* r2, const int16_t* r3, int n) {
  for (int i = 0; i < n; ++i)
    acc[i] = static_cast<int16_t>(acc[i] + r0[i] + r1[i] + r2[i] + r3[i]);
}

void madd_scalar_i8_scalar(int32_t* acc, int x, const int8_t* w, int n) {
  for (int i = 0; i < n; ++i) acc[i] += x * int32_t(w[i]);
}

void madd_scalar_wide_i8_scalar(int32_t* acc, int32_t x, const int8_t* w,
                                int n) {
  for (int i = 0; i < n; ++i) acc[i] += x * int32_t(w[i]);
}

#if defined(__AVX512BW__) && defined(NV_USE_AVX512)

// AVX-512BW: 32-lane int16 accumulator ops and 512-bit madd dots; with
// AVX-512VNNI the dot kernels use vpdpwssd (fused multiply-pairs +
// int32 accumulate, one µop where AVX2 needs madd+add). Semantics are
// bit-identical to the scalar reference: int16 add/sub wraps the same,
// and the pairwise int32 sums are exact for engine-legal values (same
// bound argument as the AVX2 path below).
//
// OPT-IN (-DNV_AVX512=ON), not the default even on AVX-512 hosts: the
// measured A/B on this build host (docs/SPEED_PARITY.md) has the AVX2
// backend FASTER end-to-end — NNUE 0.0274 vs 0.0296 ms/image, EtinyNet
// 0.0970 vs 0.1173 — the engine's buffers are short (≤1024 lanes), so
// 512-bit vectors buy few iterations while the horizontal reductions
// and per-core 512-bit throughput penalties cost more than they save.
// The backend is kept (a) as parity-tested groundwork for hosts where
// 512-bit integer ops do win, and (b) as the measured rejection
// evidence. test_simd_avx512 keeps it bit-exact in every build.

#if defined(__AVX512VNNI__)
const char* backend() { return "avx512+vnni"; }
#else
const char* backend() { return "avx512"; }
#endif

namespace {
inline __m512i dot_step(__m512i acc, __m512i xv, __m512i wv) {
#if defined(__AVX512VNNI__)
  return _mm512_dpwssd_epi32(acc, xv, wv);
#else
  return _mm512_add_epi32(acc, _mm512_madd_epi16(xv, wv));
#endif
}
}  // namespace

void acc_add_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    for (int k = 0; k < 64; k += 32) {
      __m512i a = _mm512_loadu_si512(acc + i + k);
      __m512i r = _mm512_loadu_si512(row + i + k);
      _mm512_storeu_si512(acc + i + k, _mm512_add_epi16(a, r));
    }
  }
  for (; i + 32 <= n; i += 32) {
    __m512i a = _mm512_loadu_si512(acc + i);
    __m512i r = _mm512_loadu_si512(row + i);
    _mm512_storeu_si512(acc + i, _mm512_add_epi16(a, r));
  }
  acc_add_i16_scalar(acc + i, row + i, n - i);
}

void acc_sub_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    for (int k = 0; k < 64; k += 32) {
      __m512i a = _mm512_loadu_si512(acc + i + k);
      __m512i r = _mm512_loadu_si512(row + i + k);
      _mm512_storeu_si512(acc + i + k, _mm512_sub_epi16(a, r));
    }
  }
  for (; i + 32 <= n; i += 32) {
    __m512i a = _mm512_loadu_si512(acc + i);
    __m512i r = _mm512_loadu_si512(row + i);
    _mm512_storeu_si512(acc + i, _mm512_sub_epi16(a, r));
  }
  acc_sub_i16_scalar(acc + i, row + i, n - i);
}

int32_t dot_i16_i8(const int16_t* x, const int8_t* w, int n) {
  // Two independent accumulators hide the dot-step latency.
  __m512i acc0 = _mm512_setzero_si512(), acc1 = _mm512_setzero_si512();
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    __m512i x0 = _mm512_loadu_si512(x + i);
    __m512i x1 = _mm512_loadu_si512(x + i + 32);
    __m512i w0 = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i)));
    __m512i w1 = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i + 32)));
    acc0 = dot_step(acc0, x0, w0);
    acc1 = dot_step(acc1, x1, w1);
  }
  for (; i + 32 <= n; i += 32) {
    __m512i xv = _mm512_loadu_si512(x + i);
    __m512i wv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i)));
    acc0 = dot_step(acc0, xv, wv);
  }
  int32_t r = _mm512_reduce_add_epi32(_mm512_add_epi32(acc0, acc1));
  if (i < n) r += dot_i16_i8_scalar(x + i, w + i, n - i);
  return r;
}

int32_t dot_i8_i8(const int8_t* x, const int8_t* w, int n) {
  __m512i acc = _mm512_setzero_si512();
  int i = 0;
  for (; i + 32 <= n; i += 32) {
    __m512i xv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i)));
    __m512i wv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i)));
    acc = dot_step(acc, xv, wv);
  }
  int32_t r = _mm512_reduce_add_epi32(acc);
  if (i < n) r += dot_i8_i8_scalar(x + i, w + i, n - i);
  return r;
}

void madd_i8_i8(int32_t* acc, const int8_t* x, const int8_t* w, int n) {
  int i = 0;
  for (; i + 32 <= n; i += 32) {
    // int16 products are exact (|x|,|w| ≤ 127 ⇒ |p| ≤ 16129 < 2^15).
    __m512i xv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i)));
    __m512i wv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i)));
    __m512i p = _mm512_mullo_epi16(xv, wv);
    __m512i lo = _mm512_cvtepi16_epi32(_mm512_castsi512_si256(p));
    __m512i hi = _mm512_cvtepi16_epi32(_mm512_extracti64x4_epi64(p, 1));
    _mm512_storeu_si512(acc + i,
                        _mm512_add_epi32(_mm512_loadu_si512(acc + i), lo));
    _mm512_storeu_si512(
        acc + i + 16, _mm512_add_epi32(_mm512_loadu_si512(acc + i + 16), hi));
  }
  // 8-lane SSE chunk (width-8 depthwise stages) — mirrors the AVX2 path.
  for (; i + 8 <= n; i += 8) {
    __m128i xv8 = _mm_cvtepi8_epi16(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(x + i)));
    __m128i wv8 = _mm_cvtepi8_epi16(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m128i p = _mm_mullo_epi16(xv8, wv8);
    __m128i plo = _mm_cvtepi16_epi32(p);
    __m128i phi = _mm_cvtepi16_epi32(_mm_srli_si128(p, 8));
    __m128i* a0 = reinterpret_cast<__m128i*>(acc + i);
    __m128i* a1 = reinterpret_cast<__m128i*>(acc + i + 4);
    _mm_storeu_si128(a0, _mm_add_epi32(_mm_loadu_si128(a0), plo));
    _mm_storeu_si128(a1, _mm_add_epi32(_mm_loadu_si128(a1), phi));
  }
  if (i < n) madd_i8_i8_scalar(acc + i, x + i, w + i, n - i);
}

void madd_scalar_wide_i8(int32_t* acc, int32_t x, const int8_t* w, int n) {
  const __m512i xv = _mm512_set1_epi32(x);
  int i = 0;
  for (; i + 16 <= n; i += 16) {
    __m512i wv = _mm512_cvtepi8_epi32(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    _mm512_storeu_si512(
        acc + i, _mm512_add_epi32(_mm512_loadu_si512(acc + i),
                                  _mm512_mullo_epi32(wv, xv)));
  }
  for (; i + 8 <= n; i += 8) {
    __m256i wv = _mm256_cvtepi8_epi32(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m256i* a = reinterpret_cast<__m256i*>(acc + i);
    _mm256_storeu_si256(
        a, _mm256_add_epi32(_mm256_loadu_si256(a),
                            _mm256_mullo_epi32(wv, _mm256_set1_epi32(x))));
  }
  if (i < n) madd_scalar_wide_i8_scalar(acc + i, x, w + i, n - i);
}

void madd_scalar_i8(int32_t* acc, int x, const int8_t* w, int n) {
  const __m512i xv = _mm512_set1_epi16(static_cast<short>(x));
  int i = 0;
  for (; i + 32 <= n; i += 32) {
    // |x·w| ≤ 127·127 < 2^15 ⇒ int16 products exact.
    __m512i wv = _mm512_cvtepi8_epi16(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i)));
    __m512i p = _mm512_mullo_epi16(wv, xv);
    __m512i lo = _mm512_cvtepi16_epi32(_mm512_castsi512_si256(p));
    __m512i hi = _mm512_cvtepi16_epi32(_mm512_extracti64x4_epi64(p, 1));
    _mm512_storeu_si512(acc + i,
                        _mm512_add_epi32(_mm512_loadu_si512(acc + i), lo));
    _mm512_storeu_si512(
        acc + i + 16, _mm512_add_epi32(_mm512_loadu_si512(acc + i + 16), hi));
  }
  for (; i + 8 <= n; i += 8) {
    __m128i wv8 =
        _mm_cvtepi8_epi16(_mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m128i p = _mm_mullo_epi16(wv8, _mm_set1_epi16(static_cast<short>(x)));
    __m128i lo = _mm_cvtepi16_epi32(p);
    __m128i hi = _mm_cvtepi16_epi32(_mm_srli_si128(p, 8));
    __m128i* a0 = reinterpret_cast<__m128i*>(acc + i);
    __m128i* a1 = reinterpret_cast<__m128i*>(acc + i + 4);
    _mm_storeu_si128(a0, _mm_add_epi32(_mm_loadu_si128(a0), lo));
    _mm_storeu_si128(a1, _mm_add_epi32(_mm_loadu_si128(a1), hi));
  }
  if (i < n) madd_scalar_i8_scalar(acc + i, x, w + i, n - i);
}

void acc_add4_i16(int16_t* acc, const int16_t* r0, const int16_t* r1,
                  const int16_t* r2, const int16_t* r3, int n) {
  int i = 0;
  for (; i + 32 <= n; i += 32) {
    __m512i a = _mm512_loadu_si512(acc + i);
    a = _mm512_add_epi16(a, _mm512_loadu_si512(r0 + i));
    a = _mm512_add_epi16(a, _mm512_loadu_si512(r1 + i));
    a = _mm512_add_epi16(a, _mm512_loadu_si512(r2 + i));
    a = _mm512_add_epi16(a, _mm512_loadu_si512(r3 + i));
    _mm512_storeu_si512(acc + i, a);
  }
  if (i < n) acc_add4_i16_scalar(acc + i, r0 + i, r1 + i, r2 + i, r3 + i,
                                 n - i);
}

int32_t dot_u7_i8(const uint8_t* x, const int8_t* w, int n) {
  __m512i acc = _mm512_setzero_si512();
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    __m512i xv = _mm512_loadu_si512(x + i);
    __m512i wv = _mm512_loadu_si512(w + i);
#if defined(__AVX512VNNI__)
    // u8×s8 4-byte dot straight into int32 lanes — exact by construction.
    acc = _mm512_dpbusd_epi32(acc, xv, wv);
#else
    // u7·i8 pair sums fit int16 (≤ ±32258), so maddubs never saturates.
    __m512i p = _mm512_maddubs_epi16(xv, wv);
    acc = _mm512_add_epi32(acc, _mm512_madd_epi16(p, _mm512_set1_epi16(1)));
#endif
  }
  int32_t r = _mm512_reduce_add_epi32(acc);
  if (i < n) r += dot_u7_i8_scalar(x + i, w + i, n - i);
  return r;
}

#elif defined(__AVX2__)

const char* backend() { return "avx2"; }

// 4× unrolled (64 int16 per iteration) — matches the throughput the
// auto-vectorizer achieved on the plain loops; a single-vector loop
// measured ~5-10% slower on the FT-bound density sweep.
void acc_add_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    for (int k = 0; k < 64; k += 16) {
      __m256i a =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + i + k));
      __m256i r =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(row + i + k));
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + i + k),
                          _mm256_add_epi16(a, r));
    }
  }
  for (; i + 16 <= n; i += 16) {
    __m256i a = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + i));
    __m256i r = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(row + i));
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + i),
                        _mm256_add_epi16(a, r));
  }
  acc_add_i16_scalar(acc + i, row + i, n - i);
}

void acc_sub_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    for (int k = 0; k < 64; k += 16) {
      __m256i a =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + i + k));
      __m256i r =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(row + i + k));
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + i + k),
                          _mm256_sub_epi16(a, r));
    }
  }
  for (; i + 16 <= n; i += 16) {
    __m256i a = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + i));
    __m256i r = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(row + i));
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + i),
                        _mm256_sub_epi16(a, r));
  }
  acc_sub_i16_scalar(acc + i, row + i, n - i);
}

namespace {
inline int32_t hsum_epi32(__m256i v) {
  __m128i lo = _mm256_castsi256_si128(v);
  __m128i hi = _mm256_extracti128_si256(v, 1);
  __m128i s = _mm_add_epi32(lo, hi);
  s = _mm_add_epi32(s, _mm_shuffle_epi32(s, _MM_SHUFFLE(1, 0, 3, 2)));
  s = _mm_add_epi32(s, _mm_shuffle_epi32(s, _MM_SHUFFLE(2, 3, 0, 1)));
  return _mm_cvtsi128_si32(s);
}
}  // namespace

int32_t dot_i16_i8(const int16_t* x, const int8_t* w, int n) {
  // Two independent accumulators hide madd latency.
  __m256i acc0 = _mm256_setzero_si256(), acc1 = _mm256_setzero_si256();
  int i = 0;
  for (; i + 32 <= n; i += 32) {
    __m256i x0 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i));
    __m256i x1 =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i + 16));
    __m256i w0 = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    __m256i w1 = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i + 16)));
    acc0 = _mm256_add_epi32(acc0, _mm256_madd_epi16(x0, w0));
    acc1 = _mm256_add_epi32(acc1, _mm256_madd_epi16(x1, w1));
  }
  for (; i + 16 <= n; i += 16) {
    __m256i xv = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i));
    __m256i wv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    acc0 = _mm256_add_epi32(acc0, _mm256_madd_epi16(xv, wv));
  }
  int32_t r = hsum_epi32(_mm256_add_epi32(acc0, acc1));
  if (i < n) r += dot_i16_i8_scalar(x + i, w + i, n - i);
  return r;
}

int32_t dot_i8_i8(const int8_t* x, const int8_t* w, int n) {
  __m256i acc = _mm256_setzero_si256();
  int i = 0;
  for (; i + 16 <= n; i += 16) {
    __m256i xv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(x + i)));
    __m256i wv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    acc = _mm256_add_epi32(acc, _mm256_madd_epi16(xv, wv));
  }
  int32_t r = hsum_epi32(acc);
  if (i < n) r += dot_i8_i8_scalar(x + i, w + i, n - i);
  return r;
}

void madd_i8_i8(int32_t* acc, const int8_t* x, const int8_t* w, int n) {
  int i = 0;
  for (; i + 16 <= n; i += 16) {
    // int16 products are exact (|x|,|w| ≤ 127 ⇒ |p| ≤ 16129 < 2^15).
    __m256i xv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(x + i)));
    __m256i wv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    __m256i p = _mm256_mullo_epi16(xv, wv);
    __m256i lo = _mm256_cvtepi16_epi32(_mm256_castsi256_si128(p));
    __m256i hi = _mm256_cvtepi16_epi32(_mm256_extracti128_si256(p, 1));
    __m256i* a0 = reinterpret_cast<__m256i*>(acc + i);
    __m256i* a1 = reinterpret_cast<__m256i*>(acc + i + 8);
    _mm256_storeu_si256(a0, _mm256_add_epi32(_mm256_loadu_si256(a0), lo));
    _mm256_storeu_si256(a1, _mm256_add_epi32(_mm256_loadu_si256(a1), hi));
  }
  // 8-lane SSE chunk: width-8 depthwise stages (EtinyNet micro stage 1)
  // otherwise run the scalar tail for the whole row.
  for (; i + 8 <= n; i += 8) {
    __m128i xv8 = _mm_cvtepi8_epi16(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(x + i)));
    __m128i wv8 = _mm_cvtepi8_epi16(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m128i p = _mm_mullo_epi16(xv8, wv8);
    __m128i lo = _mm_cvtepi16_epi32(p);
    __m128i hi = _mm_cvtepi16_epi32(_mm_srli_si128(p, 8));
    __m128i* a0 = reinterpret_cast<__m128i*>(acc + i);
    __m128i* a1 = reinterpret_cast<__m128i*>(acc + i + 4);
    _mm_storeu_si128(a0, _mm_add_epi32(_mm_loadu_si128(a0), lo));
    _mm_storeu_si128(a1, _mm_add_epi32(_mm_loadu_si128(a1), hi));
  }
  if (i < n) madd_i8_i8_scalar(acc + i, x + i, w + i, n - i);
}

void madd_scalar_wide_i8(int32_t* acc, int32_t x, const int8_t* w, int n) {
  const __m256i xv = _mm256_set1_epi32(x);
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    __m256i wv = _mm256_cvtepi8_epi32(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m256i* a = reinterpret_cast<__m256i*>(acc + i);
    _mm256_storeu_si256(a, _mm256_add_epi32(_mm256_loadu_si256(a),
                                            _mm256_mullo_epi32(wv, xv)));
  }
  if (i < n) madd_scalar_wide_i8_scalar(acc + i, x, w + i, n - i);
}

void madd_scalar_i8(int32_t* acc, int x, const int8_t* w, int n) {
  const __m256i xv = _mm256_set1_epi16(static_cast<short>(x));
  int i = 0;
  for (; i + 16 <= n; i += 16) {
    // |x·w| ≤ 127·127 < 2^15 ⇒ int16 products exact.
    __m256i wv = _mm256_cvtepi8_epi16(
        _mm_loadu_si128(reinterpret_cast<const __m128i*>(w + i)));
    __m256i p = _mm256_mullo_epi16(wv, xv);
    __m256i lo = _mm256_cvtepi16_epi32(_mm256_castsi256_si128(p));
    __m256i hi = _mm256_cvtepi16_epi32(_mm256_extracti128_si256(p, 1));
    __m256i* a0 = reinterpret_cast<__m256i*>(acc + i);
    __m256i* a1 = reinterpret_cast<__m256i*>(acc + i + 8);
    _mm256_storeu_si256(a0, _mm256_add_epi32(_mm256_loadu_si256(a0), lo));
    _mm256_storeu_si256(a1, _mm256_add_epi32(_mm256_loadu_si256(a1), hi));
  }
  // 8-lane SSE chunk: EtinyNet micro stage-1 widths are exactly 8.
  for (; i + 8 <= n; i += 8) {
    __m128i wv8 = _mm_cvtepi8_epi16(
        _mm_loadl_epi64(reinterpret_cast<const __m128i*>(w + i)));
    __m128i p = _mm_mullo_epi16(wv8, _mm_set1_epi16(static_cast<short>(x)));
    __m128i lo = _mm_cvtepi16_epi32(p);
    __m128i hi = _mm_cvtepi16_epi32(_mm_srli_si128(p, 8));
    __m128i* a0 = reinterpret_cast<__m128i*>(acc + i);
    __m128i* a1 = reinterpret_cast<__m128i*>(acc + i + 4);
    _mm_storeu_si128(a0, _mm_add_epi32(_mm_loadu_si128(a0), lo));
    _mm_storeu_si128(a1, _mm_add_epi32(_mm_loadu_si128(a1), hi));
  }
  if (i < n) madd_scalar_i8_scalar(acc + i, x, w + i, n - i);
}

void acc_add4_i16(int16_t* acc, const int16_t* r0, const int16_t* r1,
                  const int16_t* r2, const int16_t* r3, int n) {
  int i = 0;
  for (; i + 16 <= n; i += 16) {
    __m256i a = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(acc + i));
    a = _mm256_add_epi16(
        a, _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r0 + i)));
    a = _mm256_add_epi16(
        a, _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r1 + i)));
    a = _mm256_add_epi16(
        a, _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r2 + i)));
    a = _mm256_add_epi16(
        a, _mm256_loadu_si256(reinterpret_cast<const __m256i*>(r3 + i)));
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(acc + i), a);
  }
  if (i < n) acc_add4_i16_scalar(acc + i, r0 + i, r1 + i, r2 + i, r3 + i,
                                 n - i);
}

int32_t dot_u7_i8(const uint8_t* x, const int8_t* w, int n) {
  // vpmaddubsw processes 32 bytes/instruction — 2× dot_i16_i8's rate.
  // Exact: u7·i8 pair sums fit int16 (≤ ±32258), so the saturating add
  // inside maddubs never saturates; madd-by-ones widens to int32.
  __m256i acc0 = _mm256_setzero_si256(), acc1 = _mm256_setzero_si256();
  const __m256i ones = _mm256_set1_epi16(1);
  int i = 0;
  for (; i + 64 <= n; i += 64) {
    __m256i x0 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i));
    __m256i x1 =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i + 32));
    __m256i w0 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i));
    __m256i w1 =
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i + 32));
    acc0 = _mm256_add_epi32(acc0,
                            _mm256_madd_epi16(_mm256_maddubs_epi16(x0, w0),
                                              ones));
    acc1 = _mm256_add_epi32(acc1,
                            _mm256_madd_epi16(_mm256_maddubs_epi16(x1, w1),
                                              ones));
  }
  for (; i + 32 <= n; i += 32) {
    __m256i xv = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(x + i));
    __m256i wv = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(w + i));
    acc0 = _mm256_add_epi32(
        acc0, _mm256_madd_epi16(_mm256_maddubs_epi16(xv, wv), ones));
  }
  int32_t r = hsum_epi32(_mm256_add_epi32(acc0, acc1));
  if (i < n) r += dot_u7_i8_scalar(x + i, w + i, n - i);
  return r;
}

#elif defined(__ARM_NEON)

const char* backend() { return "neon"; }

void acc_add_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 8 <= n; i += 8)
    vst1q_s16(acc + i, vaddq_s16(vld1q_s16(acc + i), vld1q_s16(row + i)));
  acc_add_i16_scalar(acc + i, row + i, n - i);
}

void acc_sub_i16(int16_t* acc, const int16_t* row, int n) {
  int i = 0;
  for (; i + 8 <= n; i += 8)
    vst1q_s16(acc + i, vsubq_s16(vld1q_s16(acc + i), vld1q_s16(row + i)));
  acc_sub_i16_scalar(acc + i, row + i, n - i);
}

int32_t dot_i16_i8(const int16_t* x, const int8_t* w, int n) {
  int32x4_t acc = vdupq_n_s32(0);
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t xv = vld1q_s16(x + i);
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    acc = vmlal_s16(acc, vget_low_s16(xv), vget_low_s16(wv));
    acc = vmlal_s16(acc, vget_high_s16(xv), vget_high_s16(wv));
  }
  int32_t r = vaddvq_s32(acc);
  if (i < n) r += dot_i16_i8_scalar(x + i, w + i, n - i);
  return r;
}

int32_t dot_i8_i8(const int8_t* x, const int8_t* w, int n) {
  int32x4_t acc = vdupq_n_s32(0);
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t xv = vmovl_s8(vld1_s8(x + i));
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    acc = vmlal_s16(acc, vget_low_s16(xv), vget_low_s16(wv));
    acc = vmlal_s16(acc, vget_high_s16(xv), vget_high_s16(wv));
  }
  int32_t r = vaddvq_s32(acc);
  if (i < n) r += dot_i8_i8_scalar(x + i, w + i, n - i);
  return r;
}

void madd_i8_i8(int32_t* acc, const int8_t* x, const int8_t* w, int n) {
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t xv = vmovl_s8(vld1_s8(x + i));
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    int32x4_t lo = vmull_s16(vget_low_s16(xv), vget_low_s16(wv));
    int32x4_t hi = vmull_s16(vget_high_s16(xv), vget_high_s16(wv));
    vst1q_s32(acc + i, vaddq_s32(vld1q_s32(acc + i), lo));
    vst1q_s32(acc + i + 4, vaddq_s32(vld1q_s32(acc + i + 4), hi));
  }
  if (i < n) madd_i8_i8_scalar(acc + i, x + i, w + i, n - i);
}

void madd_scalar_wide_i8(int32_t* acc, int32_t x, const int8_t* w, int n) {
  const int32x4_t xv = vdupq_n_s32(x);
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    int32x4_t lo = vmulq_s32(vmovl_s16(vget_low_s16(wv)), xv);
    int32x4_t hi = vmulq_s32(vmovl_s16(vget_high_s16(wv)), xv);
    vst1q_s32(acc + i, vaddq_s32(vld1q_s32(acc + i), lo));
    vst1q_s32(acc + i + 4, vaddq_s32(vld1q_s32(acc + i + 4), hi));
  }
  if (i < n) madd_scalar_wide_i8_scalar(acc + i, x, w + i, n - i);
}

void madd_scalar_i8(int32_t* acc, int x, const int8_t* w, int n) {
  const int16x8_t xv = vdupq_n_s16(static_cast<int16_t>(x));
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    int16x8_t p = vmulq_s16(wv, xv);  // exact: |x·w| ≤ 16129 < 2^15
    vst1q_s32(acc + i,
              vaddq_s32(vld1q_s32(acc + i), vmovl_s16(vget_low_s16(p))));
    vst1q_s32(acc + i + 4, vaddq_s32(vld1q_s32(acc + i + 4),
                                     vmovl_s16(vget_high_s16(p))));
  }
  if (i < n) madd_scalar_i8_scalar(acc + i, x, w + i, n - i);
}

void acc_add4_i16(int16_t* acc, const int16_t* r0, const int16_t* r1,
                  const int16_t* r2, const int16_t* r3, int n) {
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t a = vld1q_s16(acc + i);
    a = vaddq_s16(a, vld1q_s16(r0 + i));
    a = vaddq_s16(a, vld1q_s16(r1 + i));
    a = vaddq_s16(a, vld1q_s16(r2 + i));
    a = vaddq_s16(a, vld1q_s16(r3 + i));
    vst1q_s16(acc + i, a);
  }
  if (i < n) acc_add4_i16_scalar(acc + i, r0 + i, r1 + i, r2 + i, r3 + i,
                                 n - i);
}

int32_t dot_u7_i8(const uint8_t* x, const int8_t* w, int n) {
  // NEON has no unsigned×signed byte dot; u7 values fit int16 exactly, so
  // widen-and-mlal matches the scalar reference (same rate as dot_i8_i8).
  int32x4_t acc = vdupq_n_s32(0);
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    int16x8_t xv = vreinterpretq_s16_u16(vmovl_u8(vld1_u8(x + i)));
    int16x8_t wv = vmovl_s8(vld1_s8(w + i));
    acc = vmlal_s16(acc, vget_low_s16(xv), vget_low_s16(wv));
    acc = vmlal_s16(acc, vget_high_s16(xv), vget_high_s16(wv));
  }
  int32_t r = vaddvq_s32(acc);
  if (i < n) r += dot_u7_i8_scalar(x + i, w + i, n - i);
  return r;
}

#else

const char* backend() { return "scalar"; }

void acc_add_i16(int16_t* acc, const int16_t* row, int n) {
  acc_add_i16_scalar(acc, row, n);
}
void acc_sub_i16(int16_t* acc, const int16_t* row, int n) {
  acc_sub_i16_scalar(acc, row, n);
}
int32_t dot_i16_i8(const int16_t* x, const int8_t* w, int n) {
  return dot_i16_i8_scalar(x, w, n);
}
int32_t dot_i8_i8(const int8_t* x, const int8_t* w, int n) {
  return dot_i8_i8_scalar(x, w, n);
}
void madd_i8_i8(int32_t* acc, const int8_t* x, const int8_t* w, int n) {
  madd_i8_i8_scalar(acc, x, w, n);
}
int32_t dot_u7_i8(const uint8_t* x, const int8_t* w, int n) {
  return dot_u7_i8_scalar(x, w, n);
}
void acc_add4_i16(int16_t* acc, const int16_t* r0, const int16_t* r1,
                  const int16_t* r2, const int16_t* r3, int n) {
  acc_add4_i16_scalar(acc, r0, r1, r2, r3, n);
}
void madd_scalar_i8(int32_t* acc, int x, const int8_t* w, int n) {
  madd_scalar_i8_scalar(acc, x, w, n);
}
void madd_scalar_wide_i8(int32_t* acc, int32_t x, const int8_t* w, int n) {
  madd_scalar_wide_i8_scalar(acc, x, w, n);
}

#endif

}  // namespace simd
}  // namespace nv
