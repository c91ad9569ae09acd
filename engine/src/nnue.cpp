// NNUE .nnue v2 loader + int8 evaluator.
//
// Arithmetic contract (identical to the JAX sim; see
// nnue_vision_tpu/ops/engine_sim.py for the full derivation):
//   conv: acc = bias + sum(int32(x*scale) * w8); out = clamp(acc/scale, ±127)
//   feature transformer: int16 accumulation (wraparound), clipped ReLU 0..127
//   pairwise: (a*b)/128 truncating, clamp 0..127; concat with clamp(a)
//   fc1: clamp(acc/scale, 0..127); fc2: relu(clamp(acc/scale, ±127))
//   output: float logits acc/out_scale; density = active/total (f32 divide)

#include <cmath>
#include <cstring>
#include <fstream>
#include <limits>

#include "../include/nv/ints.h"
#include "../include/nv/model.h"
#include "../include/nv/simd.h"
#include "io_util.h"

namespace nv {

namespace {

// Reads the conv payload shared by .nnue and .etiny (inner tag + scale +
// dims + int8 weights in (out, kh, kw, in) order + int32 biases).
void read_conv_payload(std::istream& in, float& scale, int& out_channels,
                       std::vector<int8_t>& w, std::vector<int32_t>& b) {
  expect(read_u32(in, "conv tag") == 0, "conv inner tag must be 0");
  scale = read_f32(in, "conv scale");
  const uint32_t oc = read_u32(in), ic = read_u32(in);
  const uint32_t kh = read_u32(in), kw = read_u32(in);
  expect(ic == 3 && kh == 3 && kw == 3, "conv must be 3-channel 3x3");
  expect(oc >= 1 && oc <= 4096, "conv out_channels out of range");
  out_channels = static_cast<int>(oc);
  w = read_vec<int8_t>(in, static_cast<size_t>(oc) * 27, "conv weights");
  expect(read_u32(in, "conv bias count") == oc, "conv bias count mismatch");
  b = read_vec<int32_t>(in, oc, "conv biases");
}

void read_linear(std::istream& in, size_t rows, size_t cols,
                 std::vector<int8_t>& w, std::vector<int32_t>& b,
                 const char* what) {
  w = read_vec<int8_t>(in, rows * cols, what);
  expect(read_u32(in) == rows, std::string(what) + " bias count mismatch");
  b = read_vec<int32_t>(in, rows, what);
}

}  // namespace

int nnue_conv_stride(int image_h, int grid) {
  if (grid <= 1) return image_h > 1 ? image_h : 1;
  const int num = image_h - 1, den = grid - 1;
  const int s = (num + den - 1) / den;
  return s < 1 ? 1 : s;
}

NnueNet load_nnue(std::istream& in) {
  NnueNet net;
  char magic[4];
  read_exact(in, magic, 4, "magic");
  expect(std::memcmp(magic, "NNUE", 4) == 0, "bad .nnue magic");
  expect(read_u32(in, "version") == 2, "unsupported .nnue version");

  net.num_features = static_cast<int>(read_u32(in));
  net.l1 = static_cast<int>(read_u32(in));
  net.l2 = static_cast<int>(read_u32(in));
  net.l3 = static_cast<int>(read_u32(in));
  const uint32_t buckets = read_u32(in);
  expect(buckets == 1, "only single-bucket layer stacks are supported");
  net.nnue2score = read_f32(in);
  net.quantized_one = read_f32(in);
  net.visual_threshold = read_f32(in);

  read_conv_payload(in, net.conv_scale, net.conv_out_channels, net.conv_w,
                    net.conv_b);
  net.conv_w_t.resize(net.conv_w.size());
  transpose_i8(net.conv_w.data(), net.conv_out_channels, 27,
               net.conv_w_t.data());
  expect(net.conv_out_channels > 0 &&
             net.num_features % net.conv_out_channels == 0,
         "features not divisible by conv channels");
  const int cells = net.num_features / net.conv_out_channels;
  net.grid = static_cast<int>(std::lround(std::sqrt(double(cells))));
  expect(net.grid * net.grid == cells, "feature grid is not square");

  net.ft_scale = read_f32(in);
  expect(static_cast<int>(read_u32(in)) == net.num_features,
         "FT feature count mismatch");
  expect(static_cast<int>(read_u32(in)) == net.l1, "FT l1 mismatch");
  net.ft_w = read_vec<int16_t>(
      in, static_cast<size_t>(net.num_features) * net.l1, "FT weights");
  expect(static_cast<int>(read_u32(in)) == net.l1, "FT bias count mismatch");
  net.ft_b = read_vec<int32_t>(in, net.l1, "FT biases");

  // Layer-stack container: scales, padded L1, 127*I factorization block
  // (ignored by the multiclass path), doubled L2, output.
  net.fc1_scale = read_f32(in);
  net.fc2_scale = read_f32(in);
  net.out_scale = read_f32(in);
  net.l1_fact_scale = read_f32(in);

  const int l1_out = static_cast<int>(read_u32(in));
  const int l1_in = static_cast<int>(read_u32(in));
  expect(l1_out == net.l2 + 1 && l1_in == net.l1, "layer-stack L1 dims");
  {
    std::vector<int8_t> w;
    std::vector<int32_t> b;
    read_linear(in, l1_out, l1_in, w, b, "L1");
    net.fc1_w.assign(w.begin(), w.begin() + size_t(net.l2) * net.l1);
    net.fc1_b.assign(b.begin(), b.begin() + net.l2);
    // padded row l2: used only by the chess-legacy single-score path
    net.fc1_pad_w.assign(w.begin() + size_t(net.l2) * net.l1, w.end());
    net.fc1_pad_b = b[size_t(net.l2)];
  }
  {
    const uint32_t fo = read_u32(in), fi = read_u32(in);
    expect(static_cast<int>(fi) == net.l1 && static_cast<int>(fo) == net.l1,
           "factorization block dims");
    read_linear(in, static_cast<int>(fo), static_cast<int>(fi),
                net.l1_fact_w, net.l1_fact_b, "factorization");
  }
  {
    const int l2_out = static_cast<int>(read_u32(in));
    const int l2_in = static_cast<int>(read_u32(in));
    expect(l2_out == net.l3 && l2_in == 2 * net.l2, "layer-stack L2 dims");
    std::vector<int8_t> w;
    read_linear(in, l2_out, l2_in, w, net.fc2_b, "L2");
    // multiclass path uses only the first l2 columns (second half is
    // format padding); the single-score path contracts the full width
    net.fc2_full_w = w;
    net.fc2_w.resize(size_t(net.l3) * net.l2);
    for (int r = 0; r < net.l3; ++r) {
      std::memcpy(&net.fc2_w[size_t(r) * net.l2], &w[size_t(r) * l2_in],
                  net.l2);
    }
  }
  {
    const int oo = static_cast<int>(read_u32(in));
    const int oi = static_cast<int>(read_u32(in));
    expect(oi == net.l3 && oo >= 1, "output layer dims");
    net.num_classes = oo;
    read_linear(in, oo, oi, net.out_w, net.out_b, "output");
  }
  return net;
}

NnueNet load_nnue_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  expect(f.is_open(), "cannot open " + path);
  return load_nnue(f);
}

namespace {

// int8 conv frontend into a zero-filled grid*grid*C buffer (flat placement,
// matching the upstream engine's buffer reinterpretation).
void conv_frontend(const NnueNet& net, const float* image, int h, int w,
                   std::vector<int8_t>& grid_buf) {
  const int stride = nnue_conv_stride(h, net.grid);
  const int oh = (h + 2 - 3) / stride + 1;
  const int ow = (w + 2 - 3) / stride + 1;
  const int C = net.conv_out_channels;
  grid_buf.assign(size_t(net.grid) * net.grid * C, 0);

  const float scale = net.conv_scale;
  const int32_t iscale = static_cast<int32_t>(scale);

  // The engine derives the stride from h only (upstream quirk mirrored by
  // nnue_conv_stride); a wider-than-tall image would make ow exceed the
  // grid and write past the buffer — reject like the JAX sim does.
  if (size_t(oh) * ow * C > grid_buf.size())
    fail("conv output exceeds the feature grid (unsupported image "
         "geometry; the engine stride rule assumes w <= h)");

  // Quantize the input ONCE (the naive loop re-quantizes every pixel per
  // output channel — 8× redundant float work); the kernel is tap-major
  // (conv_w_t, loader-built) so each quantized value broadcasts against
  // a contiguous row of output channels (vectorized at any C; per-output
  // dots of length ≤27 are vector-hostile). Identical integer
  // arithmetic, just reordered — int32 addition is associative.
  std::vector<int32_t> qin(size_t(h) * w * 3);
  for (size_t i = 0; i < qin.size(); ++i)
    qin[i] = quant_input(image[i], scale);
  std::vector<int8_t> wt_local;
  const int8_t* wt = net.conv_w_t.data();
  if (net.conv_w_t.size() != net.conv_w.size()) {
    // hand-built nets may lack the loader transpose
    wt_local.resize(net.conv_w.size());
    transpose_i8(net.conv_w.data(), C, 27, wt_local.data());
    wt = wt_local.data();
  }

  std::vector<int32_t> acc(C);
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      const int by = y * stride - 1, bx = x * stride - 1;
      std::copy(net.conv_b.begin(), net.conv_b.end(), acc.begin());
      for (int ky = 0; ky < 3; ++ky) {
        const int iy = by + ky;
        if (iy < 0 || iy >= h) continue;
        for (int kx = 0; kx < 3; ++kx) {
          const int ix = bx + kx;
          if (ix < 0 || ix >= w) continue;
          const int32_t* qpx = &qin[(size_t(iy) * w + ix) * 3];
          const int8_t* wk = wt + size_t((ky * 3 + kx) * 3) * C;
          for (int ci = 0; ci < 3; ++ci) {
            if (qpx[ci] != 0)
              simd::madd_scalar_wide_i8(acc.data(), qpx[ci],
                                        wk + size_t(ci) * C, C);
          }
        }
      }
      int8_t* out = &grid_buf[(size_t(y) * ow + x) * C];
      for (int oc = 0; oc < C; ++oc) out[oc] = sat_i8(tdiv(acc[oc], iscale));
    }
  }
}

}  // namespace

void nnue_extract_features(const NnueNet& net, const float* image, int h,
                           int w, std::vector<int>& features) {
  std::vector<int8_t> grid_buf;
  conv_frontend(net, image, h, w, grid_buf);
  features.clear();
  const float t = net.visual_threshold;
  for (size_t i = 0; i < grid_buf.size(); ++i) {
    if (static_cast<float>(grid_buf[i]) > t) features.push_back(int(i));
  }
}

void nnue_refresh_accumulator(const NnueNet& net,
                              const std::vector<int>& features,
                              std::vector<int16_t>& acc) {
  acc.resize(net.l1);
  for (int i = 0; i < net.l1; ++i) acc[i] = static_cast<int16_t>(net.ft_b[i]);
  // Fuse four FT rows per accumulator pass (acc traffic dominates the
  // refresh at typical densities); int16 wraparound addition commutes,
  // so grouping is bit-exact vs one row at a time.
  const int16_t* rows[4];
  int k = 0;
  for (int f : features) {
    if (f < 0 || f >= net.num_features) continue;
    rows[k++] = &net.ft_w[size_t(f) * net.l1];
    if (k == 4) {
      simd::acc_add4_i16(acc.data(), rows[0], rows[1], rows[2], rows[3],
                         net.l1);
      k = 0;
    }
  }
  for (int i = 0; i < k; ++i) simd::acc_add_i16(acc.data(), rows[i], net.l1);
}

void nnue_update_accumulator(const NnueNet& net, const std::vector<int>& added,
                             const std::vector<int>& removed,
                             std::vector<int16_t>& acc) {
  for (int f : removed) {
    if (f < 0 || f >= net.num_features) continue;
    simd::acc_sub_i16(acc.data(), &net.ft_w[size_t(f) * net.l1], net.l1);
  }
  for (int f : added) {
    if (f < 0 || f >= net.num_features) continue;
    simd::acc_add_i16(acc.data(), &net.ft_w[size_t(f) * net.l1], net.l1);
  }
}

std::vector<float> nnue_head(const NnueNet& net,
                             const std::vector<int16_t>& acc) {
  const int l1 = net.l1, l2 = net.l2, l3 = net.l3;
  const int half = l1 / 2;
  const int16_t qone = static_cast<int16_t>(net.quantized_one);

  // clipped ReLU + pairwise interaction. All head activations are
  // clamped to [0, 127], so they live in uint8 buffers and the dense
  // dots take the u7×i8 fast path (vpmaddubsw/vpdpbusd — 2-4× the bytes
  // per instruction of the int16 dot; values unchanged, bit-exact).
  std::vector<uint8_t> pairwise(l1);
  for (int i = 0; i < half; ++i) {
    int32_t a = clamp_i32(acc[i], 0, qone);
    int32_t b = clamp_i32(acc[i + half], 0, qone);
    pairwise[i] = static_cast<uint8_t>(clamp_i32((a * b) / 128, 0, 127));
    pairwise[i + half] = static_cast<uint8_t>(clamp_i32(a, 0, 127));
  }

  std::vector<uint8_t> h1(l2);
  const int32_t s1 = static_cast<int32_t>(net.fc1_scale);
  for (int r = 0; r < l2; ++r) {
    int32_t a = net.fc1_b[r] +
                simd::dot_u7_i8(pairwise.data(), &net.fc1_w[size_t(r) * l1],
                                l1);
    h1[r] = static_cast<uint8_t>(clamp_i32(tdiv(a, s1), 0, 127));
  }

  std::vector<uint8_t> h2(l3);
  const int32_t s2 = static_cast<int32_t>(net.fc2_scale);
  for (int r = 0; r < l3; ++r) {
    int32_t a = net.fc2_b[r] +
                simd::dot_u7_i8(h1.data(), &net.fc2_w[size_t(r) * l2], l2);
    h2[r] = static_cast<uint8_t>(
        clamp_i32(clamp_i32(tdiv(a, s2), -127, 127), 0, 127));
  }

  std::vector<float> logits(net.num_classes);
  for (int c = 0; c < net.num_classes; ++c) {
    int32_t a = net.out_b[c] +
                simd::dot_u7_i8(h2.data(), &net.out_w[size_t(c) * l3], l3);
    logits[c] = static_cast<float>(a) / net.out_scale;
  }
  return logits;
}

float nnue_head_single(const NnueNet& net, const std::vector<int16_t>& acc,
                       int bias_lanes) {
  // Mirrors upstream LayerStack::forward (nnue_engine.cpp:382-478) value
  // for value — INCLUDING an upstream quirk this path must reproduce to
  // be bit-compatible with the upstream binary: its L1/L2 dense layers
  // dispatch to simd::dense_forward_{avx2,neon}, which initialize the
  // accumulator VECTOR with the bias in every lane and then horizontally
  // sum, counting the bias 8× on AVX2 (simd_avx2.cpp:119-141 upstream),
  // 4× on NEON (simd_neon.cpp:119-141), 1× in the scalar fallback. A
  // single .nnue file therefore scores differently on different upstream
  // builds. `bias_lanes` selects which build to match: 0 = auto (the
  // upstream binary compiled on THIS host's ISA), 1/4/8 explicit. The
  // factorization layer always uses the scalar path upstream (bias once,
  // float-divide) and is mirrored so here.
  if (bias_lanes == 0) {
    const char* b = simd::backend();
    bias_lanes = (b[0] == 'a') ? 8 : (b[0] == 'n') ? 4 : 1;
  }
  const int l1 = net.l1, l2 = net.l2, l3 = net.l3;
  // Upstream guard (nnue_engine.cpp:415-417): the factorization skip
  // reads row l2 of the (l1, l1) factorization block, so l2 >= l1 means
  // the file cannot carry this path — upstream returns NaN rather than
  // reading out of bounds, and so do we (the multiclass path is
  // unaffected and such files still load).
  if (l2 >= l1) {
    return std::numeric_limits<float>::quiet_NaN();
  }
  const int16_t qone = static_cast<int16_t>(net.quantized_one);

  std::vector<int16_t> in(static_cast<size_t>(l1));
  for (int i = 0; i < l1; ++i) {
    in[i] = static_cast<int16_t>(clamp_i32(acc[i], 0, qone));
  }

  // dense layer with the upstream SIMD dispatch semantics: bias counted
  // `bias_lanes`×; scalar build divides float-then-cast, SIMD builds
  // divide in int32 (identical for pow2 scales; both truncate to zero)
  const auto dense_row = [&](const int8_t* wrow, int32_t bias, int width,
                             float scale) -> int32_t {
    int32_t a = bias * bias_lanes +
                simd::dot_i16_i8(in.data(), wrow, width);
    return bias_lanes == 1
               ? static_cast<int32_t>(static_cast<float>(a) / scale)
               : a / static_cast<int32_t>(scale);
  };

  // combined L1: l2 real rows + the padded row (index l2)
  std::vector<int8_t> l1o(static_cast<size_t>(l2) + 1);
  const float s1 = net.fc1_scale;
  for (int r = 0; r < l2; ++r) {
    l1o[size_t(r)] = static_cast<int8_t>(clamp_i32(
        dense_row(&net.fc1_w[size_t(r) * l1], net.fc1_b[r], l1, s1), 0,
        127));
  }
  l1o[size_t(l2)] = static_cast<int8_t>(clamp_i32(
      dense_row(net.fc1_pad_w.data(), net.fc1_pad_b, l1, s1), 0, 127));
  const float l1c_out = static_cast<float>(l1o[size_t(l2)]) / s1;

  // factorization skip term: only output row l2 reaches the score
  // (upstream computes all l1 rows and reads [l2]; the others are dead)
  float l1f_out = 0.f;
  {
    int32_t a = net.l1_fact_b[size_t(l2)] +
                simd::dot_i16_i8(in.data(), &net.l1_fact_w[size_t(l2) * l1],
                                 l1);
    const int32_t c = clamp_i32(
        static_cast<int32_t>(static_cast<float>(a) / net.l1_fact_scale), 0,
        127);
    l1f_out = static_cast<float>(c) / net.l1_fact_scale;
  }

  // squared-clipped pairwise expansion: [clamp((x²·127)/128), x]
  std::vector<int16_t> expanded(static_cast<size_t>(l2) * 2);
  for (int i = 0; i < l2; ++i) {
    int32_t sq = static_cast<int32_t>(l1o[size_t(i)]) * l1o[size_t(i)];
    sq = (sq * 127) / 128;
    expanded[size_t(i)] = static_cast<int16_t>(clamp_i32(sq, 0, 127));
    expanded[size_t(i) + l2] = static_cast<int16_t>(l1o[size_t(i)]);
  }

  // L2 over the doubled input — the on-disk (l3, 2·l2) matrix at full
  // width (the single-score path honors the file; upstream zero-pads the
  // second half). Same SIMD-dispatch bias/division semantics as L1.
  std::vector<int8_t> l2o(static_cast<size_t>(l3));
  const float s2 = net.fc2_scale;
  for (int r = 0; r < l3; ++r) {
    int32_t a = net.fc2_b[r] * bias_lanes +
                simd::dot_i16_i8(expanded.data(),
                                 &net.fc2_full_w[size_t(r) * (size_t(l2) * 2)],
                                 l2 * 2);
    const int32_t d =
        bias_lanes == 1 ? static_cast<int32_t>(static_cast<float>(a) / s2)
                        : a / static_cast<int32_t>(s2);
    l2o[size_t(r)] = static_cast<int8_t>(clamp_i32(d, 0, 127));
  }

  // single output: row 0 of the output layer
  int32_t oacc = net.out_b[0];
  for (int j = 0; j < l3; ++j) {
    oacc += static_cast<int32_t>(l2o[size_t(j)]) *
            static_cast<int32_t>(net.out_w[size_t(j)]);
  }
  const float l3c = static_cast<float>(oacc) / net.out_scale;
  return l3c + l1f_out + l1c_out;
}

float nnue_evaluate_single(const NnueNet& net, const float* image, int h,
                           int w, int bias_lanes) {
  std::vector<int> features;
  nnue_extract_features(net, image, h, w, features);
  std::vector<int16_t> acc;
  nnue_refresh_accumulator(net, features, acc);
  return nnue_head_single(net, acc, bias_lanes);
}

NnueResult nnue_evaluate(const NnueNet& net, const float* image, int h,
                         int w) {
  NnueResult res;
  std::vector<int> features;
  nnue_extract_features(net, image, h, w, features);
  std::vector<int16_t> acc;
  nnue_refresh_accumulator(net, features, acc);
  res.logits = nnue_head(net, acc);
  res.active_count = static_cast<int>(features.size());
  res.density = net.num_features > 0
                    ? static_cast<float>(res.active_count) /
                          static_cast<float>(net.num_features)
                    : 0.f;
  return res;
}

}  // namespace nv
