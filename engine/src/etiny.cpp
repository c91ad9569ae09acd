// EtinyNet .etiny v1 loader + int8 evaluator.
//
// Same arithmetic as the JAX sim (nnue_vision_tpu/ops/engine_sim.py):
//   stem conv: like the NNUE conv frontend, fixed stride 2
//   pw-expand: clamp(acc/scale, 0, 6)       (ReLU6 in the int domain)
//   depthwise 3x3: clamp(acc/scale, 0, 6)
//   pw-project: clamp(acc/scale, ±127), no bias
//   dense-tagged blocks: spatial dims are treated as preserved — the real
//     output is flat-placed into a zero buffer of the input's spatial size
//     (upstream-engine behavior kept for file interchangeability; our
//     serializer only emits the dense tag for stride-1 blocks, where this
//     is an identity)
//   global average pool: truncating int mean, clamp ±127
//   classifier: float logits acc/scale

#include <algorithm>
#include <cstring>
#include <fstream>

#include "../include/nv/ints.h"
#include "../include/nv/model.h"
#include "../include/nv/simd.h"
#include "io_util.h"

namespace nv {

namespace {

void read_conv_payload_e(std::istream& in, float& scale, int& out_channels,
                         std::vector<int8_t>& w, std::vector<int32_t>& b) {
  expect(read_u32(in, "conv tag") == 0, "conv inner tag must be 0");
  scale = read_f32(in, "conv scale");
  const uint32_t oc = read_u32(in), ic = read_u32(in);
  const uint32_t kh = read_u32(in), kw = read_u32(in);
  expect(ic == 3 && kh == 3 && kw == 3, "stem conv must be 3-channel 3x3");
  out_channels = static_cast<int>(oc);
  w = read_vec<int8_t>(in, size_t(oc) * 27, "stem weights");
  expect(read_u32(in) == oc, "stem bias count mismatch");
  b = read_vec<int32_t>(in, oc, "stem biases");
}

}  // namespace

EtinyNet load_etiny(std::istream& in) {
  EtinyNet net;
  char magic[4];
  read_exact(in, magic, 4, "magic");
  expect(std::memcmp(magic, "ETNY", 4) == 0, "bad .etiny magic");
  expect(read_u32(in, "version") == 1, "unsupported .etiny version");

  const uint32_t vlen = read_u32(in, "variant len");
  expect(vlen <= 64, "variant string too long");
  std::vector<char> vbuf(vlen);
  read_exact(in, vbuf.data(), vlen, "variant");
  net.variant.assign(vbuf.begin(), vbuf.end());

  net.num_classes = static_cast<int>(read_u32(in));
  net.input_size = static_cast<int>(read_u32(in));
  net.conv_channels = static_cast<int>(read_u32(in));
  net.final_channels = static_cast<int>(read_u32(in));
  char asq = 0;
  read_exact(in, &asq, 1, "use_asq");
  net.use_asq = asq != 0;
  if (net.use_asq) {
    net.asq_bits = static_cast<int>(read_u32(in));
    net.lambda_param = read_f32(in);
  }

  const uint32_t total = read_u32(in, "layer count");
  bool have_classifier = false;
  for (uint32_t i = 0; i < total; ++i) {
    const uint32_t tag = read_u32(in, "layer tag");
    if (tag == 0) {
      read_conv_payload_e(in, net.stem_scale, net.stem_out_channels,
                          net.stem_w, net.stem_b);
      net.stem_w_t.resize(net.stem_w.size());
      transpose_i8(net.stem_w.data(), net.stem_out_channels, 27,
                   net.stem_w_t.data());
    } else if (tag == 1 || tag == 2) {
      EtinyBlock blk;
      blk.dense = (tag == 2);
      blk.s_expand = read_f32(in);
      blk.s_dw = read_f32(in);
      blk.s_project = read_f32(in);
      blk.in_c = static_cast<int>(read_u32(in));
      blk.mid_c = static_cast<int>(read_u32(in));
      blk.out_c = static_cast<int>(read_u32(in));
      blk.stride = static_cast<int>(read_u32(in));
      blk.pw_expand =
          read_vec<int8_t>(in, size_t(blk.mid_c) * blk.in_c, "pw_expand");
      expect(read_u32(in) == uint32_t(blk.mid_c), "pw_expand bias count");
      blk.pw_expand_b = read_vec<int32_t>(in, blk.mid_c, "pw_expand bias");
      blk.dw = read_vec<int8_t>(in, size_t(blk.mid_c) * 9, "dw weights");
      blk.dw_t.resize(blk.dw.size());
      transpose_i8(blk.dw.data(), blk.mid_c, 9, blk.dw_t.data());
      blk.pw_expand_t.resize(blk.pw_expand.size());
      transpose_i8(blk.pw_expand.data(), blk.mid_c, blk.in_c,
                   blk.pw_expand_t.data());
      blk.pw_project =
          read_vec<int8_t>(in, size_t(blk.out_c) * blk.mid_c, "pw_project");
      blk.pw_project_t.resize(blk.pw_project.size());
      transpose_i8(blk.pw_project.data(), blk.out_c, blk.mid_c,
                   blk.pw_project_t.data());
      expect(read_u32(in) == uint32_t(blk.out_c), "pw_project bias count");
      in.seekg(std::streamoff(blk.out_c) * 4, std::ios::cur);  // zero biases
      net.blocks.push_back(std::move(blk));
    } else if (tag == 3) {
      net.cls_scale = read_f32(in);
      net.cls_in = static_cast<int>(read_u32(in));
      const int out = static_cast<int>(read_u32(in));
      expect(out == net.num_classes, "classifier rows != num_classes");
      net.cls_w = read_vec<int8_t>(in, size_t(out) * net.cls_in, "cls w");
      expect(read_u32(in) == uint32_t(out), "cls bias count");
      net.cls_b = read_vec<int32_t>(in, out, "cls b");
      have_classifier = true;
    } else {
      fail("unknown .etiny layer tag " + std::to_string(tag));
    }
  }
  expect(net.stem_out_channels > 0, "missing stem conv");
  expect(have_classifier, "missing classifier");
  return net;
}

EtinyNet load_etiny_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  expect(f.is_open(), "cannot open " + path);
  return load_etiny(f);
}

std::vector<float> etiny_evaluate(const EtinyNet& net, const float* image,
                                  int h, int w) {
  // Stem conv (stride 2, padding 1) straight from the float image.
  const int C0 = net.stem_out_channels;
  int oh = (h + 2 - 3) / 2 + 1, ow = (w + 2 - 3) / 2 + 1;
  std::vector<int8_t> cur(size_t(oh) * ow * C0);
  {
    const float scale = net.stem_scale;
    const int32_t iscale = static_cast<int32_t>(scale);
    // One-pass input quantization + tap-major kernel transpose so each
    // quantized value broadcasts against a contiguous row of output
    // channels (see nnue.cpp conv_frontend — same reorder, bit-exact).
    std::vector<int32_t> qin(size_t(h) * w * 3);
    for (size_t i = 0; i < qin.size(); ++i)
      qin[i] = quant_input(image[i], scale);
    std::vector<int8_t> wt_local;
    const int8_t* wt = net.stem_w_t.data();
    if (net.stem_w_t.size() != net.stem_w.size()) {
      wt_local.resize(net.stem_w.size());
      transpose_i8(net.stem_w.data(), C0, 27, wt_local.data());
      wt = wt_local.data();
    }
    std::vector<int32_t> acc(C0);
    for (int y = 0; y < oh; ++y) {
      for (int x = 0; x < ow; ++x) {
        const int by = y * 2 - 1, bx = x * 2 - 1;
        std::copy(net.stem_b.begin(), net.stem_b.end(), acc.begin());
        for (int ky = 0; ky < 3; ++ky) {
          const int iy = by + ky;
          if (iy < 0 || iy >= h) continue;
          for (int kx = 0; kx < 3; ++kx) {
            const int ix = bx + kx;
            if (ix < 0 || ix >= w) continue;
            const int32_t* qpx = &qin[(size_t(iy) * w + ix) * 3];
            const int8_t* wk = wt + size_t((ky * 3 + kx) * 3) * C0;
            for (int ci = 0; ci < 3; ++ci) {
              if (qpx[ci] != 0)
                simd::madd_scalar_wide_i8(acc.data(), qpx[ci],
                                          wk + size_t(ci) * C0, C0);
            }
          }
        }
        int8_t* out = &cur[(size_t(y) * ow + x) * C0];
        for (int oc = 0; oc < C0; ++oc) out[oc] = sat_i8(tdiv(acc[oc], iscale));
      }
    }
  }
  int ch = oh, cw = ow, cc = C0;

  std::vector<int8_t> expand, dwout, next;
  for (const auto& blk : net.blocks) {
    // pw-expand + ReLU6 over (ch, cw): broadcast each input channel
    // against the input-major weight row (vector lanes = mid channels;
    // per-output dots would run scalar at these widths).
    expand.assign(size_t(ch) * cw * blk.mid_c, 0);
    {
      const int32_t s = static_cast<int32_t>(blk.s_expand);
      std::vector<int8_t> pet_local;
      const int8_t* pet = blk.pw_expand_t.data();
      if (blk.pw_expand_t.size() != blk.pw_expand.size()) {
        // hand-built nets (tests/embedders) may lack the loader transpose
        pet_local.resize(blk.pw_expand.size());
        transpose_i8(blk.pw_expand.data(), blk.mid_c, blk.in_c,
                     pet_local.data());
        pet = pet_local.data();
      }
      std::vector<int32_t> acc(blk.mid_c);
      for (int p = 0; p < ch * cw; ++p) {
        const int8_t* px = &cur[size_t(p) * cc];
        int8_t* out = &expand[size_t(p) * blk.mid_c];
        std::copy(blk.pw_expand_b.begin(), blk.pw_expand_b.end(),
                  acc.begin());
        for (int c = 0; c < blk.in_c; ++c) {
          if (px[c] != 0)
            simd::madd_scalar_i8(acc.data(), px[c],
                                 pet + size_t(c) * blk.mid_c, blk.mid_c);
        }
        for (int m = 0; m < blk.mid_c; ++m)
          out[m] = static_cast<int8_t>(clamp_i32(tdiv(acc[m], s), 0, 6));
      }
    }
    // depthwise 3x3 + ReLU6 — taps outer, channels inner: for a fixed
    // tap both the input pixel and the tap-major kernel row (dw_t) are
    // channel-contiguous, so the accumulate is one vector madd per tap.
    const int dh = (ch - 3 + 2) / blk.stride + 1;
    const int dw_ = (cw - 3 + 2) / blk.stride + 1;
    dwout.assign(size_t(dh) * dw_ * blk.mid_c, 0);
    {
      const int32_t s = static_cast<int32_t>(blk.s_dw);
      // Hand-built nets (tests, embedders) may lack the loader's
      // tap-major transpose; build it here when absent.
      std::vector<int8_t> dwt_local;
      const int8_t* dwt = blk.dw_t.data();
      if (blk.dw_t.size() != blk.dw.size()) {
        dwt_local.resize(blk.dw.size());
        transpose_i8(blk.dw.data(), blk.mid_c, 9, dwt_local.data());
        dwt = dwt_local.data();
      }
      std::vector<int32_t> acc(blk.mid_c);
      for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw_; ++x) {
          std::fill(acc.begin(), acc.end(), 0);
          for (int ky = 0; ky < 3; ++ky) {
            const int iy = y * blk.stride + ky - 1;
            if (iy < 0 || iy >= ch) continue;
            for (int kx = 0; kx < 3; ++kx) {
              const int ix = x * blk.stride + kx - 1;
              if (ix < 0 || ix >= cw) continue;
              simd::madd_i8_i8(
                  acc.data(), &expand[(size_t(iy) * cw + ix) * blk.mid_c],
                  dwt + size_t(ky * 3 + kx) * blk.mid_c, blk.mid_c);
            }
          }
          int8_t* out = &dwout[(size_t(y) * dw_ + x) * blk.mid_c];
          for (int m = 0; m < blk.mid_c; ++m)
            out[m] = static_cast<int8_t>(clamp_i32(tdiv(acc[m], s), 0, 6));
        }
      }
    }
    // pw-project (no bias, no activation)
    const bool preserve = blk.dense;  // dense tag: dims treated as unchanged
    const int nh = preserve ? ch : dh, nw = preserve ? cw : dw_;
    next.assign(size_t(nh) * nw * blk.out_c, 0);
    {
      const int32_t s = static_cast<int32_t>(blk.s_project);
      std::vector<int8_t> ppt_local;
      const int8_t* ppt = blk.pw_project_t.data();
      if (blk.pw_project_t.size() != blk.pw_project.size()) {
        ppt_local.resize(blk.pw_project.size());
        transpose_i8(blk.pw_project.data(), blk.out_c, blk.mid_c,
                     ppt_local.data());
        ppt = ppt_local.data();
      }
      std::vector<int32_t> acc(blk.out_c);
      for (int p = 0; p < dh * dw_; ++p) {
        // dwout is ReLU6 output (0..6): sparse-ish and tiny-valued —
        // broadcast each nonzero activation against the mid-major weight
        // row (vector lanes = out channels; see pw-expand note).
        const int8_t* px = &dwout[size_t(p) * blk.mid_c];
        int8_t* out = &next[size_t(p) * blk.out_c];  // flat placement
        std::fill(acc.begin(), acc.end(), 0);
        for (int m = 0; m < blk.mid_c; ++m) {
          if (px[m] != 0)
            simd::madd_scalar_i8(acc.data(), px[m],
                                 ppt + size_t(m) * blk.out_c, blk.out_c);
        }
        for (int o = 0; o < blk.out_c; ++o) out[o] = sat_i8(tdiv(acc[o], s));
      }
    }
    cur.swap(next);
    ch = nh;
    cw = nw;
    cc = blk.out_c;
  }

  // global average pool (truncating int mean) + classifier
  std::vector<int8_t> pooled(cc);
  const int hw = ch * cw;
  for (int c = 0; c < cc; ++c) {
    int32_t sum = 0;
    for (int p = 0; p < hw; ++p) sum += cur[size_t(p) * cc + c];
    pooled[c] = sat_i8(tdiv(sum, hw));
  }
  std::vector<float> logits(net.num_classes);
  const int cls_n = net.cls_in < cc ? net.cls_in : cc;
  for (int c = 0; c < net.num_classes; ++c) {
    const int32_t acc =
        net.cls_b[c] + simd::dot_i8_i8(pooled.data(),
                                       &net.cls_w[size_t(c) * net.cls_in],
                                       cls_n);
    logits[c] = static_cast<float>(acc) / net.cls_scale;
  }
  return logits;
}

}  // namespace nv
