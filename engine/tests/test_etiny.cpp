// C++ unit tests for the EtinyNet engine path (registered with CTest).
//
// Block-level arithmetic is checked against HAND-COMPUTED integer values
// (upstream's C++ suite mostly asserted "forward pass ran"; here every
// stage — stem quant/conv, pw-expand ReLU6, depthwise, pw-project,
// dense-tag dim preservation, truncating GAP, classifier scaling — has an
// exact expected number). Loader validation covers the rejection paths
// the corruption fuzzer exercises randomly.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <sstream>
#include <string>
#include <vector>

#include "../include/nv/ints.h"
#include "../include/nv/model.h"

static int failures = 0;
#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);       \
      ++failures;                                                       \
    }                                                                   \
  } while (0)

namespace {

nv::EtinyBlock make_block(bool dense, int in_c, int mid_c, int out_c,
                          int stride, int8_t pw_e, int8_t dw, int8_t pw_p,
                          float s_e, float s_d, float s_p) {
  nv::EtinyBlock b;
  b.dense = dense;
  b.in_c = in_c; b.mid_c = mid_c; b.out_c = out_c; b.stride = stride;
  b.s_expand = s_e; b.s_dw = s_d; b.s_project = s_p;
  b.pw_expand.assign(size_t(mid_c) * in_c, pw_e);
  b.pw_expand_b.assign(mid_c, 0);
  b.dw.assign(size_t(mid_c) * 9, dw);
  b.pw_project.assign(size_t(out_c) * mid_c, pw_p);
  return b;
}

// Minimal net: 1-channel stem (all-ones weights, zero bias), one LB block,
// 2-class classifier.
nv::EtinyNet tiny_net() {
  nv::EtinyNet net;
  net.variant = "micro";
  net.num_classes = 2;
  net.input_size = 2;
  net.conv_channels = 1;
  net.final_channels = 1;
  net.stem_scale = 64.f;
  net.stem_out_channels = 1;
  net.stem_w.assign(27, 1);
  net.stem_b.assign(1, 0);
  net.blocks.push_back(make_block(false, 1, 1, 1, 1, 2, 1, 10, 4.f, 2.f, 2.f));
  net.cls_scale = 4.f;
  net.cls_in = 1;
  net.cls_w = {1, -2};
  net.cls_b = {100, -100};
  return net;
}

void test_exact_pipeline_arithmetic() {
  // 2×2 image, every channel value 1.0 → quant_input(1.0, 64) = 64.
  // stem (stride 2, pad 1): one output pixel, 4 valid taps × 3 ch × 64
  //   = acc 768 → tdiv(768,64) = 12.
  // pw-expand: 12·2 = 24 → tdiv(24,4) = 6 → ReLU6 keeps 6.
  // depthwise on 1×1: center tap only → 6·1 = 6 → tdiv(6,2) = 3.
  // pw-project: 3·10 = 30 → tdiv(30,2) = 15.
  // GAP over 1 px: 15. classifier: (100 + 15·1)/4, (−100 + 15·−2)/4.
  nv::EtinyNet net = tiny_net();
  std::vector<float> img(2 * 2 * 3, 1.0f);
  const auto logits = nv::etiny_evaluate(net, img.data(), 2, 2);
  CHECK(logits.size() == 2);
  CHECK(logits[0] == 28.75f);
  CHECK(logits[1] == -32.5f);
}

void test_relu6_clamps_expand_stage() {
  // Bigger expand product: 12·8 = 96 → tdiv(96,4) = 24 → clamped to 6;
  // identical final logits to the pw_e=2 case (which already hits 6).
  nv::EtinyNet net = tiny_net();
  nv::EtinyNet hot = tiny_net();
  hot.blocks[0].pw_expand.assign(1, 8);
  std::vector<float> img(2 * 2 * 3, 1.0f);
  CHECK(nv::etiny_evaluate(hot, img.data(), 2, 2) ==
        nv::etiny_evaluate(net, img.data(), 2, 2));
}

void test_project_saturates_to_int8() {
  // project acc = 3·127 = 381 → tdiv(381,1) = 381 → sat_i8 = 127.
  nv::EtinyNet net = tiny_net();
  net.blocks[0].pw_project.assign(1, 127);
  net.blocks[0].s_project = 1.f;
  std::vector<float> img(2 * 2 * 3, 1.0f);
  const auto logits = nv::etiny_evaluate(net, img.data(), 2, 2);
  CHECK(logits[0] == (100 + 127) / 4.f);
  CHECK(logits[1] == (-100 - 2 * 127) / 4.f);
}

void test_dense_tag_preserves_spatial_dims() {
  // 4×4 input → stem 2×2. A stride-2 DENSE block computes one real output
  // pixel but keeps the 2×2 dims: flat placement at p=0, three zero
  // pixels. GAP then divides by 4 (the upstream-engine quirk kept for
  // interchangeability; engine_sim.py:467-480 reproduces it on TPU).
  nv::EtinyNet net = tiny_net();
  net.input_size = 4;
  net.blocks[0] = make_block(true, 1, 1, 1, 2, 2, 1, 10, 4.f, 2.f, 2.f);
  std::vector<float> img(4 * 4 * 3, 1.0f);
  const auto dense_logits = nv::etiny_evaluate(net, img.data(), 4, 4);

  // Non-dense twin: same weights, spatial collapses to 1×1 → GAP over the
  // single real pixel. The dense version's pooled value must be exactly
  // tdiv(real_pixel, 4) of the non-dense pooled value's pre-classifier
  // input; recover both through the affine classifier.
  net.blocks[0].dense = false;
  const auto slim_logits = nv::etiny_evaluate(net, img.data(), 4, 4);
  // pooled_slim = p, pooled_dense = tdiv(p, 4)
  const float p_slim = slim_logits[0] * 4.f - 100.f;   // = p·1
  const float p_dense = dense_logits[0] * 4.f - 100.f;
  CHECK(p_dense == float(int32_t(p_slim) / 4));
  CHECK(p_slim != p_dense);  // quirk is observable, not a no-op
}

void test_stride2_nondense_halves_dims() {
  // 4×4 input → stem 2×2 → stride-2 non-dense block → 1×1: exactly the
  // slim case above; sanity-check the spatial math end to end.
  nv::EtinyNet net = tiny_net();
  net.input_size = 4;
  net.blocks[0] = make_block(false, 1, 1, 1, 2, 2, 1, 10, 4.f, 2.f, 2.f);
  std::vector<float> img(4 * 4 * 3, 1.0f);
  const auto logits = nv::etiny_evaluate(net, img.data(), 4, 4);
  for (float v : logits) CHECK(std::isfinite(v));
}

void test_gap_truncates_toward_zero() {
  // Two-block-free check of the pooled mean: make the projected map carry
  // negative values: pw_project = −10 → pixel −15; GAP over 1 px = −15;
  // classifier row −2 → (−100 + 30)/4.
  nv::EtinyNet net = tiny_net();
  net.blocks[0].pw_project.assign(1, -10);
  std::vector<float> img(2 * 2 * 3, 1.0f);
  const auto logits = nv::etiny_evaluate(net, img.data(), 2, 2);
  CHECK(logits[0] == (100 - 15) / 4.f);
  CHECK(logits[1] == (-100 + 30) / 4.f);
}

// ------------------------------------------------------------ loader tests

std::string tiny_etiny_bytes(bool with_classifier = true,
                             uint32_t bad_tag = 0xffffffffu) {
  std::ostringstream out;
  auto u32 = [&](uint32_t v) { out.write(reinterpret_cast<char*>(&v), 4); };
  auto f32 = [&](float v) { out.write(reinterpret_cast<char*>(&v), 4); };
  out.write("ETNY", 4);
  u32(1);
  u32(5); out.write("micro", 5);
  u32(2);   // classes
  u32(8);   // input size
  u32(4);   // conv channels
  u32(4);   // final channels
  out.put(0);  // no asq
  u32(with_classifier ? 3u : 2u);  // layer count
  // stem: outer layer tag 0, then the conv payload's inner tag 0
  u32(0); u32(0); f32(64.f);
  u32(4); u32(3); u32(3); u32(3);
  for (int i = 0; i < 4 * 27; ++i) out.put(char(i % 5 - 2));
  u32(4);
  for (int i = 0; i < 4; ++i) u32(i);
  // one LB block
  uint32_t tag = bad_tag == 0xffffffffu ? 1u : bad_tag;
  u32(tag); f32(4.f); f32(2.f); f32(2.f);
  u32(4); u32(4); u32(4); u32(1);
  for (int i = 0; i < 16; ++i) out.put(char(i % 3 - 1));
  u32(4);
  for (int i = 0; i < 4; ++i) u32(0);
  for (int i = 0; i < 36; ++i) out.put(char(1));
  for (int i = 0; i < 16; ++i) out.put(char(2));
  u32(4);
  for (int i = 0; i < 4; ++i) u32(0);
  if (with_classifier) {
    u32(3); f32(4.f);
    u32(4); u32(2);
    for (int i = 0; i < 8; ++i) out.put(char(1));
    u32(2); u32(100); u32(uint32_t(-100));
  }
  return out.str();
}

bool load_throws(const std::string& bytes) {
  std::istringstream in(bytes);
  try {
    nv::load_etiny(in);
  } catch (const std::exception&) {
    return true;
  }
  return false;
}

void test_loader_fields() {
  std::istringstream in(tiny_etiny_bytes());
  nv::EtinyNet net = nv::load_etiny(in);
  CHECK(net.variant == "micro");
  CHECK(net.num_classes == 2);
  CHECK(net.input_size == 8);
  CHECK(net.stem_out_channels == 4);
  CHECK(net.blocks.size() == 1);
  CHECK(!net.blocks[0].dense);
  CHECK(net.blocks[0].stride == 1);
  CHECK(net.cls_in == 4);
  CHECK(net.cls_b[0] == 100 && net.cls_b[1] == -100);

  // loaded net evaluates deterministically
  std::vector<float> img(8 * 8 * 3, 0.5f);
  CHECK(nv::etiny_evaluate(net, img.data(), 8, 8) ==
        nv::etiny_evaluate(net, img.data(), 8, 8));
}

void test_loader_rejections() {
  CHECK(load_throws(std::string("XXXX") + std::string(64, '\0')));  // magic
  const std::string good = tiny_etiny_bytes();
  CHECK(!load_throws(good));
  CHECK(load_throws(good.substr(0, good.size() / 2)));   // truncated
  CHECK(load_throws(good.substr(0, 37)));                // mid-header cut
  CHECK(load_throws(tiny_etiny_bytes(false)));           // no classifier
  CHECK(load_throws(tiny_etiny_bytes(true, 9)));         // unknown tag
  std::string bad_version = good;
  bad_version[4] = 9;                                    // version 9
  CHECK(load_throws(bad_version));
}

}  // namespace

int main() {
  test_exact_pipeline_arithmetic();
  test_relu6_clamps_expand_stage();
  test_project_saturates_to_int8();
  test_dense_tag_preserves_spatial_dims();
  test_stride2_nondense_halves_dims();
  test_gap_truncates_toward_zero();
  test_loader_fields();
  test_loader_rejections();
  if (failures == 0) std::printf("ALL ETINY TESTS PASSED\n");
  return failures == 0 ? 0 : 1;
}
