// C++ unit tests for the nv engine (registered with CTest).
//
// Covers the same ground as the upstream C++ suites (loader validation,
// conv arithmetic, feature transformer + incremental updates, head
// arithmetic, full evaluator round trip) using a tiny assert framework.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
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

// Serialize a minimal valid .nnue v2 stream for loader tests.
std::string tiny_nnue_bytes() {
  std::ostringstream out;
  auto u32 = [&](uint32_t v) { out.write(reinterpret_cast<char*>(&v), 4); };
  auto f32 = [&](float v) { out.write(reinterpret_cast<char*>(&v), 4); };
  const int grid = 2, ch = 2, F = grid * grid * ch;
  const int l1 = 4, l2 = 2, l3 = 2, classes = 3;
  out.write("NNUE", 4);
  u32(2);
  u32(F); u32(l1); u32(l2); u32(l3); u32(1);
  f32(600.f); f32(127.f); f32(0.5f);
  // conv payload
  u32(0); f32(64.f);
  u32(ch); u32(3); u32(3); u32(3);
  for (int i = 0; i < ch * 27; ++i) out.put(char(i % 5 - 2));
  u32(ch);
  for (int i = 0; i < ch; ++i) u32(0);
  // feature transformer
  f32(64.f); u32(F); u32(l1);
  for (int i = 0; i < F * l1; ++i) {
    int16_t w = int16_t(i % 7 - 3);
    out.write(reinterpret_cast<char*>(&w), 2);
  }
  u32(l1);
  for (int i = 0; i < l1; ++i) u32(10);
  // layer stack
  f32(64.f); f32(64.f); f32(64.f); f32(64.f);
  u32(l2 + 1); u32(l1);
  for (int i = 0; i < (l2 + 1) * l1; ++i) out.put(char(i % 3 - 1));
  u32(l2 + 1);
  for (int i = 0; i < l2 + 1; ++i) u32(5);
  u32(l1); u32(l1);
  for (int r = 0; r < l1; ++r)
    for (int c = 0; c < l1; ++c) out.put(char(r == c ? 127 : 0));
  u32(l1);
  for (int i = 0; i < l1; ++i) u32(0);
  u32(l3); u32(2 * l2);
  for (int i = 0; i < l3 * 2 * l2; ++i) out.put(char(i % 3 - 1));
  u32(l3);
  for (int i = 0; i < l3; ++i) u32(1);
  u32(classes); u32(l3);
  for (int i = 0; i < classes * l3; ++i) out.put(char(i % 3 - 1));
  u32(classes);
  for (int i = 0; i < classes; ++i) u32(2);
  return out.str();
}

void test_ints() {
  CHECK(nv::tdiv(130, 64) == 2);
  CHECK(nv::tdiv(-130, 64) == -2);  // toward zero, not floor
  CHECK(nv::tdiv(-63, 64) == 0);
  CHECK(nv::sat_i8(300) == 127);
  CHECK(nv::sat_i8(-300) == -127);
  CHECK(nv::quant_input(1.999f, 64.f) == 127);   // truncation
  CHECK(nv::quant_input(-1.999f, 64.f) == -127);
}

void test_stride_rule() {
  CHECK(nv::nnue_conv_stride(32, 10) == 4);
  CHECK(nv::nnue_conv_stride(16, 4) == 5);
  CHECK(nv::nnue_conv_stride(8, 8) == 1);
  CHECK(nv::nnue_conv_stride(5, 1) == 5);
}

void test_loader_and_eval() {
  const std::string bytes = tiny_nnue_bytes();
  std::istringstream in(bytes);
  nv::NnueNet net = nv::load_nnue(in);
  CHECK(net.grid == 2);
  CHECK(net.num_features == 8);
  CHECK(net.l1 == 4 && net.l2 == 2 && net.l3 == 2);
  CHECK(net.num_classes == 3);
  CHECK(net.visual_threshold == 0.5f);
  CHECK(net.fc1_w.size() == size_t(net.l2) * net.l1);   // pad row stripped
  CHECK(net.fc2_w.size() == size_t(net.l3) * net.l2);   // doubled half stripped

  // full evaluation is deterministic + densities sane
  std::vector<float> img(6 * 6 * 3);
  for (size_t i = 0; i < img.size(); ++i) img[i] = float(i % 7) / 7.f;
  const auto r1 = nv::nnue_evaluate(net, img.data(), 6, 6);
  const auto r2 = nv::nnue_evaluate(net, img.data(), 6, 6);
  CHECK(r1.logits.size() == 3);
  CHECK(r1.logits == r2.logits);
  CHECK(r1.density >= 0.f && r1.density <= 1.f);
  CHECK(r1.active_count >= 0 && r1.active_count <= net.num_features);
}

void test_bad_magic_rejected() {
  std::istringstream in(std::string("XXXX") + std::string(64, '\0'));
  bool threw = false;
  try {
    nv::load_nnue(in);
  } catch (const std::exception&) {
    threw = true;
  }
  CHECK(threw);
}

void test_incremental_matches_refresh() {
  std::istringstream in(tiny_nnue_bytes());
  nv::NnueNet net = nv::load_nnue(in);

  std::vector<int> features = {0, 2, 5};
  std::vector<int16_t> acc;
  nv::nnue_refresh_accumulator(net, features, acc);

  // add 7, remove 2
  nv::nnue_update_accumulator(net, {7}, {2}, acc);
  std::vector<int16_t> full;
  nv::nnue_refresh_accumulator(net, {0, 5, 7}, full);
  CHECK(acc == full);

  // head on both is identical
  CHECK(nv::nnue_head(net, acc) == nv::nnue_head(net, full));
}

void test_head_arithmetic() {
  // hand-built minimal head: verify pairwise (a*b)/128 clamp semantics
  std::istringstream in(tiny_nnue_bytes());
  nv::NnueNet net = nv::load_nnue(in);
  std::vector<int16_t> acc(net.l1);
  acc[0] = 100; acc[1] = 50;   // first half
  acc[2] = 100; acc[3] = -20;  // second half
  // after clip: a=[100,50], b=[100,0]; pairwise=[min(127,78),0,100,50]
  const auto logits = nv::nnue_head(net, acc);
  CHECK(logits.size() == 3);
  for (float v : logits) CHECK(std::isfinite(v));
}

}  // namespace

int main() {
  test_ints();
  test_stride_rule();
  test_loader_and_eval();
  test_bad_magic_rejected();
  test_incremental_matches_refresh();
  test_head_arithmetic();
  if (failures == 0) std::printf("ALL ENGINE TESTS PASSED\n");
  return failures == 0 ? 0 : 1;
}
