// nv engine API walkthrough.
//
// Demonstrates: loading models, full-image evaluation, the split pipeline
// (feature extraction → accumulator → head), and chess-style incremental
// updates for video streams.
//
// Build: part of the normal cmake build (`ninja -C engine/build example_usage`)
// Run:   example_usage <model.nnue> [image.bin H W]

#include <cstdio>
#include <fstream>
#include <random>
#include <vector>

#include "../include/nv/model.h"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "Usage: %s <model.nnue> [image.bin H W]\n", argv[0]);
    return 1;
  }

  // 1. Load a model. Loaders throw std::runtime_error with a description
  //    on any format violation.
  nv::NnueNet net = nv::load_nnue_file(argv[1]);
  std::printf("model: %d features (grid %dx%dx%d), head %d-%d-%d-%d\n",
              net.num_features, net.grid, net.grid, net.conv_out_channels,
              net.l1, net.l2, net.l3, net.num_classes);

  // 2. Whole-image evaluation: float HWC image → logits + density.
  std::vector<float> image;
  int h = 32, w = 32;
  if (argc >= 5) {
    h = std::atoi(argv[3]);
    w = std::atoi(argv[4]);
    image.resize(size_t(h) * w * 3);
    std::ifstream f(argv[2], std::ios::binary);
    f.read(reinterpret_cast<char*>(image.data()),
           std::streamsize(image.size() * sizeof(float)));
  } else {
    image.resize(size_t(h) * w * 3);
    std::mt19937 rng(0);
    std::uniform_real_distribution<float> uni(0.f, 1.f);
    for (auto& px : image) px = uni(rng);
  }
  const nv::NnueResult res = nv::nnue_evaluate(net, image.data(), h, w);
  std::printf("logits:");
  for (float v : res.logits) std::printf(" %.4f", v);
  std::printf("\ndensity: %.4f (%d active features)\n", res.density,
              res.active_count);

  // 3. Split pipeline: useful when the caller wants the feature set.
  std::vector<int> features;
  nv::nnue_extract_features(net, image.data(), h, w, features);
  std::vector<int16_t> acc;
  nv::nnue_refresh_accumulator(net, features, acc);
  std::printf("head-only logit[0]: %.4f\n", nv::nnue_head(net, acc)[0]);

  // 4. Incremental updates (video): when few features change frame to
  //    frame, update the accumulator instead of refreshing it.
  if (!features.empty()) {
    std::vector<int> removed = {features[0]};
    std::vector<int> added = {(features[0] + 1) % net.num_features};
    nv::nnue_update_accumulator(net, added, removed, acc);
    std::printf("after 1-feature update, logit[0]: %.4f\n",
                nv::nnue_head(net, acc)[0]);
  }
  return 0;
}
