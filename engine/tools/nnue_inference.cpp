// nnue_inference <model.nnue> <image.bin> <H> <W> [N]
//
// Contract-compatible with the upstream CLI: for a single image (N omitted
// or 1) prints one line "logit_0,...,logit_{C-1},density" at fixed 10 dp.
// Extension: when N > 1, <image.bin> holds N contiguous H*W*3 float32
// images and one line is printed per image — one process for a whole
// batch instead of the upstream's process-per-image hot loop.

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <vector>

#include "../include/nv/model.h"

int main(int argc, char** argv) {
  if (argc < 5) {
    std::cerr << "Usage: " << argv[0]
              << " <model.nnue> <image.bin> <H> <W> [N]\n";
    return 1;
  }
  const char* model_path = argv[1];
  const char* image_path = argv[2];
  const int h = std::atoi(argv[3]);
  const int w = std::atoi(argv[4]);
  const int n = argc > 5 ? std::atoi(argv[5]) : 1;
  if (h <= 0 || w <= 0 || n <= 0) {
    std::cerr << "invalid dimensions\n";
    return 1;
  }

  std::vector<float> images(size_t(n) * h * w * 3);
  {
    std::ifstream f(image_path, std::ios::binary);
    if (!f.is_open()) {
      std::cerr << "cannot open image file: " << image_path << "\n";
      return 1;
    }
    f.read(reinterpret_cast<char*>(images.data()),
           std::streamsize(images.size() * sizeof(float)));
    if (!f) {
      std::cerr << "failed to read " << images.size() << " floats\n";
      return 1;
    }
  }

  try {
    const nv::NnueNet net = nv::load_nnue_file(model_path);
    std::string line;
    for (int i = 0; i < n; ++i) {
      const nv::NnueResult res =
          nv::nnue_evaluate(net, &images[size_t(i) * h * w * 3], h, w);
      line.clear();
      char buf[48];
      for (float v : res.logits) {
        std::snprintf(buf, sizeof(buf), "%.10f,", v);
        line += buf;
      }
      std::snprintf(buf, sizeof(buf), "%.10f", res.density);
      line += buf;
      std::puts(line.c_str());
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
