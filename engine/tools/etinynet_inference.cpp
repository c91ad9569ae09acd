// etinynet_inference <model.etiny> <image.bin> <H> <W> [N]
//
// Contract-compatible with the upstream CLI: prints "RESULT_<i>: <value>"
// lines at fixed 10 dp. Batch extension: with N > 1 the image file holds N
// contiguous images; a line "IMAGE <k>" precedes each image's results.

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <vector>

#include "../include/nv/model.h"

int main(int argc, char** argv) {
  if (argc < 5) {
    std::cerr << "Usage: " << argv[0]
              << " <model.etiny> <image.bin> <H> <W> [N]\n";
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
    const nv::EtinyNet net = nv::load_etiny_file(model_path);
    for (int i = 0; i < n; ++i) {
      if (n > 1) std::printf("IMAGE %d\n", i);
      const std::vector<float> logits =
          nv::etiny_evaluate(net, &images[size_t(i) * h * w * 3], h, w);
      for (size_t c = 0; c < logits.size(); ++c) {
        std::printf("RESULT_%zu: %.10f\n", c, logits[c]);
      }
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
