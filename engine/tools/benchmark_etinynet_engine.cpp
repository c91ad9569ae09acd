// EtinyNet engine benchmark: random-image latency over N iterations.
// Prints avg/min/max and a machine-readable "RESULT_AVG_MS:<ms>" line
// (contract shared with the upstream harness).
//
// Usage: benchmark_etinynet_engine <model.etiny> [iters] [H] [W]

#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

#include "../include/nv/model.h"
#include "../include/nv/simd.h"

using Clock = std::chrono::steady_clock;

int main(int argc, char** argv) {
  std::printf("SIMD_BACKEND:%s\n", nv::simd::backend());
  if (argc < 2) {
    std::fprintf(stderr,
                 "Usage: %s <model.etiny> [iters] [H] [W]\n", argv[0]);
    return 1;
  }
  nv::EtinyNet net;
  try {
    net = nv::load_etiny_file(argv[1]);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "load failed: %s\n", e.what());
    return 1;
  }
  const int iters = argc > 2 ? std::atoi(argv[2]) : 1000;
  const int h = argc > 3 ? std::atoi(argv[3]) : net.input_size;
  const int w = argc > 4 ? std::atoi(argv[4]) : h;

  std::mt19937 rng(42);
  std::uniform_real_distribution<float> uni(0.f, 1.f);
  std::vector<float> image(size_t(h) * w * 3);

  double total = 0, mn = 1e30, mx = 0;
  for (int i = 0; i < iters; ++i) {
    for (auto& px : image) px = uni(rng);
    auto t0 = Clock::now();
    volatile float sink = nv::etiny_evaluate(net, image.data(), h, w)[0];
    (void)sink;
    double dt =
        std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
    total += dt;
    mn = std::min(mn, dt);
    mx = std::max(mx, dt);
  }
  std::printf("iters=%d avg=%.4f ms min=%.4f max=%.4f\n", iters, total / iters,
              mn, mx);
  std::printf("RESULT_AVG_MS:%.6f\n", total / iters);
  return 0;
}
