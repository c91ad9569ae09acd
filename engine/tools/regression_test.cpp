// Engine regression harness: deterministic evaluations on fixed feature
// sets + incremental-update consistency, with machine-readable RESULT_*
// lines (contract shared with the upstream harness).
//
// Usage: regression_test [model.nnue]

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "../include/nv/model.h"

using Clock = std::chrono::steady_clock;

int main(int argc, char** argv) {
  nv::NnueNet net;
  if (argc > 1) {
    try {
      net = nv::load_nnue_file(argv[1]);
    } catch (const std::exception& e) {
      std::fprintf(stderr, "load failed: %s\n", e.what());
      return 1;
    }
  } else {
    std::fprintf(stderr, "Usage: %s <model.nnue>\n", argv[0]);
    return 1;
  }

  std::mt19937 rng(123);
  std::uniform_int_distribution<int> fidx(0, net.num_features - 1);

  // Fixed feature-set evaluations.
  for (int i = 0; i < 4; ++i) {
    std::vector<int> features;
    for (int k = 0; k <= i * 17; ++k) features.push_back(fidx(rng));
    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, features, acc);
    const auto logits = nv::nnue_head(net, acc);
    std::printf("RESULT_FEATURESET_%d: %.10f\n", i, logits[0]);
  }

  // Empty / single / repeated feature sets.
  {
    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, {}, acc);
    std::printf("RESULT_EMPTY: %.10f\n", nv::nnue_head(net, acc)[0]);
    nv::nnue_refresh_accumulator(net, {0}, acc);
    std::printf("RESULT_SINGLE: %.10f\n", nv::nnue_head(net, acc)[0]);
    nv::nnue_refresh_accumulator(net, {5, 5, 5}, acc);
    std::printf("RESULT_REPEATED: %.10f\n", nv::nnue_head(net, acc)[0]);
  }

  // Incremental updates must equal full refreshes.
  {
    std::vector<int> cur;
    for (int k = 0; k < 50; ++k) cur.push_back(fidx(rng));
    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, cur, acc);
    bool consistent = true;
    for (int step = 0; step < 20; ++step) {
      std::vector<int> removed = {cur.front()};
      std::vector<int> added = {fidx(rng)};
      cur.erase(cur.begin());
      cur.push_back(added[0]);
      nv::nnue_update_accumulator(net, added, removed, acc);

      std::vector<int16_t> full;
      nv::nnue_refresh_accumulator(net, cur, full);
      if (full != acc) {
        consistent = false;
        break;
      }
      if (step < 3) {
        std::printf("RESULT_INCREMENTAL_%d: %.10f\n", step,
                    nv::nnue_head(net, acc)[0]);
      }
    }
    std::printf("INCREMENTAL_CONSISTENT:%d\n", consistent ? 1 : 0);
    if (!consistent) return 1;
  }

  // Throughput smoke: evaluations/second from a warm accumulator.
  {
    std::vector<int> features;
    for (int k = 0; k < 100; ++k) features.push_back(fidx(rng));
    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, features, acc);
    const int iters = 2000;
    auto t0 = Clock::now();
    volatile float sink = 0;
    for (int i = 0; i < iters; ++i) sink += nv::nnue_head(net, acc)[0];
    double us =
        std::chrono::duration<double, std::micro>(Clock::now() - t0).count() /
        iters;
    std::printf("HEAD_US_PER_EVAL:%.3f\n", us);
    std::printf("HEAD_EVALS_PER_SEC:%.0f\n", 1e6 / us);
  }
  return 0;
}
