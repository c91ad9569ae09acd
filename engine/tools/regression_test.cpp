// Engine regression harness: deterministic evaluations on fixed feature
// sets + incremental-update consistency, with machine-readable RESULT_*
// lines (contract shared with the upstream harness).
//
// Usage: regression_test <model.nnue> [feature1 feature2 ...]
//
// When feature indices are given, also prints the upstream
// regression_test's exact line set from the chess-legacy SINGLE-SCORE
// path (RESULT_CHESS_INCREMENTAL_0 / _IMAGE_0 / _EMPTY / _SINGLE /
// _REPEATED — same values as the upstream binary's RESULT_INCREMENTAL_0
// etc. on the same model file and arguments; the CHESS_ prefix keeps
// them distinct from this harness's own multiclass lines).

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

  // Chess-legacy single-score parity block (upstream regression_test
  // semantics, deterministic given argv — see header comment).
  if (argc > 2) {
    std::vector<int> test_features;
    for (int i = 2; i < argc; ++i) {
      const int f = std::atoi(argv[i]);
      if (f >= 0 && f < net.num_features) test_features.push_back(f);
    }
    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, test_features, acc);
    std::printf("RESULT_CHESS_INCREMENTAL_0: %.10f\n",
                nv::nnue_head_single(net, acc));

    const int image_size = net.grid * 12;  // upstream: grid_size * 12
    std::vector<float> test_image(size_t(image_size) * image_size * 3, 0.1f);
    std::printf("RESULT_CHESS_IMAGE_0: %.10f\n",
                nv::nnue_evaluate_single(net, test_image.data(), image_size,
                                         image_size));

    nv::nnue_refresh_accumulator(net, {}, acc);
    std::printf("RESULT_CHESS_EMPTY: %.10f\n", nv::nnue_head_single(net, acc));
    nv::nnue_refresh_accumulator(net, {0}, acc);
    std::printf("RESULT_CHESS_SINGLE: %.10f\n",
                nv::nnue_head_single(net, acc));
    nv::nnue_refresh_accumulator(net, {10, 20, 30, 40, 50}, acc);
    std::printf("RESULT_CHESS_REPEATED: %.10f\n",
                nv::nnue_head_single(net, acc));
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
