// NNUE engine benchmark: density sweep + incremental-update speedup.
//
// Output contract kept machine-readable like the upstream harness
// (benchmark_engine.cpp upstream): one "DENSITY_RESULT:<name>:<ms>" line
// per scenario and a final "RESULT_AVG_MS:<ms>", plus an
// "INCREMENTAL_SPEEDUP:<x>" line for the incremental-vs-refresh study.
//
// Usage: benchmark_engine [model.nnue] [iters]
// Without a model file a synthetic mid-size network is generated in memory.

#include <chrono>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "../include/nv/model.h"
#include "../include/nv/simd.h"

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

static nv::NnueNet synthetic_net() {
  nv::NnueNet net;
  net.num_features = 800;  // 10x10x8 grid
  net.l1 = 1024;
  net.l2 = 128;
  net.l3 = 32;
  net.num_classes = 10;
  net.grid = 10;
  net.conv_out_channels = 8;
  net.quantized_one = 127.f;
  std::mt19937 rng(7);
  std::uniform_int_distribution<int> w8(-64, 64);
  auto fill8 = [&](std::vector<int8_t>& v, size_t n) {
    v.resize(n);
    for (auto& x : v) x = static_cast<int8_t>(w8(rng));
  };
  fill8(net.conv_w, size_t(net.conv_out_channels) * 27);
  net.conv_b.assign(net.conv_out_channels, 0);
  net.ft_w.resize(size_t(net.num_features) * net.l1);
  for (auto& x : net.ft_w) x = static_cast<int16_t>(w8(rng));
  net.ft_b.assign(net.l1, 64);
  fill8(net.fc1_w, size_t(net.l2) * net.l1);
  net.fc1_b.assign(net.l2, 0);
  fill8(net.fc2_w, size_t(net.l3) * net.l2);
  net.fc2_b.assign(net.l3, 0);
  fill8(net.out_w, size_t(net.num_classes) * net.l3);
  net.out_b.assign(net.num_classes, 0);
  return net;
}

int main(int argc, char** argv) {
  std::printf("SIMD_BACKEND:%s\n", nv::simd::backend());
  nv::NnueNet net;
  int iters = 1000;
  if (argc > 1 && std::string(argv[1]) != "-") {
    try {
      net = nv::load_nnue_file(argv[1]);
    } catch (const std::exception& e) {
      std::fprintf(stderr, "load failed: %s\n", e.what());
      return 1;
    }
  } else {
    net = synthetic_net();
  }
  if (argc > 2) iters = std::atoi(argv[2]);

  std::mt19937 rng(42);
  struct Scenario {
    const char* name;
    double density;
  } scenarios[] = {
      {"sparse_0.1pct", 0.001}, {"sparse_1pct", 0.01}, {"low_5pct", 0.05},
      {"mid_25pct", 0.25},      {"dense_90pct", 0.90},
  };

  std::printf("scenario        density  avg_ms    min_ms    max_ms\n");
  double total_avg = 0.0;
  int n_scen = 0;
  for (const auto& sc : scenarios) {
    const int n_active = std::max(1, int(net.num_features * sc.density));
    std::vector<int> features(n_active);
    std::uniform_int_distribution<int> fidx(0, net.num_features - 1);
    for (auto& f : features) f = fidx(rng);

    std::vector<int16_t> acc;
    double total = 0, mn = 1e30, mx = 0;
    for (int i = 0; i < iters; ++i) {
      auto t0 = Clock::now();
      nv::nnue_refresh_accumulator(net, features, acc);
      volatile float sink = nv::nnue_head(net, acc)[0];
      (void)sink;
      double dt = ms_since(t0);
      total += dt;
      mn = std::min(mn, dt);
      mx = std::max(mx, dt);
    }
    double avg = total / iters;
    total_avg += avg;
    ++n_scen;
    std::printf("%-15s %6.3f   %8.4f %8.4f %8.4f\n", sc.name, sc.density, avg,
                mn, mx);
    std::printf("DENSITY_RESULT:%s:%.6f\n", sc.name, avg);
  }
  std::printf("RESULT_AVG_MS:%.6f\n", total_avg / n_scen);

  // Incremental vs full refresh: flip a small fraction of features per
  // frame, as a video stream would.
  {
    const int n_active = net.num_features / 4;
    const int n_flips = std::max(1, n_active / 20);
    std::vector<int> cur;
    std::uniform_int_distribution<int> fidx(0, net.num_features - 1);
    for (int i = 0; i < n_active; ++i) cur.push_back(fidx(rng));

    std::vector<int16_t> acc;
    nv::nnue_refresh_accumulator(net, cur, acc);

    double refresh_total = 0, incr_total = 0;
    for (int i = 0; i < iters; ++i) {
      std::vector<int> removed(cur.begin(), cur.begin() + n_flips);
      std::vector<int> added(n_flips);
      for (auto& f : added) f = fidx(rng);

      auto t0 = Clock::now();
      nv::nnue_update_accumulator(net, added, removed, acc);
      incr_total += ms_since(t0);

      cur.erase(cur.begin(), cur.begin() + n_flips);
      cur.insert(cur.end(), added.begin(), added.end());

      t0 = Clock::now();
      std::vector<int16_t> full;
      nv::nnue_refresh_accumulator(net, cur, full);
      refresh_total += ms_since(t0);
    }
    double speedup = refresh_total / std::max(incr_total, 1e-12);
    std::printf("full refresh avg %.4f ms, incremental avg %.4f ms\n",
                refresh_total / iters, incr_total / iters);
    std::printf("INCREMENTAL_SPEEDUP:%.3f\n", speedup);
  }
  return 0;
}
