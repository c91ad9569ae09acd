// Model containers + loaders for the .nnue v2 / .etiny v1 formats.
//
// Clean-room implementation of the deployment engine: it reads the same
// byte formats and computes the same integer arithmetic as the upstream
// NNUE-Vision engine (formats documented in nnue_vision_tpu/formats.py),
// so serialized models are interchangeable between the two. Organized as
// plain structs + free functions; evaluation hot loops live in nnue.cpp /
// etiny.cpp and are written to auto-vectorize under -O3 -march=native.
#pragma once

#include <cstdint>
#include <istream>
#include <string>
#include <vector>

namespace nv {

// ---------------------------------------------------------------------- NNUE

struct NnueNet {
  // header
  int num_features = 0;
  int l1 = 0, l2 = 0, l3 = 0;
  int num_classes = 0;
  float nnue2score = 0.f;
  float quantized_one = 127.f;
  float visual_threshold = 0.f;
  // conv frontend (weights in on-disk order: out, kh, kw, in)
  int conv_out_channels = 0;
  float conv_scale = 64.f;
  std::vector<int8_t> conv_w;
  std::vector<int8_t> conv_w_t;  // (27, out) tap-major transpose — the
                                 // broadcast conv loop's layout; built by
                                 // the loader (in-forward fallback for
                                 // hand-built nets)
  std::vector<int32_t> conv_b;
  // derived grid
  int grid = 0;
  // feature transformer
  float ft_scale = 64.f;
  std::vector<int16_t> ft_w;  // (num_features, l1) row-major
  std::vector<int32_t> ft_b;  // (l1)
  // classifier head (unpadded logical shapes)
  float fc1_scale = 64.f, fc2_scale = 64.f, out_scale = 64.f;
  std::vector<int8_t> fc1_w;  // (l2, l1)
  std::vector<int32_t> fc1_b;
  std::vector<int8_t> fc2_w;  // (l3, l2)
  std::vector<int32_t> fc2_b;
  std::vector<int8_t> out_w;  // (num_classes, l3)
  std::vector<int32_t> out_b;
  // chess-legacy single-score path (upstream LayerStack::forward,
  // nnue_engine.cpp:382-478): the padded L1 row (row l2 of the on-disk
  // (l2+1, l1) matrix) and the factorization block, stored faithfully —
  // serializers write zeros / 127·I here, but the engine computes with
  // whatever the file carries.
  std::vector<int8_t> fc1_pad_w;   // (l1)
  int32_t fc1_pad_b = 0;
  std::vector<int8_t> fc2_full_w;  // (l3, 2·l2) — the on-disk L2 matrix
                                   // (single-score path contracts the
                                   // doubled width; zeros upstream)
  float l1_fact_scale = 64.f;
  std::vector<int8_t> l1_fact_w;   // (l1, l1) row-major
  std::vector<int32_t> l1_fact_b;  // (l1)
};

// Loads a .nnue v2 stream; throws std::runtime_error on violations.
NnueNet load_nnue(std::istream& in);
NnueNet load_nnue_file(const std::string& path);

struct NnueResult {
  std::vector<float> logits;
  float density = 0.f;
  int active_count = 0;
};

// The engine conv stride rule: ceil((H-1)/(grid-1)).
int nnue_conv_stride(int image_h, int grid);

// Full evaluation of one HWC float image.
NnueResult nnue_evaluate(const NnueNet& net, const float* image, int h, int w);

// Split pipeline (for incremental / benchmark use):
// image -> active feature indices (also fills the int8 grid buffer).
void nnue_extract_features(const NnueNet& net, const float* image, int h,
                           int w, std::vector<int>& features);
// accumulator ops (chess-style incremental updates)
void nnue_refresh_accumulator(const NnueNet& net,
                              const std::vector<int>& features,
                              std::vector<int16_t>& acc);
void nnue_update_accumulator(const NnueNet& net,
                             const std::vector<int>& added,
                             const std::vector<int>& removed,
                             std::vector<int16_t>& acc);
// accumulator -> logits (applies the clipped ReLU internally).
std::vector<float> nnue_head(const NnueNet& net,
                             const std::vector<int16_t>& acc);
// Chess-legacy single-score head (upstream LayerStack::forward,
// nnue_engine.cpp:382-478): combined L1 with the padded row, the
// factorization skip term, squared-clipped pairwise, L2, single output
// row; returns l3c + l1f_out + l1c_out. Bit-compatible with the
// upstream binary on the same file (tests/test_upstream_interchange.py).
// bias_lanes reproduces the upstream SIMD-dispatch bias-counting quirk:
// 0 = auto (match the upstream build for this host's ISA: 8 AVX2 /
// 4 NEON / 1 scalar), or explicit. See nnue.cpp for the full story.
float nnue_head_single(const NnueNet& net, const std::vector<int16_t>& acc,
                       int bias_lanes = 0);
// evaluate()-equivalent for the single-score path (image → score).
float nnue_evaluate_single(const NnueNet& net, const float* image, int h,
                           int w, int bias_lanes = 0);

// ------------------------------------------------------------------ EtinyNet

struct EtinyBlock {
  bool dense = false;  // serialized with the DLB tag
  int in_c = 0, mid_c = 0, out_c = 0, stride = 1;
  float s_expand = 64.f, s_dw = 64.f, s_project = 64.f;
  std::vector<int8_t> pw_expand;   // (mid, in)
  std::vector<int32_t> pw_expand_b;
  std::vector<int8_t> dw;          // (mid, 3, 3)
  std::vector<int8_t> dw_t;        // (3*3, mid) — tap-major transpose, so
                                   // the per-tap inner loop over channels
                                   // is contiguous for both input and
                                   // kernel (vectorized madd)
  std::vector<int8_t> pw_project;  // (out, mid)
  // Input-major transposes of the pointwise weights: the forward
  // broadcasts one input value against a contiguous row of OUTPUT
  // channels (simd::madd_scalar_i8), which keeps vector lanes full at
  // EtinyNet's tiny channel counts where per-output dots fall to scalar.
  std::vector<int8_t> pw_expand_t;   // (in, mid)
  std::vector<int8_t> pw_project_t;  // (mid, out)
};

struct EtinyNet {
  std::string variant;
  int num_classes = 0;
  int input_size = 0;
  int conv_channels = 0;
  int final_channels = 0;
  bool use_asq = false;
  int asq_bits = 4;
  float lambda_param = 2.f;
  // stem conv (on-disk order: out, kh, kw, in)
  float stem_scale = 64.f;
  int stem_out_channels = 0;
  std::vector<int8_t> stem_w;
  std::vector<int8_t> stem_w_t;  // (27, out) tap-major (see conv_w_t)
  std::vector<int32_t> stem_b;
  std::vector<EtinyBlock> blocks;
  // classifier
  float cls_scale = 64.f;
  int cls_in = 0;
  std::vector<int8_t> cls_w;  // (num_classes, cls_in)
  std::vector<int32_t> cls_b;
};

EtinyNet load_etiny(std::istream& in);
EtinyNet load_etiny_file(const std::string& path);

// Full evaluation of one HWC float image → logits.
std::vector<float> etiny_evaluate(const EtinyNet& net, const float* image,
                                  int h, int w);

}  // namespace nv
