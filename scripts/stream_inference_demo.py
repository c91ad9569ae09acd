#!/usr/bin/env python3
"""Streaming (video) NNUE inference demo: chess-style incremental
accumulator updates, batched on TPU (ROADMAP #6; upstream equivalent is the
C++ `regression_test.cpp` incremental path + `benchmark_engine.cpp`'s
INCREMENTAL_SPEEDUP study).

A synthetic pan sequence (base scene + moving bright patch) is evaluated
two ways, bit-exactly equal by construction and asserted per frame:
  1. full forward  — conv → threshold → FT refresh → head
  2. incremental   — conv → threshold → accumulator += Δmask @ FT → head

Honest framing: on TPU the Δ-mask product is the same dense MXU matmul as
a refresh, so incrementality buys little silicon time there (measured and
printed); it exists for API parity and host-side serving. The place
incrementality pays ~7× is the C++ engine (benchmark_engine prints
INCREMENTAL_SPEEDUP on the same model files).

Usage: python scripts/stream_inference_demo.py [--frames 64] [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=256, help="parallel streams")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet, NNUEConfig, nnue_init, nnue_quantize,
    )
    from nnue_vision_tpu.ops.engine_sim import (
        nnue_accumulator_refresh, nnue_accumulator_update, nnue_engine_forward,
        nnue_feature_mask, nnue_head_from_accumulator, nnue_sim_params,
    )

    np.asarray(jnp.zeros(()))  # warm d2h (slow first transfer on tunneled TPU)

    cfg = NNUEConfig(feature_set=GridFeatureSet(10, 8), l1_size=1024,
                     l2_size=128, l3_size=32, num_classes=10, input_size=32)
    q = nnue_quantize(nnue_init(jax.random.PRNGKey(0), cfg), cfg)
    params, sc = nnue_sim_params(q)

    # Synthetic pan: per-stream static scene, a bright 8×8 patch strides
    # one pixel per frame (wrapping) — few grid cells change per frame.
    rng = np.random.default_rng(0)
    scenes = rng.random((args.batch, 32, 32, 3), dtype=np.float32) * 0.4

    def frame(t: int) -> jnp.ndarray:
        f = scenes.copy()
        x0 = t % 24
        y0 = (t * 3) % 24
        f[:, y0:y0 + 8, x0:x0 + 8, :] += 0.6
        return jnp.asarray(np.clip(f, 0.0, 1.0))

    # --- correctness: incremental == refresh, every frame, bit-exact.
    mask = nnue_feature_mask(params, frame(0), cfg=sc, image_h=32, image_w=32)
    acc = nnue_accumulator_refresh(params, mask)
    mismatches = 0
    for t in range(1, args.frames):
        new_mask = nnue_feature_mask(params, frame(t), cfg=sc,
                                     image_h=32, image_w=32)
        acc = nnue_accumulator_update(params, acc, new_mask, mask)
        mask = new_mask
        inc_logits = nnue_head_from_accumulator(params, acc, cfg=sc)
        ref_logits, _, _ = nnue_engine_forward(params, frame(t), cfg=sc,
                                               image_h=32, image_w=32)
        if not np.array_equal(np.asarray(inc_logits), np.asarray(ref_logits)):
            mismatches += 1
    print(f"bit-exactness: {args.frames - 1} frames × {args.batch} streams, "
          f"{mismatches} mismatches")
    if mismatches:
        return 1

    # --- timing (scan-chained in one dispatch + forced readback; this
    # backend's block_until_ready returns early).
    frames_dev = jnp.stack([frame(t) for t in range(args.frames)])

    @jax.jit
    def run_full(fr):
        def body(carry, f):
            logits, _, _ = nnue_engine_forward(params, f, cfg=sc,
                                               image_h=32, image_w=32)
            return carry + logits[0, 0] * 0, logits[0, 0]
        _, outs = jax.lax.scan(body, jnp.float32(0), fr)
        return outs[-1]

    @jax.jit
    def run_incremental(fr):
        m0 = nnue_feature_mask(params, fr[0], cfg=sc, image_h=32, image_w=32)
        a0 = nnue_accumulator_refresh(params, m0)

        def body(carry, f):
            a, m = carry
            nm = nnue_feature_mask(params, f, cfg=sc, image_h=32, image_w=32)
            a = nnue_accumulator_update(params, a, nm, m)
            logits = nnue_head_from_accumulator(params, a, cfg=sc)
            return (a, nm), logits[0, 0]
        _, outs = jax.lax.scan(body, (a0, m0), fr[1:])
        return outs[-1]

    for tag, fn in (("full forward", run_full),
                    ("incremental ", run_incremental)):
        np.asarray(fn(frames_dev))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(frames_dev))
        dt = time.perf_counter() - t0
        per_frame = dt / args.frames * 1000
        print(f"TPU {tag}: {per_frame:.3f} ms/frame "
              f"({args.batch * args.frames / dt:,.0f} stream-frames/s)")
    print("(C++ engine incremental speedup on the same model: run "
          "engine/build/benchmark_engine — INCREMENTAL_SPEEDUP line)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
