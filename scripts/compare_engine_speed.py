#!/usr/bin/env python3
"""Compare NNUE vs EtinyNet C++ engine speed + the TPU int8 paths.

Upstream equivalent: scripts/compare_engine_speed.py (builds the engine,
serializes ~1M-param NNUE and micro EtinyNet, times per-image inference,
parses DENSITY_RESULT/RESULT_AVG_MS machine lines). This version also
times the TPU batch int8 simulation for the server-side story.

Usage: python scripts/compare_engine_speed.py [--samples 64] [--skip-tpu]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_engine() -> Path:
    build = REPO / "engine" / "build"
    if not (build / "nnue_inference").exists():
        subprocess.run(["cmake", "-S", str(REPO / "engine"), "-B", str(build),
                        "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["ninja", "-C", str(build)], check=True,
                       capture_output=True)
    return build


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--skip-tpu", action="store_true")
    args = parser.parse_args()

    build = build_engine()

    from nnue_vision_tpu.formats import write_etiny, write_nnue
    from nnue_vision_tpu.models.api import NNUE, EtinyNet
    from nnue_vision_tpu.models.nnue import GridFeatureSet

    # ~1M-param NNUE (production shape) + micro EtinyNet, untrained.
    nnue = NNUE(feature_set=GridFeatureSet(10, 8), l1_size=1024, l2_size=128,
                l3_size=32, num_classes=10, input_size=32)
    etiny = EtinyNet(variant="micro", num_classes=10, input_size=32)
    print(f"NNUE params: {nnue.count_parameters():,}; "
          f"EtinyNet-micro params: {etiny.count_parameters():,}")

    nnue_path = Path(tempfile.mktemp(suffix=".nnue"))
    etiny_path = Path(tempfile.mktemp(suffix=".etiny"))
    write_nnue(nnue.quantize(), nnue_path)
    write_etiny(etiny.quantize(), etiny_path)

    rng = np.random.default_rng(0)
    images = rng.random((args.samples, 32, 32, 3), dtype=np.float32)
    img_path = Path(tempfile.mktemp(suffix=".bin"))
    images.tofile(img_path)

    results = {}
    for name, exe, model in (
        ("nnue", build / "nnue_inference", nnue_path),
        ("etinynet", build / "etinynet_inference", etiny_path),
    ):
        t0 = time.perf_counter()
        r = subprocess.run(
            [str(exe), str(model), str(img_path), "32", "32",
             str(args.samples)],
            capture_output=True, text=True, timeout=600,
        )
        dt = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr
        ms = dt / args.samples * 1000
        results[name] = ms
        print(f"C++ {name}: {ms:.4f} ms/image (batch of {args.samples}, "
              f"one process)")

    # Density sweep via the benchmark tool's machine lines.
    r = subprocess.run([str(build / "benchmark_engine"), str(nnue_path),
                        str(args.iters)], capture_output=True, text=True,
                       timeout=600)
    for line in r.stdout.splitlines():
        if line.startswith(("DENSITY_RESULT:", "RESULT_AVG_MS:",
                            "INCREMENTAL_SPEEDUP:")):
            print(line)

    if not args.skip_tpu:
        # TIMING CONTRACT (same as bench.py): on this backend
        # block_until_ready can return before compute finishes, so TPU
        # timings run many scan-chained reps in one dispatch and end with a
        # forced device→host readback. Reps are chained by deriving each
        # rep's input-buffer index from the previous rep's output (no
        # loop-invariant hoisting, every rep reads fresh input from HBM);
        # the ~30ms d2h readback amortizes over the reps.
        import jax
        import jax.numpy as jnp

        from nnue_vision_tpu.ops.engine_sim import (
            etiny_engine_forward, etiny_sim_params,
            nnue_engine_forward, nnue_sim_params,
        )

        np.asarray(jnp.zeros(()))  # warm the d2h path outside timed regions
        reps = 400
        n_buf = 4
        data = jnp.asarray(
            rng.random((n_buf, args.samples, 32, 32, 3), dtype=np.float32)
        )

        def timed_ms(fwd):
            @jax.jit
            def run(d):
                def body(idx, _):
                    v = jax.lax.dynamic_index_in_dim(d, idx, keepdims=False)
                    out = fwd(v).reshape(-1)
                    nxt = (idx + 1 + out[0].astype(jnp.int32) * 0) % n_buf
                    return nxt, out[0]
                _, outs = jax.lax.scan(body, jnp.int32(0), None, length=reps)
                return outs[-1]

            np.asarray(run(data))  # compile + warm readback
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(data))
                best = min(best, time.perf_counter() - t0)
            return best / (reps * args.samples) * 1000

        p, c = nnue_sim_params(nnue.quantize())
        ms = timed_ms(
            lambda v: nnue_engine_forward(p, v, cfg=c, image_h=32, image_w=32)[0]
        )
        print(f"TPU nnue int8 sim: {ms:.5f} ms/image "
              f"({results['nnue'] / ms:.0f}x the C++ engine)")

        pe, ce = etiny_sim_params(etiny.quantize())
        ms = timed_ms(
            lambda v: etiny_engine_forward(pe, v, cfg=ce, image_h=32, image_w=32)
        )
        print(f"TPU etinynet int8 sim: {ms:.5f} ms/image "
              f"({results['etinynet'] / ms:.0f}x the C++ engine)")

    for f in (nnue_path, etiny_path, img_path):
        f.unlink(missing_ok=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
