#!/usr/bin/env python3
"""Flagship end-to-end interchange check (the PARITY.md 64/64 artifact).

Takes a trained checkpoint, serializes it with the production
serializer, evaluates N validation images through the UNMODIFIED
upstream `nnue_inference` binary, and reports (a) bit-exactness of every
logit vs our engine sim and (b) the upstream-binary accuracy — the
complete train→quantize→deploy circle through the reference's own
engine.

Usage (the exact command PARITY.md cites):
    python scripts/upstream_e2e_check.py \
        --ckpt logs/runs/<flagship_run>/best_model.ckpt \
        --ref-build /tmp/ref_build --n 64

Build the reference binary first (run_comprehensive_tests.py does this
automatically):
    cmake -S /root/reference/engine -B /tmp/ref_build && \
        cmake --build /tmp/ref_build --target nnue_inference
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Everything here is host-side (numpy sim + subprocesses); force the CPU
# backend IN-PROCESS (the env var alone does not override this machine's
# pinned platform) so the check never contends for the single-tenant TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--ref-build", default="/tmp/ref_build")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--dataset", default="synthetic-hard")
    ap.add_argument("--synthetic-size", type=int, default=20000)
    args = ap.parse_args()

    exe = Path(args.ref_build) / "nnue_inference"
    if not exe.exists():
        print(f"upstream binary missing at {exe} — build it first "
              "(see docstring)", file=sys.stderr)
        return 2

    from serialize import load_checkpoint_auto, serialize_checkpoint
    from nnue_vision_tpu.data.datasets import GenericVisionDataset
    from nnue_vision_tpu.data.augment import normalize_images
    from nnue_vision_tpu.formats import read_nnue
    from nnue_vision_tpu.ops.engine_sim_np import nnue_forward_np

    model_type, _, _, _ = load_checkpoint_auto(Path(args.ckpt))
    assert model_type == "nnue", f"flagship check is NNUE; got {model_type}"

    td = Path(tempfile.mkdtemp())
    model_path = td / "flagship.nnue"
    serialize_checkpoint(Path(args.ckpt), model_path)
    q = read_nnue(model_path)

    ds = GenericVisionDataset(
        args.dataset, split="test", synthetic_size=args.synthetic_size,
        seed=42,
    )
    images = ds.images[: args.n]
    labels = ds.labels[: args.n]
    norm = np.asarray(normalize_images(images), np.float32)

    correct = 0
    exact = 0
    for i in range(len(norm)):
        img = np.ascontiguousarray(norm[i], np.float32)
        img_path = td / "img.bin"
        img.tofile(img_path)
        r = subprocess.run(
            [str(exe), str(model_path), str(img_path),
             str(img.shape[0]), str(img.shape[1])],
            capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 0, r.stderr
        parts = r.stdout.strip().split(",")
        upstream = np.array([float(v) for v in parts[:-1]], np.float32)
        ours, _ = nnue_forward_np(q, img)
        # the CLI prints 10-dp FIXED decimals, which cannot round-trip
        # f32 values below ~1e-3 (measured: a logit of exactly -2^-11
        # prints as -0.0004882812) — so bit-exactness is asserted at the
        # shared representation: our logits printed the same way must
        # match the upstream text exactly
        ours_text = [f"{float(v):.10f}" for v in ours]
        exact += int(ours_text == parts[:-1])
        correct += int(int(np.argmax(upstream)) == int(labels[i]))

    out = {
        "ckpt": args.ckpt,
        "n": len(norm),
        "upstream_binary": str(exe),
        "bit_exact_vs_our_sim": exact,
        "upstream_correct": correct,
        "upstream_accuracy": round(correct / max(1, len(norm)), 4),
    }
    print(json.dumps(out))
    assert exact == len(norm), "logit mismatch vs our sim — parity broken"
    return 0


if __name__ == "__main__":
    sys.exit(main())
