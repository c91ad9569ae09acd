"""Loader robustness: corrupted .nnue files must never crash the engine.

Uses the ASan+UBSan build when present (engine/build_san, built by
`cmake -S engine -B engine/build_san -DNV_SANITIZE=ON`); falls back to the
release binary otherwise. Every corrupted input must yield a clean exit
(0 = benign corruption, 1 = rejected) — never a crash or sanitizer abort.
"""

from pathlib import Path

import numpy as np
import pytest
import subprocess

from nnue_vision_tpu.formats import write_nnue
from tests.conftest import random_quantized_nnue

REPO = Path(__file__).resolve().parent.parent


def _engine_binary(engine_build_dir) -> Path:
    san = REPO / "engine" / "build_san" / "nnue_inference"
    return san if san.exists() else engine_build_dir / "nnue_inference"


def test_corrupted_models_never_crash(rng, tmp_path, engine_build_dir):
    exe = _engine_binary(engine_build_dir)
    q = random_quantized_nnue(rng)
    base = tmp_path / "m.nnue"
    write_nnue(q, base)
    data = bytearray(base.read_bytes())
    img = rng.random((16, 16, 3), dtype=np.float32)
    img_path = tmp_path / "img.bin"
    img.tofile(img_path)

    for trial in range(15):
        corrupted = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            region = min(300, len(corrupted)) if trial % 2 == 0 else len(corrupted)
            pos = int(rng.integers(0, region))
            corrupted[pos] = int(rng.integers(0, 256))
        bad = tmp_path / "bad.nnue"
        bad.write_bytes(bytes(corrupted))
        r = subprocess.run(
            [str(exe), str(bad), str(img_path), "16", "16"],
            capture_output=True, text=True, timeout=30,
        )
        assert r.returncode in (0, 1), (
            f"engine crashed on corrupted input (rc={r.returncode}): "
            f"{r.stderr[:300]}"
        )
