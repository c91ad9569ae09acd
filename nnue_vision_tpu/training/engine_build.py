"""C++ engine build orchestration (fail-fast pre-training checks).

Upstream equivalents: compile_cpp_engine (train.py:30-114), sanitizer build
+ smoke test (train.py:117-206, env-gated by NNUE_SANITIZER_SMOKE=1), and
test_cpp_engine_inference (train.py:209-247). Training refuses to start if
the engine can't build and evaluate — catching deployment breakage before
GPU/TPU-hours are spent, exactly the upstream philosophy.
"""

from __future__ import annotations

import subprocess
import tempfile
from pathlib import Path

import numpy as np

from nnue_vision_tpu.training.logging import early_log

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
ENGINE_DIR = REPO_ROOT / "engine"


def _cmake_build(build_dir: Path, extra_flags=()) -> None:
    build_dir.mkdir(parents=True, exist_ok=True)
    gen = ["-G", "Ninja"]
    cfg = subprocess.run(
        ["cmake", "-S", str(ENGINE_DIR), "-B", str(build_dir),
         "-DCMAKE_BUILD_TYPE=Release", *gen, *extra_flags],
        capture_output=True, text=True, timeout=120,
    )
    if cfg.returncode != 0:
        raise RuntimeError(f"cmake failed:\n{cfg.stderr}")
    bld = subprocess.run(
        ["ninja", "-C", str(build_dir)], capture_output=True, text=True, timeout=600
    )
    if bld.returncode != 0:
        raise RuntimeError(f"build failed:\n{bld.stderr}")


def compile_cpp_engine(model_type: str) -> bool:
    """Build the engine and verify the relevant binary runs."""
    early_log(f"Compiling C++ engine for {model_type}...")
    build_dir = ENGINE_DIR / "build"
    _cmake_build(build_dir)
    exe = build_dir / (
        "nnue_inference" if model_type == "nnue" else "etinynet_inference"
    )
    if not exe.exists():
        raise RuntimeError(f"expected executable missing: {exe}")
    probe = subprocess.run([str(exe)], capture_output=True, text=True, timeout=10)
    if probe.returncode not in (0, 1):
        raise RuntimeError(f"engine binary not runnable (rc={probe.returncode})")
    early_log(f"C++ engine ready: {exe}")
    return True


def build_sanitizer_engine() -> Path:
    """ASan+UBSan build in engine/build_san (upstream train.py:117-144)."""
    early_log("Building sanitizer engine (ASan+UBSan)...")
    build_dir = ENGINE_DIR / "build_san"
    _cmake_build(build_dir, extra_flags=["-DNV_SANITIZE=ON"])
    early_log("Sanitizer engine built")
    return build_dir


def smoke_test_sanitizer_engine(model_type: str) -> None:
    """One inference through the sanitized binary on a tiny random model."""
    early_log("Running sanitizer smoke test...")
    build_dir = ENGINE_DIR / "build_san"
    exe = build_dir / (
        "nnue_inference" if model_type == "nnue" else "etinynet_inference"
    )
    if not exe.exists():
        raise RuntimeError(f"sanitizer executable not found: {exe}")

    rng = np.random.default_rng(0)
    import sys

    sys.path.insert(0, str(REPO_ROOT / "tests"))
    from conftest import random_quantized_etiny, random_quantized_nnue  # type: ignore

    from nnue_vision_tpu.formats import write_etiny, write_nnue

    h = 32
    if model_type == "nnue":
        q = random_quantized_nnue(rng, grid=8, ch=4, l1=64, l2=4, l3=8, num_classes=10)
        model_path = Path(tempfile.mktemp(suffix=".nnue"))
        write_nnue(q, model_path)
    else:
        q = random_quantized_etiny(rng)
        model_path = Path(tempfile.mktemp(suffix=".etiny"))
        write_etiny(q, model_path)
    img = rng.random((h, h, 3), dtype=np.float32)
    img_path = Path(tempfile.mktemp(suffix=".bin"))
    img.tofile(img_path)
    try:
        res = subprocess.run(
            [str(exe), str(model_path), str(img_path), str(h), str(h)],
            capture_output=True, text=True, timeout=60,
        )
        if res.returncode != 0:
            raise RuntimeError(
                f"sanitizer smoke failed (rc={res.returncode})\n"
                f"stdout: {res.stdout}\nstderr: {res.stderr}"
            )
        early_log("Sanitizer smoke test passed")
    finally:
        model_path.unlink(missing_ok=True)
        img_path.unlink(missing_ok=True)
