"""Shared fixtures.

JAX is forced onto CPU with 8 virtual devices BEFORE any jax import so mesh
/ sharding tests run without TPU hardware (mirrors how the reference fakes
its backends; SURVEY.md §4 "TPU translation").
"""

import os
import subprocess
from pathlib import Path

# Must happen before any jax backend initializes. NOTE: this machine pins
# JAX_PLATFORMS=axon in the environment and the env var alone does not win;
# the in-process config update does.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("NV_NO_DOWNLOAD", "1")  # air-gapped test runs

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
ENGINE_BUILD = REPO / "engine" / "build"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def _build_engine() -> Path:
    ENGINE_BUILD.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["cmake", "-S", str(REPO / "engine"), "-B", str(ENGINE_BUILD),
         "-DCMAKE_BUILD_TYPE=Release", "-G", "Ninja"],
        check=True, capture_output=True, timeout=120,
    )
    subprocess.run(
        ["ninja", "-C", str(ENGINE_BUILD)],
        check=True, capture_output=True, timeout=300,
    )
    return ENGINE_BUILD


@pytest.fixture(scope="session")
def engine_build_dir() -> Path:
    """Build the in-repo C++ engine once per session."""
    nnue_exec = ENGINE_BUILD / "nnue_inference"
    etiny_exec = ENGINE_BUILD / "etinynet_inference"
    if not (nnue_exec.exists() and etiny_exec.exists()):
        _build_engine()
    return ENGINE_BUILD


def random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4, num_classes=3,
                          visual_threshold=0.07):
    """A random-but-valid QuantizedNNUE for format/parity tests."""
    from nnue_vision_tpu.formats import (
        QConv, QFeatureTransformer, QLinear, QuantizedNNUE,
    )

    def i8(*s):
        return rng.integers(-127, 128, s).astype(np.int8)

    def i32(*s, lo=-2000, hi=2000):
        return rng.integers(lo, hi, s).astype(np.int32)

    f = grid * grid * ch
    return QuantizedNNUE(
        grid_size=grid, num_features_per_square=ch, l1=l1, l2=l2, l3=l3,
        nnue2score=600.0, visual_threshold=visual_threshold,
        conv=QConv(weight=i8(ch, 3, 3, 3), bias=i32(ch, lo=-500, hi=500)),
        ft=QFeatureTransformer(weight=i8(f, l1).astype(np.int16), bias=i32(l1)),
        fc1=QLinear(weight=i8(l2, l1), bias=i32(l2)),
        fc2=QLinear(weight=i8(l3, l2), bias=i32(l3)),
        out=QLinear(weight=i8(num_classes, l3), bias=i32(num_classes)),
    ).validate()


def random_quantized_etiny(rng, num_classes=10, input_size=32):
    """A random micro-scale QuantizedEtinyNet (incl. a stride-2 dense block
    to exercise the engine's dim-preservation quirk)."""
    from nnue_vision_tpu.formats import QConv, QLBBlock, QLinear, QuantizedEtinyNet

    def i8(*s):
        return rng.integers(-127, 128, s).astype(np.int8)

    blocks = [
        QLBBlock(pw_expand=i8(16, 8), dw=i8(16, 3, 3), pw_project=i8(16, 16), stride=2),
        QLBBlock(pw_expand=i8(24, 16), dw=i8(24, 3, 3), pw_project=i8(24, 24),
                 stride=2, is_dense=True),
        QLBBlock(pw_expand=i8(24, 24), dw=i8(24, 3, 3), pw_project=i8(24, 24),
                 stride=1, is_dense=True),
    ]
    return QuantizedEtinyNet(
        variant="micro", num_classes=num_classes, input_size=input_size,
        conv_channels=8, final_channels=24,
        stem=QConv(weight=i8(8, 3, 3, 3),
                   bias=rng.integers(-500, 500, 8).astype(np.int32)),
        blocks=blocks,
        classifier=QLinear(weight=i8(num_classes, 24),
                           bias=rng.integers(-2000, 2000, num_classes).astype(np.int32)),
    ).validate()
