#!/usr/bin/env python3
"""Comprehensive test runner: every suite including engine parity and real
training (upstream run_comprehensive_tests.py, with its dead-code NameError
fixed by not existing here).

The upstream-interchange suite is self-sustaining: this runner builds the
UNMODIFIED reference engine from NV_REF_SRC (default
/root/reference/engine) into NV_REF_ENGINE_DIR (default /tmp/ref_build)
and runs tests/test_upstream_interchange.py with NV_REQUIRE_UPSTREAM=1, so
the bit-exact interchange evidence either runs against real upstream
binaries or fails loudly — it can no longer silently skip on a stale /tmp
directory. Set NV_SKIP_UPSTREAM=1 only on hosts without the reference
source tree."""

import os
import subprocess
import sys
import time

SUITES = [
    ("formats", ["tests/test_formats.py"]),
    ("metrics", ["tests/test_metrics.py"]),
    ("configs", ["tests/test_configs.py"]),
    ("data", ["tests/test_data.py"]),
    ("models", ["tests/test_model.py"]),
    ("engine sims", ["tests/test_engine_sim.py"]),
    ("engine parity", ["tests/test_engine_parity.py"]),
    ("pallas kernels", ["tests/test_pallas_kernels.py",
                        "tests/test_etiny_pallas.py"]),
    ("input pipeline", ["tests/test_input_pipeline.py"]),
    ("warp kernel", ["tests/test_warp_kernel.py"]),
    ("photometric kernel", ["tests/test_photometric_kernel.py"]),
    ("augmentation goldens", ["tests/test_augment_golden.py"]),
    ("reference anchor staging", ["tests/test_reference_anchor.py"]),
    ("evaluation", ["tests/test_evaluate.py"]),
    ("benchmarks", ["tests/test_benchmarks.py",
                    "tests/test_benchmarks_spec.py"]),
    ("training", ["tests/test_training.py", "tests/test_scanned_steps.py"]),
    ("progressive QAT", ["tests/test_progressive_qat.py",
                         "tests/test_engine_friendly.py"]),
    ("incremental serving", ["tests/test_incremental.py"]),
    ("CLI tools", ["tests/test_cli_tools.py"]),
    ("cloud", ["tests/test_cloud.py"]),
    ("torch import", ["tests/test_torch_import.py"]),
    ("engine fuzz", ["tests/test_engine_fuzz.py"]),
    ("parallel", ["tests/test_parallel.py"]),
    ("distributed", ["tests/test_distributed.py"]),
    ("checkpoint/orbax", ["tests/test_checkpoint_orbax.py"]),
    ("axon preflight", ["tests/test_axon_preflight.py"]),
]


def run_cpp_suite() -> bool:
    """Configure+build the engine and run its CTest suites (unit, etiny,
    SIMD-backend parity) — the C++ half of the test strategy."""
    from pathlib import Path

    build = Path("engine/build")
    steps = [
        ["cmake", "-S", "engine", "-B", str(build), "-DCMAKE_BUILD_TYPE=Release"],
        ["cmake", "--build", str(build), "--parallel"],
        ["ctest", "--test-dir", str(build), "--output-on-failure"],
    ]
    for cmd in steps:
        if subprocess.run(cmd).returncode != 0:
            return False
    return True


def build_reference_engine() -> bool:
    """Build the unmodified upstream engine CLIs as the interchange oracle.

    Source: NV_REF_SRC (default /root/reference/engine — the reference
    CMake project, engine/CMakeLists.txt upstream). Only the two inference
    binaries the interchange tests drive are built."""
    from pathlib import Path

    src = Path(os.environ.get("NV_REF_SRC", "/root/reference/engine"))
    build = Path(os.environ.get("NV_REF_ENGINE_DIR", "/tmp/ref_build"))
    if not (src / "CMakeLists.txt").exists():
        print(f"reference engine source not found at {src}")
        return False
    steps = [
        ["cmake", "-S", str(src), "-B", str(build),
         "-DCMAKE_BUILD_TYPE=Release"],
        ["cmake", "--build", str(build), "--parallel", "--target",
         "nnue_inference", "etinynet_inference", "regression_test"],
    ]
    for cmd in steps:
        if subprocess.run(cmd).returncode != 0:
            return False
    return (build / "nnue_inference").exists()


def main() -> int:
    t0 = time.perf_counter()
    failed = []
    print("=== C++ engine (ctest) ===")
    if not run_cpp_suite():
        failed.append("C++ engine")

    skip_upstream = os.environ.get("NV_SKIP_UPSTREAM") == "1"
    if not skip_upstream:
        print("\n=== reference engine build (interchange oracle) ===")
        if not build_reference_engine():
            failed.append("reference engine build")
            skip_upstream = True  # no point running tests guaranteed to fail

    for name, paths in SUITES:
        print(f"\n=== {name} ===")
        result = subprocess.run(
            [sys.executable, "-m", "pytest", *paths, "-q", "--no-header"]
        )
        if result.returncode != 0:
            failed.append(name)

    if not skip_upstream:
        print("\n=== upstream interchange (bit-exact vs reference binaries) ===")
        env = dict(os.environ)
        env.setdefault("NV_REF_ENGINE_DIR", "/tmp/ref_build")
        env["NV_REQUIRE_UPSTREAM"] = "1"
        result = subprocess.run(
            [sys.executable, "-m", "pytest",
             "tests/test_upstream_interchange.py", "-q", "--no-header"],
            env=env,
        )
        if result.returncode != 0:
            failed.append("upstream interchange")
    elapsed = time.perf_counter() - t0
    print(f"\ncomprehensive suite finished in {elapsed:.1f}s")
    if failed:
        print(f"FAILED suites: {', '.join(failed)}")
        return 1
    print("all suites passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
