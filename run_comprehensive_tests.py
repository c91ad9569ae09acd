#!/usr/bin/env python3
"""Comprehensive test runner: every suite including engine parity and real
training (upstream run_comprehensive_tests.py, with its dead-code NameError
fixed by not existing here)."""

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
    ("benchmarks", ["tests/test_benchmarks.py"]),
    ("training", ["tests/test_training.py"]),
    ("parallel", ["tests/test_parallel.py"]),
    ("distributed", ["tests/test_distributed.py"]),
    ("checkpoint/orbax", ["tests/test_checkpoint_orbax.py"]),
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


def main() -> int:
    t0 = time.perf_counter()
    failed = []
    print("=== C++ engine (ctest) ===")
    if not run_cpp_suite():
        failed.append("C++ engine")
    for name, paths in SUITES:
        print(f"\n=== {name} ===")
        result = subprocess.run(
            [sys.executable, "-m", "pytest", *paths, "-q", "--no-header"]
        )
        if result.returncode != 0:
            failed.append(name)
    elapsed = time.perf_counter() - t0
    print(f"\ncomprehensive suite finished in {elapsed:.1f}s")
    if failed:
        print(f"FAILED suites: {', '.join(failed)}")
        return 1
    print("all suites passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
