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


def main() -> int:
    t0 = time.perf_counter()
    failed = []
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
