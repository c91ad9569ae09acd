#!/usr/bin/env python3
"""Fast test runner: the sub-10-second subset (upstream run_fast_tests.py).

Runs the pure-python/format tests that need no engine build and no JAX
compilation of large graphs.
"""

import subprocess
import sys
import time

FAST_TESTS = [
    "tests/test_formats.py",
    "tests/test_metrics.py",
    "tests/test_configs.py",
    "tests/test_data.py",
]


def main() -> int:
    t0 = time.perf_counter()
    result = subprocess.run(
        [sys.executable, "-m", "pytest", *FAST_TESTS, "-q", "--no-header"],
    )
    elapsed = time.perf_counter() - t0
    print(f"fast suite finished in {elapsed:.1f}s")
    return result.returncode


if __name__ == "__main__":
    sys.exit(main())
