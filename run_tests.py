#!/usr/bin/env python
"""Suite runner: one pytest process PER TEST FILE.

Why: XLA:CPU segfaults in ``backend_compile_and_load`` after a long-lived
process accumulates a few hundred compilations — reproduced across THREE
different modules this round (the i2LQR step-kernel tests, the NLMPC
step-kernel tests, and test_nlmpc's meshed-controller pjit), always late
in the session and never in a fresh process. The crash point wanders, so
per-module isolation is whack-a-mole; bounding process lifetime to one
test file is the structural fix. Ordering is free (files run in sorted
order by default, ``--shuffle`` randomizes), a compiler crash fails one
file instead of killing the session, and the persistent compile cache
keeps repeat runs fast.

Usage:
  python run_tests.py             # all test files, sorted
  python run_tests.py --shuffle   # randomized file order
  python run_tests.py -k retile   # forwarded to pytest per file

The heavy kernel modules' in-suite skip (ISOLATED_KERNEL_TESTS) is
satisfied here by construction — every file gets its own process — so the
wrapper module tests/test_isolated_kernel_modules.py is excluded (it
exists for plain ``pytest tests/`` invocations, which remain supported
but carry the long-lived-process crash risk this runner removes).
"""

from __future__ import annotations

import argparse
import glob
import os
import random
import subprocess
import sys
import time

TESTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
EXCLUDE = {"test_isolated_kernel_modules.py"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shuffle", action="store_true")
    ap.add_argument("--timeout", type=int, default=5400,
                    help="per-file timeout (s)")
    args, passthrough = ap.parse_known_args()

    files = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(TESTS_DIR, "test_*.py")))
    files = [f for f in files if f not in EXCLUDE]
    if args.shuffle:
        random.shuffle(files)

    env = dict(os.environ)
    env["ISOLATED_KERNEL_TESTS"] = "1"  # per-file processes ARE isolation
    failures = []
    t_start = time.time()
    for i, f in enumerate(files):
        t0 = time.time()
        print(f"[{i + 1}/{len(files)}] {f} ...", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, "-m", "pytest",
                 os.path.join(TESTS_DIR, f), "-q", "--no-header",
                 *passthrough],
                capture_output=True, text=True, timeout=args.timeout,
                env=env, cwd=os.path.dirname(TESTS_DIR))
            rc = out.returncode
            tail = out.stdout.strip().splitlines()
            summary = tail[-1] if tail else "(no output)"
        except subprocess.TimeoutExpired:
            rc, summary = -1, "TIMEOUT"
        dt = time.time() - t0
        # pytest rc 5 = no tests collected (e.g. everything deselected by
        # a -k filter) — not a failure for a per-file sweep
        ok = rc in (0, 5)
        print(f"    {'ok' if ok else 'FAIL'} ({dt:.0f}s) {summary}",
              flush=True)
        if not ok:
            failures.append((f, rc, summary))
            if rc != 0:
                print(out.stdout[-4000:] if 'out' in dir() else "",
                      flush=True)
    total = time.time() - t_start
    print(f"\n{len(files) - len(failures)}/{len(files)} files passed "
          f"in {total / 60:.1f} min")
    for f, rc, summary in failures:
        print(f"  FAILED {f} (rc={rc}): {summary}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
