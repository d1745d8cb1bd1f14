"""Survivable full-suite runner (VERDICT r4 #8).

JAX/XLA has segfaulted mid-suite three different ways on this host, all
infra flakes rather than product failures:

  - 2026-08-18: deserializing a truncated persistent-cache entry
    (get_executable_and_time) -> fixed by per-run cache isolation;
  - 2026-08-19 (VERDICT r4): the cache WRITE path
    (put_executable_and_time) -> fixed by disabling the cache in
    tests/conftest.py;
  - 2026-08-19 (round 5): bare backend_compile_and_load with the cache
    OFF, i.e. the XLA CPU compiler itself.

A single 200+-test pytest process dies with the flake and loses every
result after it. This runner makes the suite survivable: each test file
runs in its own pytest subprocess, a crashed file (negative returncode /
139 / a "Fatal Python error" dump) is retried up to MAX_RETRIES times,
and genuine test FAILURES are never retried. Per-file wall times double
as the duration profile VERDICT #8 asks for.

    python scripts/run_suite.py              # whole suite
    python scripts/run_suite.py pallas io    # only matching files

Exit 0 iff every file ends green.
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
MAX_RETRIES = 2
# Generous per-file cap: the slowest file (test_pallas) compiles many
# Mosaic kernels on one host core. A hang past this is itself a failure.
FILE_TIMEOUT_S = 1800

_CRASH_RE = re.compile(r"Fatal Python error|Segmentation fault")
_SUMMARY_RE = re.compile(r"(\d+) passed")


def run_file(path: str) -> tuple[str, float, int, str]:
    """Run one test file; returns (status, wall, n_passed, tail)."""
    name = os.path.basename(path)
    for attempt in range(1 + MAX_RETRIES):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q",
                 "-p", "no:cacheprovider"],
                cwd=REPO, capture_output=True, text=True,
                timeout=FILE_TIMEOUT_S,
            )
            rc, out = proc.returncode, proc.stdout + proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -99
            out = ((e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")) + "\n<TIMEOUT>"
        wall = time.perf_counter() - t0
        m = _SUMMARY_RE.search(out)
        n_passed = int(m.group(1)) if m else 0
        crashed = rc < 0 or rc == 139 or _CRASH_RE.search(out)
        if rc == 0:
            return "ok", wall, n_passed, ""
        if crashed and attempt < MAX_RETRIES:
            print(f"  {name}: CRASH (rc={rc}) after {wall:.0f}s — "
                  f"retry {attempt + 1}/{MAX_RETRIES}", flush=True)
            continue
        tail = "\n".join(out.strip().splitlines()[-15:])
        return ("crash" if crashed else "fail"), wall, n_passed, tail
    raise AssertionError("unreachable")


def main(argv: list[str]) -> int:
    files = sorted(glob.glob(os.path.join(TESTS, "test_*.py")))
    if argv:
        files = [f for f in files
                 if any(a in os.path.basename(f) for a in argv)]
    if not files:
        print("no test files matched", file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    results = []
    for path in files:
        name = os.path.basename(path)
        print(f"{name} ...", flush=True)
        status, wall, n_passed, tail = run_file(path)
        results.append((name, status, wall, n_passed))
        print(f"  {name}: {status} {n_passed} passed in {wall:.0f}s",
              flush=True)
        if tail:
            print(tail, flush=True)
    total = time.perf_counter() - t0
    bad = [r for r in results if r[1] != "ok"]
    n_tests = sum(r[3] for r in results)
    print("\n== slowest files ==")
    for name, _, wall, _ in sorted(results, key=lambda r: -r[2])[:8]:
        print(f"  {wall:7.1f}s  {name}")
    print(f"\n== suite: {n_tests} passed across {len(results)} files in "
          f"{total / 60:.1f} min; {len(bad)} files not green ==")
    for name, status, _, _ in bad:
        print(f"  NOT GREEN: {name} ({status})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
