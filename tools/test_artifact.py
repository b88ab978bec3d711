"""Capture a pytest run as a committed, machine-readable artifact.

ADVICE r3: BENCH/MULTICHIP claims are backed by JSON artifacts with rc and
output tails, but test-suite claims ("92/92 green", "cold 7:22") were
README prose.  This runs the suite the way CI would (CPU, 8 virtual
devices) and writes TESTS_r{N}.json with the exit code, the pytest summary
line, and wall time, so pass status and timing are reproducible from the
repo history.

    python tools/test_artifact.py --out TESTS_r04.json            # fast suite
    python tools/test_artifact.py --slow --out TESTS_r04.json     # + slow
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time


def run_suite(marker_args: list, env: dict) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *marker_args],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    wall = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-6:]
    summary = next((l for l in reversed(tail)
                    if re.search(r"\d+ (passed|failed|error)", l)), "")
    return {"rc": proc.returncode, "seconds": round(wall, 1),
            "summary": summary.strip("= "), "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TESTS_r04.json")
    ap.add_argument("--slow", action="store_true",
                    help="also run the slow (nightly) marker set")
    args = ap.parse_args()

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    result = {"fast": run_suite(["-m", "not slow"], env)}
    if args.slow:
        result["slow"] = run_suite(["-m", "slow"], env)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    ok = all(v["rc"] == 0 for v in result.values())
    print(json.dumps(result, indent=1))
    print(f"-> {args.out}  ok={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
