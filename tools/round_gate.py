"""The end-of-round hard gate as ONE command (VERDICT r10 item 2 made
executable): run AFTER the last code commit of a round —

    python tools/round_gate.py            # full gate (~30 min)
    python tools/round_gate.py --fast     # skip pytest (~8 min)

Runs, in order, and stops at the first failure:
  1. full pytest          (the r10 escape: a stale contract test shipped
                           because no full suite ran after the round's
                           first commit — this step exists so that can
                           never recur)
  2. check_correctness    --default-session (the driver's t2 gate, all
                           registered queries vs DuckDB @ sf0.01)
  3. check_types          (Spark vs DuckDB result-dtype parity)
  4. bench.py             (one JSON line; EXPECTED_SEC gates inside)

Prints a summary block to paste into NOTES.md's "State (round N)".
Exit code 0 only if every step passed.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(name: str, cmd: list[str]) -> tuple[bool, str, float]:
    t0 = time.monotonic()
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=False
    )
    dt = time.monotonic() - t0
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
    ok = proc.returncode == 0
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({dt:.0f}s)\n{tail}\n")
    return ok, tail, dt


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    steps = []
    if not fast:
        steps.append(("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]))
    steps += [
        ("check_correctness",
         [sys.executable, "tools/check_correctness.py", "--default-session"]),
        ("check_types", [sys.executable, "tools/check_types.py"]),
        ("bench", [sys.executable, "bench.py"]),
    ]
    results = []
    for name, cmd in steps:
        ok, tail, dt = run(name, cmd)
        results.append((name, ok, tail, dt))
        if not ok:
            print(f"ROUND GATE: FAILED at {name} — fix before the round ends")
            return 1
    print("ROUND GATE: ALL GREEN — paste into NOTES.md State section:")
    for name, _, tail, dt in results:
        last = tail.splitlines()[-1] if tail else ""
        print(f"  {name}: {last} ({dt:.0f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
