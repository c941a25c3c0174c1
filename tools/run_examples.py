"""Run every example end-to-end as a gate: `python tools/run_examples.py`.

Each example owns its Ray session, so they run as subprocesses in
sequence; a non-zero exit or a missing OK line fails the gate. This is
the cheap rehearsal for "a user runs the demo scripts" (the verify
skill's drive recipe covers the library surface; this covers the
narrative entry points)."""

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    fails = []
    examples = sorted(glob.glob(os.path.join(REPO, "examples", "*.py")))
    for path in examples:
        name = os.path.basename(path)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, path],
            cwd="/tmp",
            env={**os.environ, "PYTHONPATH": REPO},
            capture_output=True,
            text=True,
            timeout=900,
        )
        dt = time.time() - t0
        if proc.returncode != 0:
            fails.append(name)
            print(f"FAIL {name} rc={proc.returncode} ({dt:.1f}s)")
            print(proc.stderr[-2000:])
        else:
            tail = [ln for ln in proc.stdout.strip().splitlines()
                    if ln and "INFO" not in ln][-1:]
            print(f"OK   {name} ({dt:.1f}s) {tail[0] if tail else ''}")
    print(f"{len(examples) - len(fails)}/{len(examples)} examples OK")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
