"""ONE-COMMAND end-of-round snapshot.  Runs, in the required order:

  1. tools/rotate_window.py --apply   (diff-driven driver-window rotation —
                                       this REWRITES __spark_entry__.py)
  2. tools/snapshot_guard.py --record (baseline the source content NOW,
                                       after rotation, before any artifact)
  3. tools/audit_plans.py             (regenerate PLAN_AUDIT.md from HEAD)
  4. bench.py                         (refresh bench_out.json)
  5. tools/snapshot_guard.py          (refuse if source changed vs step 2)

Recording BEFORE audit/bench (not after, as r8 did) means a source edit
landing DURING the snapshot run fails the final guard instead of being
silently baselined — the r8 ordering made the in-run guard tautological.

Exit status is non-zero if ANY step fails — the round-close commit should
not happen on a failed snapshot.  If you touch source after this ran,
run it AGAIN (the guard in step 5 is also what catches you if you don't).

Usage: python tools/snapshot.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("rotate_window", [sys.executable, "tools/rotate_window.py", "--apply"]),
    ("snapshot_record", [sys.executable, "tools/snapshot_guard.py", "--record"]),
    ("audit_plans", [sys.executable, "tools/audit_plans.py"]),
    ("bench", [sys.executable, "bench.py"]),
    ("snapshot_guard", [sys.executable, "tools/snapshot_guard.py"]),
]


def main() -> int:
    for name, cmd in STEPS:
        t0 = time.time()
        print(f"== snapshot step: {name} ==", flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        print(f"== {name}: rc={r.returncode} ({time.time() - t0:.0f}s) ==", flush=True)
        if r.returncode != 0:
            print(f"snapshot: FAILED at {name}")
            return r.returncode or 1
    print("snapshot: PASS — safe to make the round-close commit now")
    return 0


if __name__ == "__main__":
    sys.exit(main())
