"""Snapshot-order guard: refuse a round close when any SOURCE file is
newer than the snapshot artifacts (PLAN_AUDIT.md / bench_out.json).

The failure mode this fences (it happened in rounds 5 AND 6): the
end-of-round snapshot (rotate_window -> audit_plans -> bench) runs, then
one more source commit lands — and the committed PLAN_AUDIT.md now
describes LAST week's plans while CORRECTNESS/BENCH run on HEAD.  Round
6 survived only because the late commits happened not to change any
plan shape (verified by hand-cross-checking 30 exchange counts).

Usage:  python tools/snapshot_guard.py        # exit 1 + offender list
The one-command snapshot (tools/snapshot.py) runs this as its LAST step.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# everything that can change a query plan or a bench number
SOURCE_GLOBS = ("esper_tv_spark", "__spark_entry__.py", "bench.py")
ARTIFACTS = ("PLAN_AUDIT.md", "bench_out.json")


def source_files(repo: str = REPO) -> list[str]:
    out: list[str] = []
    for g in SOURCE_GLOBS:
        p = os.path.join(repo, g)
        if os.path.isfile(p):
            out.append(p)
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                if "__pycache__" in root:
                    continue
                out.extend(
                    os.path.join(root, f) for f in files if f.endswith(".py")
                )
    return out


def stale_artifacts(repo: str = REPO) -> list[tuple[str, str]]:
    """(artifact, offending source) pairs where the source file's mtime is
    NEWER than the artifact's — i.e. the artifact describes stale code.
    A missing artifact is itself an offense (the snapshot never ran)."""
    offenses: list[tuple[str, str]] = []
    srcs = [(p, os.path.getmtime(p)) for p in source_files(repo)]
    for art in ARTIFACTS:
        ap = os.path.join(repo, art)
        if not os.path.exists(ap):
            offenses.append((art, "<artifact missing — snapshot never ran>"))
            continue
        amt = os.path.getmtime(ap)
        offenses.extend(
            (art, os.path.relpath(p, repo)) for p, mt in srcs if mt > amt
        )
    return offenses


def main() -> int:
    offenses = stale_artifacts()
    if not offenses:
        print("snapshot_guard: PASS — all snapshot artifacts newer than source")
        return 0
    print("snapshot_guard: FAIL — source changed AFTER the snapshot artifacts")
    print("re-run the snapshot (python tools/snapshot.py) as the LAST step before the round-close commit")
    for art, src in sorted(set(offenses)):
        print(f"  {art} is older than {src}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
