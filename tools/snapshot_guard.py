"""Snapshot-order guard: refuse a round close when the SOURCE tree has
changed since the snapshot artifacts (PLAN_AUDIT.md / bench_out.json)
were generated.

The failure mode this fences (it happened in rounds 5 AND 6): the
end-of-round snapshot (rotate_window -> audit_plans -> bench) runs, then
one more source commit lands — and the committed PLAN_AUDIT.md now
describes LAST week's plans while CORRECTNESS/BENCH run on HEAD.  Round
6 survived only because the late commits happened not to change any
plan shape (verified by hand-cross-checking 30 exchange counts).

Freshness is judged by CONTENT, not mtime: `tools/snapshot.py` records a
sha256 over every source file's bytes in `.snapshot_state.json` after
the bench step, and the guard recomputes it.  (The r1-r7 guard compared
filesystem mtimes — a fresh clone or branch checkout rewrote source
mtimes and failed a genuinely-fresh snapshot, while `touch
bench_out.json` trivially defeated it.)  When the sidecar is missing
(pre-r8 snapshot), the mtime comparison remains as the fallback.

Usage:  python tools/snapshot_guard.py            # exit 1 + offender list
        python tools/snapshot_guard.py --record   # write .snapshot_state.json
The one-command snapshot (tools/snapshot.py) records then verifies as
its LAST step.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# everything that can change a query plan or a bench number
SOURCE_GLOBS = ("esper_tv_spark", "__spark_entry__.py", "bench.py")
ARTIFACTS = ("PLAN_AUDIT.md", "bench_out.json")
STATE_FILE = ".snapshot_state.json"


def source_digests(repo: str = REPO) -> dict[str, str]:
    """relpath -> sha256 of file bytes, for every source file."""
    out: dict[str, str] = {}
    for p in source_files(repo):
        with open(p, "rb") as f:
            out[os.path.relpath(p, repo)] = hashlib.sha256(f.read()).hexdigest()
    return out


def record_state(repo: str = REPO) -> None:
    with open(os.path.join(repo, STATE_FILE), "w") as f:
        json.dump({"source_sha256": source_digests(repo)}, f, indent=0, sort_keys=True)


def changed_sources(repo: str = REPO) -> list[str] | None:
    """Source files whose CONTENT differs from the recorded snapshot
    state (added/removed files count as changed).  None when no state
    sidecar exists — caller falls back to the mtime heuristic."""
    sp = os.path.join(repo, STATE_FILE)
    if not os.path.exists(sp):
        return None
    with open(sp) as f:
        recorded = json.load(f).get("source_sha256", {})
    now = source_digests(repo)
    return sorted(
        p for p in set(recorded) | set(now) if recorded.get(p) != now.get(p)
    )


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
    if "--record" in sys.argv:
        record_state()
        print(f"snapshot_guard: recorded source content hashes to {STATE_FILE}")
        return 0
    for art in ARTIFACTS:
        if not os.path.exists(os.path.join(REPO, art)):
            print(f"snapshot_guard: FAIL — {art} missing (snapshot never ran)")
            return 1
    changed = changed_sources()
    if changed is not None:
        if not changed:
            print("snapshot_guard: PASS — source content unchanged since snapshot")
            return 0
        print("snapshot_guard: FAIL — source CONTENT changed since the snapshot")
        print("re-run the snapshot (python tools/snapshot.py) as the LAST step before the round-close commit")
        for p in changed:
            print(f"  changed: {p}")
        return 1
    # no content sidecar (pre-r8 snapshot) — fall back to mtimes
    offenses = stale_artifacts()
    if not offenses:
        print("snapshot_guard: PASS (mtime fallback) — artifacts newer than source")
        return 0
    print("snapshot_guard: FAIL — source changed AFTER the snapshot artifacts")
    print("re-run the snapshot (python tools/snapshot.py) as the LAST step before the round-close commit")
    for art, src in sorted(set(offenses)):
        print(f"  {art} is older than {src}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
