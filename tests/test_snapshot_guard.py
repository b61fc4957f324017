"""Snapshot-order guard: the round close must refuse when source changed
after PLAN_AUDIT.md / bench_out.json were generated (the round-5/6
stale-audit failure mode)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from snapshot_guard import stale_artifacts  # noqa: E402


def _mk(path, mtime):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("x")
    os.utime(path, (mtime, mtime))


def test_fresh_snapshot_passes(tmp_path):
    repo = str(tmp_path)
    t = time.time()
    _mk(os.path.join(repo, "esper_tv_spark", "operators", "foo.py"), t - 100)
    _mk(os.path.join(repo, "__spark_entry__.py"), t - 100)
    _mk(os.path.join(repo, "bench.py"), t - 100)
    _mk(os.path.join(repo, "PLAN_AUDIT.md"), t - 10)
    _mk(os.path.join(repo, "bench_out.json"), t - 5)
    assert stale_artifacts(repo) == []


def test_post_audit_source_commit_fails(tmp_path):
    repo = str(tmp_path)
    t = time.time()
    _mk(os.path.join(repo, "__spark_entry__.py"), t - 100)
    _mk(os.path.join(repo, "PLAN_AUDIT.md"), t - 50)
    _mk(os.path.join(repo, "bench_out.json"), t - 40)
    # the late commit: a source file newer than both artifacts
    _mk(os.path.join(repo, "esper_tv_spark", "operators", "late.py"), t - 1)
    off = stale_artifacts(repo)
    assert ("PLAN_AUDIT.md", os.path.join("esper_tv_spark", "operators", "late.py")) in off
    assert ("bench_out.json", os.path.join("esper_tv_spark", "operators", "late.py")) in off


def test_missing_artifact_is_an_offense(tmp_path):
    repo = str(tmp_path)
    _mk(os.path.join(repo, "__spark_entry__.py"), time.time() - 100)
    _mk(os.path.join(repo, "bench_out.json"), time.time())
    off = stale_artifacts(repo)
    assert any(a == "PLAN_AUDIT.md" and "missing" in s for a, s in off)


def test_pycache_ignored(tmp_path):
    repo = str(tmp_path)
    t = time.time()
    _mk(os.path.join(repo, "__spark_entry__.py"), t - 100)
    _mk(os.path.join(repo, "PLAN_AUDIT.md"), t - 50)
    _mk(os.path.join(repo, "bench_out.json"), t - 40)
    _mk(os.path.join(repo, "esper_tv_spark", "__pycache__", "x.py"), t)
    assert stale_artifacts(repo) == []


def test_content_hash_survives_mtime_rewrite(tmp_path):
    """The r8 hardening: a fresh clone / checkout rewrites mtimes but not
    content — with a recorded state sidecar the guard judges by sha256
    and passes; touching an artifact no longer defeats it."""
    from snapshot_guard import changed_sources, record_state

    repo = str(tmp_path)
    t = time.time()
    src = os.path.join(repo, "esper_tv_spark", "operators", "foo.py")
    _mk(src, t - 100)
    _mk(os.path.join(repo, "__spark_entry__.py"), t - 100)
    record_state(repo)
    assert changed_sources(repo) == []
    # mtime rewrite (clone/checkout): content identical -> still fresh
    os.utime(src, (t + 100, t + 100))
    assert changed_sources(repo) == []
    # real content change -> flagged, regardless of any artifact touch
    with open(src, "w") as f:
        f.write("y")
    assert changed_sources(repo) == [os.path.join("esper_tv_spark", "operators", "foo.py")]
    # added file -> flagged
    _mk(os.path.join(repo, "bench.py"), t)
    assert os.path.join("bench.py") in changed_sources(repo)


def test_no_sidecar_falls_back_to_mtime(tmp_path):
    from snapshot_guard import changed_sources

    _mk(os.path.join(str(tmp_path), "__spark_entry__.py"), time.time())
    assert changed_sources(str(tmp_path)) is None
