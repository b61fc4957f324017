"""Incremental IVF maintenance: streaming inserts against frozen stored
centroids must equal a batch rebuild over the union, and the re-center
compaction must leave a self-consistent, label-preserving index."""

import os

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.operators.similarity import (
    ivf_build_index,
    ivf_probe_index,
    lloyd_assign,
)
from esper_tv_spark.streaming import file_stream
from esper_tv_spark.streaming.ann import ivf_recenter, ivf_stream_insert

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def test_stream_insert_equals_batch_rebuild(spark, tmp_path):
    emb = _emb(spark)
    # base holds the k smallest ids (the rank-based init set), so the
    # union rebuild derives the SAME frozen centroids the stream used
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)

    idx = str(tmp_path / "ivf_stream")
    ivf_build_index(base, idx, n_cells=16)

    src = str(tmp_path / "tail_src")
    tail.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(src)
    tail.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(src, mode="append")
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivf_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    idx_full = str(tmp_path / "ivf_full")
    ivf_build_index(emb, idx_full, n_cells=16)

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    got = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    want = [tuple(r) for r in ivf_probe_index(spark, idx_full, qv, 10, n_probe=3).collect()]
    assert got == want and len(got) == 10

    # the stored posting lists themselves match the full rebuild
    a = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(idx, "cells"))
        .select("id", "cell").collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(idx_full, "cells"))
        .select("id", "cell").collect()
    )
    assert a == b


def test_recenter_is_self_consistent_and_label_preserving(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf_rc")
    ivf_build_index(emb, idx, n_cells=8)
    before_cells = spark.read.parquet(os.path.join(idx, "cells"))
    n_before = before_cells.count()
    labels_before = {
        r["cell"] for r in spark.read.parquet(os.path.join(idx, "centroids"))
        .select("cell").collect()
    }

    ivf_recenter(spark, idx)

    cells = spark.read.parquet(os.path.join(idx, "cells"))
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    assert cells.count() == n_before
    assert {r["cell"] for r in cents.select("cell").collect()} == labels_before

    # self-consistency: every stored posting row sits in the argmin cell
    # of the NEW centroids (the rewrite really did reassign)
    re = lloyd_assign(
        cells.select(F.col("id").alias("vec_id"), F.col("v").alias("embedding")),
        centroids=cents.select(F.col("cell").alias("cluster"), F.col("cv").alias("cvec")),
    )
    mism = (
        cells.select(F.col("id").alias("vec_id"), F.col("cell").alias("stored"))
        .join(re, "vec_id")
        .where(F.col("stored") != F.col("cluster"))
        .count()
    )
    assert mism == 0

    # the probe still runs and returns full k over the re-centered index
    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    assert len(ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()) == 10


def test_recenter_is_deterministic_across_partitionings(spark, tmp_path):
    emb = _emb(spark)
    idx1 = str(tmp_path / "a")
    idx2 = str(tmp_path / "b")
    ivf_build_index(emb, idx1, n_cells=8)
    ivf_build_index(emb.repartition(13), idx2, n_cells=8)
    ivf_recenter(spark, idx1)
    ivf_recenter(spark, idx2)
    c1 = sorted(
        (r["cell"], tuple(r["cv"]))
        for r in spark.read.parquet(os.path.join(idx1, "centroids")).collect()
    )
    c2 = sorted(
        (r["cell"], tuple(r["cv"]))
        for r in spark.read.parquet(os.path.join(idx2, "centroids")).collect()
    )
    assert c1 == c2


@pytest.mark.slow
def test_ivfpq_stream_insert_equals_batch_rebuild(spark, tmp_path):
    from esper_tv_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_probe_index,
    )
    from esper_tv_spark.streaming.ann import ivfpq_stream_insert

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)

    idx = str(tmp_path / "ivfpq_stream")
    ivfpq_build_index(base, idx, n_cells=16, m=8, k=16, dim=64)

    src = str(tmp_path / "tail_src")
    tail.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(src)
    tail.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(src, mode="append")
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivfpq_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    idx_full = str(tmp_path / "ivfpq_full")
    ivfpq_build_index(emb, idx_full, n_cells=16, m=8, k=16, dim=64)

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    got = [tuple(r) for r in ivfpq_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    want = [tuple(r) for r in ivfpq_probe_index(spark, idx_full, qv, 10, n_probe=3).collect()]
    assert got == want and len(got) == 10

    # stored (id, cell, codes) matches the full rebuild exactly
    a = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx, "cells")).collect()
    )
    b = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx_full, "cells")).collect()
    )
    assert a == b


@pytest.mark.slow
def test_ivfpq_residual_stream_insert_equals_batch_rebuild(spark, tmp_path):
    from esper_tv_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_probe_index,
    )
    from esper_tv_spark.streaming.ann import ivfpq_stream_insert

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)

    idx = str(tmp_path / "res_stream")
    ivfpq_build_index(base, idx, n_cells=16, m=8, k=16, dim=64, by_residual=True)

    src = str(tmp_path / "tail_src")
    tail.coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivfpq_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    idx_full = str(tmp_path / "res_full")
    ivfpq_build_index(emb, idx_full, n_cells=16, m=8, k=16, dim=64, by_residual=True)

    a = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx, "cells")).collect()
    )
    b = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx_full, "cells")).collect()
    )
    assert a == b

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    got = [tuple(r) for r in ivfpq_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    want = [tuple(r) for r in ivfpq_probe_index(spark, idx_full, qv, 10, n_probe=3).collect()]
    assert got == want


def test_recenter_recovers_from_mid_swap_crash(spark, tmp_path):
    """A prior run that died between rename(live, old) and rename(tmp,
    live) leaves live MISSING, __old = the previous generation, __rc =
    the complete new generation.  The pre-clean must recover (prefer
    __rc), never delete the only surviving copies."""
    import shutil

    emb = _emb(spark)
    idx = str(tmp_path / "ivf_crash")
    ivf_build_index(emb, idx, n_cells=8)
    cells = os.path.join(idx, "cells")
    n_rows = spark.read.parquet(cells).count()

    # simulate the crash window on the cells dir: __rc is a complete
    # generation (here: a byte-copy of live), live renamed away to __old
    shutil.copytree(cells, cells + "__rc")
    os.rename(cells, cells + "__old")
    assert not os.path.exists(cells)

    ivf_recenter(spark, idx)

    assert spark.read.parquet(cells).count() == n_rows
    for leftover in (cells + "__rc", cells + "__old"):
        assert not os.path.exists(leftover)
    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    assert len(ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()) == 10


def test_recenter_recovers_from_old_when_rc_absent(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "ivf_crash_old")
    ivf_build_index(emb, idx, n_cells=8)
    cells = os.path.join(idx, "cells")
    n_rows = spark.read.parquet(cells).count()
    os.rename(cells, cells + "__old")

    ivf_recenter(spark, idx)

    assert spark.read.parquet(cells).count() == n_rows
    assert not os.path.exists(cells + "__old")


def test_recenter_raises_when_nothing_to_recover(spark, tmp_path):
    import pytest
    import shutil

    emb = _emb(spark)
    idx = str(tmp_path / "ivf_gone")
    ivf_build_index(emb, idx, n_cells=8)
    shutil.rmtree(os.path.join(idx, "cells"))
    with pytest.raises(FileNotFoundError):
        ivf_recenter(spark, idx)


def test_ivfpq_rebuild_crash_cannot_leave_mixed_generation(spark, tmp_path, monkeypatch):
    """An in-place rebuild over a COMPLETE index that crashes mid-build
    must leave an index that FAILS the 'meta.json + codebooks/_SUCCESS'
    completeness check — never old codebooks + new meta."""
    import pytest
    from esper_tv_spark.operators import similarity as sim

    emb = _emb(spark)
    idx = str(tmp_path / "ivfpq_rebuild")
    sim.ivfpq_build_index(emb, idx, n_cells=16, m=8, k=16, dim=64)
    sentinel = os.path.join(idx, "codebooks", "_SUCCESS")
    assert os.path.exists(sentinel) and os.path.exists(os.path.join(idx, "meta.json"))

    def boom(*a, **kw):
        raise RuntimeError("simulated mid-build crash")

    monkeypatch.setattr(sim, "lloyd_assign", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        # a config flip (by_residual) — the dangerous rebuild case
        sim.ivfpq_build_index(emb, idx, n_cells=16, m=8, k=16, dim=64, by_residual=True)

    # the old generation was invalidated BEFORE the crash point: the
    # completeness check a probe-or-rebuild caller uses must now fail
    complete = os.path.exists(sentinel) and os.path.exists(
        os.path.join(idx, "meta.json")
    )
    assert not complete


@pytest.mark.slow
def test_ivfpq_opq_stream_insert_equals_batch_rebuild(spark, tmp_path):
    """OPQ indexes: stream inserts must rotate the micro-batch with the
    persisted rotation, keeping stream==batch bit-identity."""
    from esper_tv_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_probe_index,
        opq_train,
    )
    from esper_tv_spark.streaming.ann import ivfpq_stream_insert

    emb = _emb(spark)
    rot = opq_train(emb, m=8, k=16, dim=64, iters=3, sample_rows=512)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)

    idx = str(tmp_path / "opq_stream")
    ivfpq_build_index(base, idx, n_cells=16, m=8, k=16, dim=64, opq_rotation=rot)

    src = str(tmp_path / "tail_src")
    tail.coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivfpq_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    idx_full = str(tmp_path / "opq_full")
    ivfpq_build_index(emb, idx_full, n_cells=16, m=8, k=16, dim=64, opq_rotation=rot)

    a = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx, "cells")).collect()
    )
    b = sorted(
        (r["id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(os.path.join(idx_full, "cells")).collect()
    )
    assert a == b

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    got = [tuple(r) for r in ivfpq_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    want = [tuple(r) for r in ivfpq_probe_index(spark, idx_full, qv, 10, n_probe=3).collect()]
    assert got == want and len(got) == 10


def test_ivfsq_stream_insert_encodes_identically(spark, tmp_path):
    """IVF-SQ8 stream inserts: codes appended by the stream must be
    bit-identical to batch-encoding the same rows against the SAME
    store (frozen bounds + frozen centroids — bounds are a build-time
    property; out-of-range arrivals clamp, as production SQ does)."""
    from pyspark.sql import functions as PF

    from esper_tv_spark.operators.similarity import (
        _sq_bounds,
        _sq_encode_expr,
        ivfsq_build_index,
        ivfsq_probe_index,
    )
    from esper_tv_spark.streaming.ann import ivfsq_stream_insert

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)

    idx = str(tmp_path / "ivfsq_stream")
    ivfsq_build_index(base, idx, n_cells=16, dim=64)

    src = str(tmp_path / "tail_src")
    tail.coalesce(1).write.parquet(src)
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivfsq_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    mn, mx = _sq_bounds(spark, idx)
    v64 = PF.slice(PF.col("embedding").cast("array<double>"), 1, 64)
    want = {
        r["vec_id"]: tuple(r["codes"])
        for r in tail.select("vec_id", _sq_encode_expr(v64, mn, mx).alias("codes")).collect()
    }
    got = {
        r["id"]: tuple(r["codes"])
        for r in spark.read.parquet(os.path.join(idx, "cells")).collect()
        if r["id"] >= 100
    }
    assert got == want and len(got) > 0

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    assert len(ivfsq_probe_index(spark, idx, qv, 10, n_probe=3).collect()) == 10


def test_compaction_preserves_probe_results_and_collapses_fragments(spark, tmp_path):
    """Streaming inserts fragment the posting lists (one parquet file
    per touched cell per micro-batch); compact_posting_lists rewrites
    hot cells to ONE file each, hard-links already-compact cells across,
    and probe results are bit-identical before/after (compaction never
    changes content)."""
    from esper_tv_spark.streaming.ann import (
        compact_posting_lists,
        posting_fragment_census,
    )

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)
    idx = str(tmp_path / "ivf_compact")
    ivf_build_index(base, idx, n_cells=8)

    src = str(tmp_path / "tail_src")
    for i in range(3):
        tail.where(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            src, mode="append"
        )
    stream = file_stream(spark, src, tail.schema, max_files_per_trigger=1)
    q = ivf_stream_insert(stream, idx, str(tmp_path / "ckpt")).start()
    q.awaitTermination(180)

    before = posting_fragment_census(idx)
    assert max(before.values()) >= 2  # inserts really did fragment

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    want = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    rows_want = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(idx, "cells"))
        .select("id", "cell")
        .collect()
    )

    stats = compact_posting_lists(spark, idx, min_fragments=2)
    after = posting_fragment_census(idx)
    assert max(after.values()) == 1
    assert stats["cells_compacted"] == sum(1 for n in before.values() if n >= 2)
    assert stats["fragments_before"] == sum(before.values())
    assert stats["fragments_after"] == len(after)

    got = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    assert got == want
    rows_got = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(idx, "cells"))
        .select("id", "cell")
        .collect()
    )
    assert rows_got == rows_want
    for leftover in ("cells__rc", "cells__old"):
        assert not os.path.exists(os.path.join(idx, leftover))

    # idempotent: a second run finds nothing hot and rewrites nothing
    stats2 = compact_posting_lists(spark, idx, min_fragments=2)
    assert stats2["cells_compacted"] == 0
    assert stats2["fragments_after"] == stats2["fragments_before"]


def test_compaction_recovers_from_mid_swap_crash(spark, tmp_path):
    """Same recovery contract as ivf_recenter: live missing + complete
    __rc means a prior compaction died inside its swap window — recover
    the new generation, never delete it."""
    import shutil

    from esper_tv_spark.streaming.ann import compact_posting_lists

    emb = _emb(spark)
    idx = str(tmp_path / "ivf_compact_crash")
    ivf_build_index(emb, idx, n_cells=8)
    cells = os.path.join(idx, "cells")
    n_rows = spark.read.parquet(cells).count()

    shutil.copytree(cells, cells + "__rc")
    os.rename(cells, cells + "__old")
    assert not os.path.exists(cells)

    compact_posting_lists(spark, idx, min_fragments=2)

    assert spark.read.parquet(cells).count() == n_rows
    for leftover in (cells + "__rc", cells + "__old"):
        assert not os.path.exists(leftover)


@pytest.mark.slow
def test_compaction_works_on_pq_and_sq_code_layouts(spark, tmp_path):
    """Compaction is schema-agnostic: the same op compacts ivfpq and
    ivfsq posting lists (id + codes) with probe bit-identity."""
    from esper_tv_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_probe_index,
        ivfsq_build_index,
        ivfsq_probe_index,
    )
    from esper_tv_spark.streaming.ann import compact_posting_lists

    emb = _emb(spark)
    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    for kind in ("pq", "sq"):
        idx = str(tmp_path / f"idx_{kind}")
        if kind == "pq":
            ivfpq_build_index(emb, idx, n_cells=8, m=8, k=16, dim=64)
            probe = lambda: ivfpq_probe_index(spark, idx, qv, 10, n_probe=3)
        else:
            ivfsq_build_index(emb, idx, n_cells=8, dim=64)
            probe = lambda: ivfsq_probe_index(spark, idx, qv, 10, n_probe=3)
        want = [tuple(r) for r in probe().collect()]
        stats = compact_posting_lists(spark, idx, min_fragments=1)  # rewrite all
        assert stats["cells_compacted"] == stats["cells_total"]
        assert [tuple(r) for r in probe().collect()] == want, kind


def test_serving_survives_insert_and_compaction_interleaving(spark, tmp_path):
    """The serving-maintenance loop closed end-to-end: build -> batch
    kNN join -> stream-insert -> join sees the new vectors -> compact ->
    join bit-identical to pre-compaction.  This is the lifecycle a
    production index actually lives (serve while ingesting, compact in
    maintenance windows) — each pair of steps is tested elsewhere; this
    guards the INTERLEAVING."""
    from esper_tv_spark.operators.similarity import (
        ivf_build_index,
        ivf_knn_join_index,
    )
    from esper_tv_spark.streaming.ann import (
        compact_posting_lists,
        posting_fragment_census,
    )

    emb = _emb(spark)
    base = emb.where(F.col("vec_id") < 100)
    tail = emb.where(F.col("vec_id") >= 100)
    idx = str(tmp_path / "ivf_loop")
    ivf_build_index(base, idx, n_cells=8)
    queries = emb.where(F.col("vec_id").isin([0, 7])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def topk():
        out = ivf_knn_join_index(spark, idx, queries, 10, n_probe=3)
        got = {}
        for r in out.collect():
            got.setdefault(r["qid"], []).append((r["vec_id"], r["cosine_sim"]))
        return {q: sorted(v, key=lambda t: (-t[1], t[0])) for q, v in got.items()}

    before_insert = topk()
    base_ids = {r["vec_id"] for r in base.select("vec_id").collect()}
    assert all(i in base_ids for rows in before_insert.values() for i, _ in rows)

    src = str(tmp_path / "tail_src")
    for i in range(2):
        tail.where(F.col("vec_id") % 2 == i).coalesce(1).write.parquet(src, mode="append")
    q = ivf_stream_insert(
        file_stream(spark, src, tail.schema, max_files_per_trigger=1),
        idx,
        str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(180)

    after_insert = topk()
    # the inserted tail must be visible to the serving join (the full
    # corpus contains nearer neighbors than the base alone for at least
    # one query on this fixture — assert the result CHANGED and that a
    # tail id appears)
    assert after_insert != before_insert
    assert any(
        i not in base_ids for rows in after_insert.values() for i, _ in rows
    )

    assert max(posting_fragment_census(idx).values()) >= 2
    compact_posting_lists(spark, idx, min_fragments=2)
    assert topk() == after_insert
    assert max(posting_fragment_census(idx).values()) == 1


# ---------------------------------------------------------- logical deletes


@pytest.mark.slow
def test_ann_delete_hides_ids_from_every_probe_path(spark, tmp_path):
    """Tombstoned ids must vanish from single probes AND batch joins on
    all three index layouts — the anti-join is applied at the posting
    scan, so every serving path inherits it.  Undeleted rows are
    untouched (the probe minus the deleted ids equals the pre-delete
    probe minus those same rows)."""
    from esper_tv_spark.operators.similarity import (
        ivf_knn_join_index,
        ivfpq_build_index,
        ivfpq_probe_index,
        ivfsq_build_index,
        ivfsq_probe_index,
    )
    from esper_tv_spark.streaming.ann import ann_delete

    emb = _emb(spark)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    cases = [
        (
            "ivf",
            lambda p: ivf_build_index(emb, p, n_cells=8),
            lambda p: ivf_probe_index(spark, p, qv, 10, n_probe=3),
        ),
        (
            "ivfpq",
            lambda p: ivfpq_build_index(emb, p, n_cells=8, m=8, k=16, dim=64),
            lambda p: ivfpq_probe_index(spark, p, qv, 10, n_probe=3),
        ),
        (
            "ivfsq",
            lambda p: ivfsq_build_index(emb, p, n_cells=8, dim=64),
            lambda p: ivfsq_probe_index(spark, p, qv, 10, n_probe=3),
        ),
    ]
    for name, build, probe in cases:
        idx = str(tmp_path / name)
        build(idx)
        before = [tuple(r) for r in probe(idx).collect()]
        victims = {int(before[0][0]), int(before[2][0])}
        ann_delete(spark, idx, sorted(victims))
        after = [tuple(r) for r in probe(idx).collect()]
        got_ids = {int(r[0]) for r in after}
        assert not (victims & got_ids), name
        # survivors keep their rows and order
        survivors = [r for r in before if int(r[0]) not in victims]
        assert after[: len(survivors)] == survivors, name

    # batch join path (ivf): per-query rows drop the tombstoned ids too
    queries = emb.where(F.col("vec_id").isin([0, 7])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ivf_knn_join_index(spark, str(tmp_path / "ivf"), queries, 10, n_probe=3)
    got = {int(r["vec_id"]) for r in out.collect()}
    deleted_ivf = {
        int(r["id"])
        for r in spark.read.parquet(str(tmp_path / "ivf" / "tombstones")).collect()
    }
    assert not (deleted_ivf & got)


def test_purge_applies_tombstones_physically_and_retires_them(spark, tmp_path):
    """compact_posting_lists(purge=True) must rewrite every cell with
    the tombstoned rows dropped, remove the tombstone table, and leave
    probe results bit-identical to the logical-delete view."""
    from esper_tv_spark.streaming.ann import ann_delete, compact_posting_lists

    emb = _emb(spark)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    idx = str(tmp_path / "ivf_purge")
    ivf_build_index(emb, idx, n_cells=8)
    n_before = spark.read.parquet(os.path.join(idx, "cells")).count()
    ann_delete(spark, idx, [0, 7, 13])
    logical = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    stats = compact_posting_lists(spark, idx, purge=True)
    assert stats["purged_ids"] == 3
    assert not os.path.exists(os.path.join(idx, "tombstones"))
    assert spark.read.parquet(os.path.join(idx, "cells")).count() == n_before - 3
    physical = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    assert physical == logical
    # purge is idempotent: a second purge with no tombstones is a
    # fragment-only compaction
    stats2 = compact_posting_lists(spark, idx, purge=True)
    assert "purged_ids" not in stats2


def test_recenter_applies_and_retires_tombstones(spark, tmp_path):
    """ivf_recenter is a full rewrite: tombstoned vectors must neither
    survive in the rewritten posting lists nor contribute to the new
    centroid means — recentering after a delete equals recentering an
    index that never contained the deleted rows."""
    from esper_tv_spark.streaming.ann import ann_delete

    emb = _emb(spark)
    with_del = str(tmp_path / "with_del")
    never_had = str(tmp_path / "never_had")
    ivf_build_index(emb, with_del, n_cells=8)
    ann_delete(spark, with_del, [50, 60])
    ivf_recenter(spark, with_del)
    assert not os.path.exists(os.path.join(with_del, "tombstones"))

    ivf_build_index(emb, never_had, n_cells=8)
    # drop the same rows physically, then recenter — the two indexes must
    # agree on centroids AND postings
    import shutil

    from esper_tv_spark.streaming.ann import compact_posting_lists

    ann_delete(spark, never_had, [50, 60])
    compact_posting_lists(spark, never_had, purge=True)
    ivf_recenter(spark, never_had)

    def snap(idx):
        cents = sorted(
            (int(r["cell"]), tuple(r["cv"]))
            for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
        )
        cells = sorted(
            (int(r["id"]), int(r["cell"]))
            for r in spark.read.parquet(os.path.join(idx, "cells"))
            .select("id", "cell")
            .collect()
        )
        return cents, cells

    assert snap(with_del) == snap(never_had)


def test_ann_delete_validation(spark, tmp_path):
    import pytest

    from esper_tv_spark.streaming.ann import ann_delete

    emb = _emb(spark)
    idx = str(tmp_path / "ivf_val")
    ivf_build_index(emb, idx, n_cells=8)
    with pytest.raises(ValueError, match="empty"):
        ann_delete(spark, idx, [])
    for bad in ([1.5], [True], ["x"]):
        with pytest.raises(ValueError, match="not an int"):
            ann_delete(spark, idx, bad)


# ---------------------------------------------------------------------------
# census-driven centroid retirement (_retire_empty_cells) — r9
# ---------------------------------------------------------------------------


def _victim_and_probe(spark, idx, qv):
    from esper_tv_spark.operators import similarity as sim

    cents, _allowed = sim._probe_centroids(spark, idx, [0], [qv], 1, 6)
    pairs, _cells, _cv = sim._rank_probe_cells(cents, [0], [qv], 1, 6)
    return int(pairs[0][1])


def test_retirement_drops_dead_centroid_and_frees_probe_slot(spark, tmp_path):
    """Emptying the query's own top-1 cell and retiring it must (a)
    remove that centroid row, (b) change the probe result — the freed
    top-n_probe slot admits the NEXT live cell's candidates — and (c)
    equal a probe whose ranking simply never saw the dead cell."""
    from esper_tv_spark.operators import similarity as sim
    from esper_tv_spark.streaming.ann import ann_delete, compact_posting_lists

    emb = _emb(spark)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).select("embedding").first()[0]]
    idx = str(tmp_path / "ret")
    ivf_build_index(emb, idx, n_cells=8)
    victim = _victim_and_probe(spark, idx, qv)
    victim_ids = [
        int(r["id"])
        for r in spark.read.parquet(os.path.join(idx, "cells", f"cell={victim}"))
        .select("id").collect()
    ]
    before = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    ann_delete(spark, idx, victim_ids)
    stats = compact_posting_lists(spark, idx, purge=True, retire_empty_cells=True)
    assert stats["cells_retired"] == 1
    remaining = {
        int(r["cell"])
        for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    assert victim not in remaining and len(remaining) == 7
    after = [tuple(r) for r in ivf_probe_index(spark, idx, qv, 10, n_probe=3).collect()]
    assert after != before
    # oracle: rank over the surviving centroid table directly
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    _pairs, cells, _cv = sim._rank_probe_cells(cents, [0], [qv], 3, 6)
    assert victim not in cells
    # second pass retires nothing (idempotent)
    assert compact_posting_lists(spark, idx, retire_empty_cells=True)["cells_retired"] == 0


@pytest.mark.slow
def test_retirement_preserves_two_level_layout(spark, tmp_path):
    """Retiring a cell of a TWO-LEVEL index must keep the grp partition
    column (probes partition-prune the centroid read) and leave groups/
    untouched — level-1 centers are quantizer structure, not corpus
    state."""
    from esper_tv_spark.streaming.ann import ann_delete, compact_posting_lists

    emb = _emb(spark)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).select("embedding").first()[0]]
    idx = str(tmp_path / "ret_hier")
    ivf_build_index(emb, idx, n_cells=16, n_groups=4)
    groups_before = sorted(
        (int(r["grp"]), list(r["gv"]))
        for r in spark.read.parquet(os.path.join(idx, "groups")).collect()
    )
    victim = _victim_and_probe(spark, idx, qv)
    victim_ids = [
        int(r["id"])
        for r in spark.read.parquet(os.path.join(idx, "cells", f"cell={victim}"))
        .select("id").collect()
    ]
    ann_delete(spark, idx, victim_ids)
    stats = compact_posting_lists(spark, idx, purge=True, retire_empty_cells=True)
    assert stats["cells_retired"] == 1
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    assert "grp" in cents.columns
    assert victim not in {int(r["cell"]) for r in cents.collect()}
    groups_after = sorted(
        (int(r["grp"]), list(r["gv"]))
        for r in spark.read.parquet(os.path.join(idx, "groups")).collect()
    )
    assert groups_after == groups_before
    # hier probe still answers at full coverage
    assert len(ivf_probe_index(spark, idx, qv, 10, n_probe=3, n_probe_groups=4).collect()) == 10


def test_retirement_refuses_fully_dead_index(spark, tmp_path):
    """An index whose every cell is empty must raise, not write an empty
    centroid table (probes would rank zero cells silently)."""
    import pytest

    from esper_tv_spark.streaming.ann import ann_delete, compact_posting_lists

    emb = _emb(spark).where(F.col("vec_id") < 50)
    idx = str(tmp_path / "dead")
    ivf_build_index(emb, idx, n_cells=4)
    all_ids = [int(r["vec_id"]) for r in emb.select("vec_id").collect()]
    ann_delete(spark, idx, all_ids)
    with pytest.raises(ValueError, match="every cell"):
        compact_posting_lists(spark, idx, purge=True, retire_empty_cells=True)


def test_retirement_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between rename(live, __rtold) and rename(__rt, live)
    leaves no live centroids dir; the next retirement pass must recover
    the complete new generation from __rt."""
    import shutil

    from esper_tv_spark.streaming.ann import (
        ann_delete,
        compact_posting_lists,
        _retire_empty_cells,
    )

    emb = _emb(spark)
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).select("embedding").first()[0]]
    idx = str(tmp_path / "crash")
    ivf_build_index(emb, idx, n_cells=8)
    victim = _victim_and_probe(spark, idx, qv)
    victim_ids = [
        int(r["id"])
        for r in spark.read.parquet(os.path.join(idx, "cells", f"cell={victim}"))
        .select("id").collect()
    ]
    ann_delete(spark, idx, victim_ids)
    compact_posting_lists(spark, idx, purge=True, retire_empty_cells=True)
    want = sorted(
        (int(r["cell"]), list(r["cv"]))
        for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    )
    # simulate the crash window: live renamed away, __rt holds the new gen
    cents = os.path.join(idx, "centroids")
    shutil.copytree(cents, cents + "__rt")
    os.rename(cents, cents + "__rtold")
    assert _retire_empty_cells(spark, idx) == 0  # recovery, nothing new dead
    got = sorted(
        (int(r["cell"]), list(r["cv"]))
        for r in spark.read.parquet(cents).collect()
    )
    assert got == want and not os.path.exists(cents + "__rtold")
