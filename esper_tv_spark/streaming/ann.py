"""Incremental maintenance for the persisted IVF index.

Completes the streaming story for the ANN family (reference pattern:
face_embeddings.py:74-96 — a frozen embedding store that repeated queries
probe; new embeddings arrive continuously in the reference's ingest
pipeline, embed_kernel.py batch jobs): new vectors are folded into the
`ivf_build_index` store as they arrive, and an offline compaction step
re-centers the cells when drift accumulates.

Two halves:

- `ivf_stream_insert` — a Structured Streaming foreachBatch sink that
  assigns each micro-batch against the STORED (frozen) centroids and
  appends posting rows to ``cells/`` partitioned by cell.  Because the
  centroids are frozen, stream-inserting a tail of the corpus is
  bit-identical to rebuilding the index over the union (as long as the
  rank-based init set — the k smallest-id vectors — is in the base
  build), which is exactly what the stream==batch test asserts.  At
  100 TB the insert path touches only the micro-batch: one broadcast of
  n_cells centroids, one map-side argmin, one partitioned append — no
  read of the existing posting lists.

- `ivf_recenter` — the offline compaction every IVF deployment runs: new
  centroid = elementwise mean of the cell's posting vectors, then ONE
  reassignment pass rewrites the posting lists against the new centroids
  (a single Lloyd iteration as maintenance).  The mean is computed over
  scaled BIGINTs (round to `round_digits`, scale, exact integer sum) so
  the result is accumulation-order-free — deterministic under any
  partitioning, any engine.  Shuffle shape: posexplode to (cell, pos)
  partial sums — map-side combine reduces the exchange to
  n_cells x dim rows regardless of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esper_tv_spark.operators.similarity import dot, lloyd_assign


def _require_dirs_layout(index_path: str, op: str) -> None:
    """Streaming maintenance (insert fragments / per-cell compaction /
    recenter's per-cell moves / fragment census) operates on the
    hive-partitioned `cells/` layout.  The SORTED object-store layout
    (`cells_sorted/`, similarity._write_posting) is the frozen serving
    layout — its corpora are REBUILT, not streamed into — so every
    maintenance op fails closed with a pointer instead of silently
    appending rows the sorted reader would still serve but the dir-based
    maintenance bookkeeping would never see."""
    if os.path.isdir(os.path.join(index_path, "cells_sorted")):
        raise ValueError(
            f"{op}: index at {index_path} uses the sorted (object-store) "
            "posting layout — streaming maintenance runs on the dirs "
            "layout; rebuild with layout='dirs' or rebuild the sorted "
            "index from the updated corpus"
        )


def _stored_centroids(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_path, "centroids")).select(
        F.col("cell").alias("cluster"), F.col("cv").alias("cvec")
    )


def _posting_rows(
    batch_df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    assigned = lloyd_assign(
        batch_df, centroids=centroids, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    ).withColumnRenamed("cluster", "cell")
    vecs = batch_df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
    return assigned.select(F.col(id_col).alias("id"), "cell").join(vecs, "id")


def ivf_stream_insert(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
):
    """Return a ready-to-start writeStream that folds arriving vectors
    into an `ivf_build_index` store: per micro-batch, assign against the
    stored frozen centroids and append (cell, id, v, norm) posting rows
    PARTITIONED BY cell.  Centroids are re-read per batch (tiny table) so
    an `ivf_recenter` between batches takes effect on the next trigger.

    Delivery: the checkpoint makes the file source exactly-once per
    batch; a crash BETWEEN the parquet append and the checkpoint commit
    can replay one batch's appends (at-least-once, the same contract as
    the ledger sink in streaming/ingest.py) — probes dedup on id if the
    producer can re-deliver."""

    _require_dirs_layout(index_path, "ivf_stream_insert")

    def insert(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        cents = _stored_centroids(spark, index_path)
        (
            _posting_rows(batch_df, cents, id_col, vec_col, round_digits)
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(index_path, "cells"))
        )

    return (
        stream_df.writeStream.foreachBatch(insert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def ivfpq_stream_insert(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
):
    """Incremental maintenance for the FUSED IVF-PQ index
    (similarity.ivfpq_build_index): per micro-batch, assign the coarse
    cell against the stored frozen centroids AND encode the PQ code ranks
    against the stored frozen codebooks, then append (id, codes) posting
    rows PARTITIONED BY cell.  Both the coarse centroids and the
    codebooks are rank-based from the k smallest-id vectors, so as long
    as the base build contains that init set, stream-inserting a tail is
    bit-identical to rebuilding over the union (the stream==batch test).
    At 100 TB the insert path touches only the micro-batch: two tiny
    broadcast joins (n_cells centroids, m*k codebooks), one partitioned
    append — never a read of the existing posting lists."""
    from esper_tv_spark.operators.similarity import pq_encode_with_codebooks

    _require_dirs_layout(index_path, "ivfpq_stream_insert")

    def insert(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        from esper_tv_spark.operators.similarity import (
            _ivfpq_meta,
            _ivfpq_rotation,
            rotate_vectors,
        )

        spark = batch_df.sparkSession
        meta = _ivfpq_meta(index_path)
        by_residual = meta["by_residual"]
        if meta["opq"]:
            # an OPQ index lives in rotated space: rotate the micro-batch
            # with the SAME persisted rotation the build used, so stream
            # inserts stay bit-identical to a batch rebuild
            batch_df = rotate_vectors(
                batch_df,
                _ivfpq_rotation(spark, index_path),
                id_col,
                vec_col,
                round_digits,
            )
        cents = _stored_centroids(spark, index_path)
        cb = spark.read.parquet(os.path.join(index_path, "codebooks"))
        assigned = lloyd_assign(
            batch_df, centroids=cents, id_col=id_col, vec_col=vec_col,
            round_digits=round_digits,
        ).withColumnRenamed("cluster", "cell")
        if by_residual:
            from esper_tv_spark.operators.similarity import residual_vectors

            enc_in = residual_vectors(
                batch_df,
                assigned,
                cents.select(F.col("cluster").alias("cell"), F.col("cvec").alias("cv")),
                id_col,
                vec_col,
            )
            codes = pq_encode_with_codebooks(
                enc_in, cb, id_col=id_col, vec_col="__rv", round_digits=round_digits
            )
        else:
            codes = pq_encode_with_codebooks(
                batch_df, cb, id_col=id_col, vec_col=vec_col, round_digits=round_digits
            )
        (
            assigned.select(F.col(id_col).alias("id"), "cell")
            .join(codes, "id")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(index_path, "cells"))
        )

    return (
        stream_df.writeStream.foreachBatch(insert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def ivfsq_stream_insert(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
):
    """Incremental maintenance for the IVF-SQ8 index
    (similarity.ivfsq_build_index): per micro-batch, assign the coarse
    cell against the stored frozen centroids and SQ-encode against the
    stored FROZEN per-dimension bounds, then append (id, codes) rows
    PARTITIONED BY cell.  The bounds are a build-time property — a
    vector outside the frozen range CLAMPS to code 0/255, exactly what
    every production scalar quantizer does (re-fitting bounds is a
    rebuild, not an insert).  The encode expression is the same
    `_sq_encode_expr` the batch build uses, so inserted codes are
    bit-identical to batch-encoding the same rows against the same
    store (asserted in tests/test_streaming_ann.py)."""
    import json

    from esper_tv_spark.operators.similarity import _sq_bounds, _sq_encode_expr

    _require_dirs_layout(index_path, "ivfsq_stream_insert")

    def insert(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        with open(os.path.join(index_path, "meta.json")) as f:
            dim = int(json.load(f)["dim"])
        mn, mx = _sq_bounds(spark, index_path)
        cents = _stored_centroids(spark, index_path)
        assigned = lloyd_assign(
            batch_df, centroids=cents, id_col=id_col, vec_col=vec_col,
            round_digits=round_digits,
        ).withColumnRenamed("cluster", "cell")
        v64 = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
        codes = batch_df.select(
            F.col(id_col).alias("id"), _sq_encode_expr(v64, mn, mx).alias("codes")
        )
        (
            assigned.select(F.col(id_col).alias("id"), "cell")
            .join(codes, "id")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(index_path, "cells"))
        )

    return (
        stream_df.writeStream.foreachBatch(insert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def ann_delete(spark: SparkSession, index_path: str, ids: "list[int]") -> int:
    """LOGICAL delete from a persisted index (ivf / ivfpq / ivfsq): append
    the ids to a `tombstones/` table — O(ids), no posting-list I/O.  A
    physical delete at 100 TB is a full-corpus rewrite (an id's cell is
    unknown without scanning), so production ANN systems tombstone and
    let maintenance reclaim: every probe anti-joins the (broadcast,
    deduplicated) tombstone set (similarity._apply_tombstones), and
    `compact_posting_lists(purge=True)` physically drops the rows and
    clears the table.

    Contract: vector ids are unique and never reused — re-inserting a
    tombstoned id would stay hidden until a purge (the same id-space
    assumption every builder makes).  Duplicate ids in `ids` or across
    calls are harmless (the anti-join deduplicates)."""
    vals = []
    for i in ids:
        if isinstance(i, bool) or not isinstance(i, int):
            raise ValueError(f"ann_delete: id {i!r} is not an int")
        vals.append((i,))
    if not vals:
        raise ValueError("ann_delete: empty id list")
    (
        spark.createDataFrame(vals, "id long")
        .coalesce(1)
        .write.mode("append")
        .parquet(os.path.join(index_path, "tombstones"))
    )
    return len(vals)


def posting_fragment_census(index_path: str) -> dict[int, int]:
    """cell -> parquet fragment count for a persisted index's posting
    lists — the small-files health metric every streaming-insert
    deployment watches: each `*_stream_insert` micro-batch APPENDS one
    parquet fragment per touched cell, so a long-running ingest turns a
    probe's pruned scan into thousands of tiny file opens (the classic
    100 TB small-files problem).  Pure driver-side directory metadata —
    zero data read, no Spark job."""
    _require_dirs_layout(index_path, "posting_fragment_census")
    cells_dir = os.path.join(index_path, "cells")
    census: dict[int, int] = {}
    for entry in os.scandir(cells_dir):
        if not entry.is_dir() or not entry.name.startswith("cell="):
            continue
        n = sum(
            1
            for f in os.scandir(entry.path)
            if f.is_file() and f.name.endswith(".parquet")
        )
        census[int(entry.name.split("=", 1)[1])] = n
    return census


def _retire_empty_cells(spark: SparkSession, index_path: str) -> int:
    """Remove centroid rows whose cells hold ZERO live posting rows — the
    census-driven retirement pass `compact_posting_lists` runs when
    `retire_empty_cells=True`.  A purge that empties a cell leaves its
    centroid ranked by every probe: a dead cell in the top-n_probe is a
    wasted probe slot (the posting read skips missing dirs, so the probe
    silently returns fewer candidates than it paid for).  Retirement
    makes the quantizer's live surface match the corpus: probes rank
    only cells that can answer.

    Scope and contract:
    - detection is the fragment census (a dead cell has no `cell=<c>/`
      dir — a purge's repartitioned write emits no dir for an emptied
      cell), so retirement is idempotent and also catches cells emptied
      by PRIOR purges;
    - only `centroids/` is rewritten (two-level layout preserved:
      partitionBy grp).  `groups/` is quantizer STRUCTURE, not corpus
      state — level-1 centers stay, and a group whose cells all died
      simply stops winning cell ranks;
    - retirement is permanent until `ivf_recenter`/rebuild: stream
      inserts assign against the remaining centroids, so a retired
      cell's id space cannot be resurrected (same id-uniqueness
      contract as ann_delete);
    - crash-safe: the rewrite joins the same write-aside two-rename
      discipline; a crash before the swap leaves dead centroids ranked
      (correct, just wasteful) and the next retirement pass fixes it.

    Returns the number of retired cells (0 when none).  Raises on a
    fully-dead index — an empty centroid table would make every probe
    rank zero cells, which should be a loud lifecycle error, not an
    empty result."""
    import shutil

    cents_dir = os.path.join(index_path, "centroids")
    # crash recovery for a PRIOR retirement's swap window
    if os.path.exists(cents_dir):
        for suffix in ("__rt", "__rtold"):
            shutil.rmtree(cents_dir + suffix, ignore_errors=True)
    elif os.path.exists(cents_dir + "__rt"):
        os.rename(cents_dir + "__rt", cents_dir)
        shutil.rmtree(cents_dir + "__rtold", ignore_errors=True)
    elif os.path.exists(cents_dir + "__rtold"):
        os.rename(cents_dir + "__rtold", cents_dir)
    live = set(posting_fragment_census(index_path))
    cents = spark.read.parquet(cents_dir)
    persisted = sorted(int(r["cell"]) for r in cents.select("cell").collect())
    dead = sorted(set(persisted) - live)
    if not dead:
        return 0
    if len(dead) == len(persisted):
        raise ValueError(
            f"_retire_empty_cells: every cell of {index_path} is empty — "
            "refusing to write an empty centroid table (rebuild or drop "
            "the index instead)"
        )
    keep = cents.where(~F.col("cell").isin([int(c) for c in dead]))
    hier = os.path.isdir(os.path.join(index_path, "groups"))
    tmp = cents_dir + "__rt"
    if hier:
        keep.select("grp", "cell", "cv").write.mode("overwrite").partitionBy(
            "grp"
        ).parquet(tmp)
    else:
        keep.select("cell", "cv").write.mode("overwrite").parquet(tmp)
    old = cents_dir + "__rtold"
    os.rename(cents_dir, old)
    os.rename(tmp, cents_dir)
    shutil.rmtree(old)
    return len(dead)


def compact_posting_lists(
    spark: SparkSession, index_path: str, min_fragments: int = 2,
    purge: bool = False, retire_empty_cells: bool = False,
) -> dict:
    """Compact fragmented posting-list partitions down to ONE parquet
    file per cell — the maintenance op that closes the streaming-insert
    loop (insert appends fragments; recenter fixes drift; THIS fixes
    file count).  Works unchanged on all three index layouts (ivf raw
    vectors, ivfpq codes, ivfsq codes): compaction is schema-agnostic —
    it rewrites rows, it never interprets them.

    Only cells with >= `min_fragments` fragments are REWRITTEN (one
    partition-pruned scan + one hash repartition on `cell`, so each cell
    lands in exactly one task = one output file); already-compact cells'
    fragments are HARD-LINKED into the new generation (driver-side
    metadata only, no data movement — at 100 TB rewriting every cell to
    fix a few hot ones would be a full-corpus I/O pass).  The new
    generation is then swapped in with the same crash-safe two-rename
    discipline as `ivf_recenter` (write-aside __rc -> rename live to
    __old -> rename __rc to live -> drop __old), including the same
    recovery preamble: a crash inside a PRIOR compaction's swap window
    is recovered (prefer __rc, fall back to __old), never deleted.
    Compaction never changes CONTENT — probe results are bit-identical
    before and after (asserted in tests/test_streaming_ann.py).

    `purge=True` additionally applies the index's `tombstones/` table
    (ann_delete) PHYSICALLY: every cell is rewritten with the
    tombstoned ids dropped (a tombstoned id's cell is unknown, so a
    purge is by definition a full rewrite — that is why deletes are
    logical in the first place), and the tombstone table is removed
    AFTER the swap.  Crash between swap and removal is safe: the
    tombstones re-apply to already-purged postings as a no-op
    anti-join.  Probe results are bit-identical before/after a purge
    (the anti-join was already hiding the rows — asserted in tests).

    `retire_empty_cells=True` additionally runs `_retire_empty_cells`
    AFTER the swap: centroids of cells left with zero live rows are
    dropped from the ranking surface (see that docstring for scope and
    the probe-slot argument).  Off by default — retirement legitimately
    CHANGES probe results (a freed slot admits the next live cell), so
    the bit-identical-across-purge contract (q102) holds only without
    it.

    Returns {"cells_total", "cells_compacted", "fragments_before",
    "fragments_after"} (+ "purged_ids" when purging, + "cells_retired"
    when retiring)."""
    import shutil

    _require_dirs_layout(index_path, "compact_posting_lists")
    cells_dir = os.path.join(index_path, "cells")
    tomb_dir = os.path.join(index_path, "tombstones")
    tomb_ids: "list[int]" = []
    if purge and os.path.isdir(tomb_dir):
        tomb_ids = [
            int(r["id"])
            for r in spark.read.parquet(tomb_dir).select("id").distinct().collect()
        ]
    # recovery preamble — identical contract to ivf_recenter's: only
    # clean __rc/__old when live exists; otherwise they ARE the index.
    if os.path.exists(cells_dir):
        for suffix in ("__rc", "__old"):
            shutil.rmtree(cells_dir + suffix, ignore_errors=True)
    elif os.path.exists(cells_dir + "__rc"):
        os.rename(cells_dir + "__rc", cells_dir)
        shutil.rmtree(cells_dir + "__old", ignore_errors=True)
    elif os.path.exists(cells_dir + "__old"):
        os.rename(cells_dir + "__old", cells_dir)
    else:
        raise FileNotFoundError(
            f"compact_posting_lists: {cells_dir} missing and no __rc/__old "
            "to recover from"
        )
    census = posting_fragment_census(index_path)
    if tomb_ids:
        # a purge rewrites EVERY cell (the tombstoned ids' cells are
        # unknown) — min_fragments no longer gates
        hot = sorted(census)
    else:
        hot = sorted(c for c, n in census.items() if n >= min_fragments)
    stats = {
        "cells_total": len(census),
        "cells_compacted": len(hot),
        "fragments_before": sum(census.values()),
    }
    if tomb_ids:
        stats["purged_ids"] = len(tomb_ids)
    if not hot:
        stats["fragments_after"] = stats["fragments_before"]
        if retire_empty_cells:
            stats["cells_retired"] = _retire_empty_cells(spark, index_path)
        return stats

    tmp = cells_dir + "__rc"
    rewrite = spark.read.parquet(cells_dir).where(F.col("cell").isin(hot))
    if tomb_ids:
        tomb = (
            spark.read.parquet(tomb_dir)
            .select(F.col("id").alias("__tomb_id"))
            .distinct()
        )
        rewrite = rewrite.join(
            F.broadcast(tomb), rewrite["id"] == F.col("__tomb_id"), "left_anti"
        )
    (
        rewrite
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
    # carry the already-compact cells across via hard links (fall back
    # to copy on filesystems without link support)
    for cell, n in census.items():
        if cell in set(hot):
            continue
        src_dir = os.path.join(cells_dir, f"cell={cell}")
        dst_dir = os.path.join(tmp, f"cell={cell}")
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.scandir(src_dir):
            if not (f.is_file() and f.name.endswith(".parquet")):
                continue
            dst = os.path.join(dst_dir, f.name)
            try:
                os.link(f.path, dst)
            except OSError:
                shutil.copy2(f.path, dst)

    old = cells_dir + "__old"
    os.rename(cells_dir, old)
    os.rename(tmp, cells_dir)
    shutil.rmtree(old)
    if tomb_ids:
        # AFTER the swap: a crash here leaves tombstones over purged
        # postings — the anti-join re-applies as a no-op, never loses a
        # delete
        shutil.rmtree(tomb_dir, ignore_errors=True)
    if retire_empty_cells:
        stats["cells_retired"] = _retire_empty_cells(spark, index_path)
    stats["fragments_after"] = sum(posting_fragment_census(index_path).values())
    return stats


def ivf_recenter(
    spark: SparkSession, index_path: str, round_digits: int = 6,
    group_train_iters: int = 0,
) -> None:
    """One Lloyd iteration as offline compaction: recompute each cell's
    centroid as the deterministic elementwise mean of its posting
    vectors, then reassign ALL posting rows against the new centroids and
    rewrite both tables (write-aside then swap — never overwrite a table
    being read).  Cell LABELS are preserved (mean of cell c keeps label
    c), so probes and the census keep their key space.

    Determinism: each element is rounded at `round_digits` and scaled to
    BIGINT before the sum, so partial aggregation order cannot change the
    mean; the final divide + round returns to double once.

    TWO-LEVEL indexes (a `groups/` table is present — see
    similarity._write_centroids): the new centroids get REGROUPED against
    the same n_groups via `_group_centers` — pass the index's
    `group_train_iters` (recorded in ivfpq/ivfsq meta.json; raw IVF
    callers state it) to keep a TRAINED grouping trained across the
    rewrite, else the regroup silently reverts to rank-init seeds — and
    `groups/` joins the crash-safe swap: stale level-1 centers over
    recentered cells would silently mis-prune probes."""
    import shutil

    _require_dirs_layout(index_path, "ivf_recenter")
    scale = float(10 ** round_digits)
    cells_dir = os.path.join(index_path, "cells")
    cents_dir = os.path.join(index_path, "centroids")
    groups_dir = os.path.join(index_path, "groups")
    # pre-clean leftovers from a crashed prior run — but ONLY when the
    # live dir still exists.  If live is missing, the prior run died
    # inside its swap window (between rename(live, old) and
    # rename(tmp, live)); in that window __rc is the COMPLETE new
    # generation (the swap loop only starts after every __rc write
    # finished) and __old is the only other surviving copy — deleting
    # either would destroy the index.  Recover instead: prefer __rc,
    # fall back to __old.  Any cells/cents generation mismatch the
    # recovery leaves behind is corrected by this very run, which
    # recomputes centroids from the posting rows regardless.
    dirs = [cells_dir, cents_dir]
    if any(os.path.exists(groups_dir + s) for s in ("", "__rc", "__old")):
        dirs.append(groups_dir)
    for d in dirs:
        if os.path.exists(d):
            for suffix in ("__rc", "__old"):
                shutil.rmtree(d + suffix, ignore_errors=True)
        elif os.path.exists(d + "__rc"):
            os.rename(d + "__rc", d)
            shutil.rmtree(d + "__old", ignore_errors=True)
        elif os.path.exists(d + "__old"):
            os.rename(d + "__old", d)
        else:
            raise FileNotFoundError(
                f"ivf_recenter: {d} missing and no __rc/__old to recover from"
            )
    hier = groups_dir in dirs
    posting = spark.read.parquet(cells_dir)
    # recenter is a full rewrite: apply (and then retire) any logical
    # deletes — keeping tombstoned vectors would bake them into the new
    # centroid means AND resurrect them in the rewritten posting lists
    tomb_dir = os.path.join(index_path, "tombstones")
    had_tombstones = os.path.isdir(tomb_dir)
    if had_tombstones:
        tomb = (
            spark.read.parquet(tomb_dir)
            .select(F.col("id").alias("__tomb_id"))
            .distinct()
        )
        posting = posting.join(
            F.broadcast(tomb), posting["id"] == F.col("__tomb_id"), "left_anti"
        )

    elem = posting.select(
        "cell", "id", F.posexplode(F.col("v")).alias("pos", "x")
    ).select(
        "cell",
        "pos",
        F.round(F.round(F.col("x"), round_digits) * F.lit(scale), 0)
        .cast("long")
        .alias("sx"),
    )
    means = (
        elem.groupBy("cell", "pos")
        .agg(F.sum("sx").alias("ssum"), F.count(F.lit(1)).alias("n"))
        .select(
            "cell",
            "pos",
            F.round((F.col("ssum") / F.col("n")) / F.lit(scale), round_digits).alias("m"),
        )
    )
    new_cents = (
        means.groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
    )
    cents_tmp = cents_dir + "__rc"
    swaps = [(cells_dir, cells_dir + "__rc"), (cents_dir, cents_tmp)]
    if hier:
        from esper_tv_spark.operators.similarity import _group_centers

        n_groups = spark.read.parquet(groups_dir).count()
        groups_tmp = groups_dir + "__rc"
        gdf = _group_centers(new_cents, n_groups, round_digits, group_train_iters)
        gdf.write.mode("overwrite").parquet(groups_tmp)
        (
            lloyd_assign(
                new_cents,
                centroids=spark.read.parquet(groups_tmp).select(
                    F.col("grp").alias("cluster"), F.col("gv").alias("cvec")
                ),
                id_col="cell", vec_col="cv", round_digits=round_digits,
            )
            .withColumnRenamed("cluster", "grp")
            .join(new_cents, "cell")
            .select("grp", "cell", "cv")
            .write.mode("overwrite")
            .partitionBy("grp")
            .parquet(cents_tmp)
        )
        swaps.append((groups_dir, groups_tmp))
    else:
        new_cents.write.mode("overwrite").parquet(cents_tmp)

    fresh = spark.read.parquet(cents_tmp).select(
        F.col("cell").alias("cluster"), F.col("cv").alias("cvec")
    )
    vec_in = posting.select(F.col("id").alias("vec_id"), F.col("v").alias("embedding"))
    cells_tmp = cells_dir + "__rc"
    (
        _posting_rows(vec_in, fresh, "vec_id", "embedding", round_digits)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(cells_tmp)
    )

    for live, tmp in swaps:
        old = live + "__old"
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)
    if had_tombstones:
        # after the swap, same contract as compact(purge=True): a crash
        # before this line re-applies the tombstones as a no-op
        shutil.rmtree(tomb_dir, ignore_errors=True)
