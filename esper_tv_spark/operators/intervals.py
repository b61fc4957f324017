"""Interval algebra on DataFrames — the rekall layer, re-expressed relationally.

The reference's rekall (/root/reference/app/esper/rekall.py:5,39-47) holds
`{video_id -> IntervalList}` fully materialized in driver memory and applies
operators eagerly in Python per video (noted slow at rekall_query.py:294-296).
Here every operator is a DataFrame -> DataFrame transform over rows
`(key..., start, end, payload...)`:

- per-key sequential logic (coalesce/sessionize)  -> window functions
- binary interval ops (overlaps/minus/merge/join) -> range joins, optionally
  *banded* so Catalyst gets an equi-key and the per-key cross product is
  bounded (the reference's `working_window` band pruning,
  rekall_query.py:133-140, is the same physics — but theirs prunes a Python
  nested loop; ours feeds a distributed hash join)
- order-dependent user folds                      -> applyInPandas (only here)

Start/end are any numeric; for timestamps use integer epoch-micros so all
arithmetic is exact (engine-portable).

Scale notes (100 TB): every operator partitions by the key columns — the
fundamental parallel axis (reference parallelizes the same way across
processes, rekall_parallel.py:40-78). Skewed keys (one 3-hour video vs
10-minute clips) are handled by AQE skew-join for the joins; coalesce is a
single window pass (one shuffle by key). Band width for banded joins should
come from interval-length stats (plans/banding.py).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# unary ops
# --------------------------------------------------------------------------


def coalesce(
    df: DataFrame,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
    gap: int | float = 0,
    payload_aggs: list[Column] | None = None,
) -> DataFrame:
    """Merge overlapping / near-adjacent (within `gap`) intervals per key.

    Rekall `coalesce` (usage: rekall_query.py:217, panels_rekall.py:38,
    commercial_detection_rekall.py:135-138). Sessionization: running max of
    `end` over preceding rows flags group starts; a running sum of flags is
    the group id; one groupBy closes each session. Two shuffle-free window
    passes over one shuffle by key — no driver materialization.

    `dilate(d) >> coalesce() >> dilate(-d)` == coalesce(gap=2*d) — the
    algebraic fusion the reference applies by hand
    (commercial_detection_rekall.py:154-165).
    """
    s, e = F.col(start), F.col(end)
    w_order = Window.partitionBy(*key_cols).orderBy(s.asc(), e.asc())
    w_prev = w_order.rowsBetween(Window.unboundedPreceding, -1)
    with_flag = df.withColumn("__prev_max_end", F.max(e).over(w_prev)).withColumn(
        "__new_grp",
        F.when(F.col("__prev_max_end").isNull() | (s > F.col("__prev_max_end") + F.lit(gap)), 1).otherwise(0),
    )
    with_gid = with_flag.withColumn("__gid", F.sum("__new_grp").over(w_order.rowsBetween(Window.unboundedPreceding, 0)))
    aggs = [F.min(s).alias(start), F.max(e).alias(end)] + list(payload_aggs or [F.count(F.lit(1)).alias("n_merged")])
    return with_gid.groupBy(*key_cols, "__gid").agg(*aggs).drop("__gid")


def dilate(df: DataFrame, amount: int | float, start: str = "start", end: str = "end", clamp_zero: bool = False) -> DataFrame:
    """Expand (or shrink, negative amount) every interval by `amount` on each
    side. Rekall dilate (interview_with_person_x.py:61-64)."""
    new_start = F.col(start) - F.lit(amount)
    if clamp_zero:
        new_start = F.greatest(new_start, F.lit(0))
    return df.withColumn(start, new_start).withColumn(end, F.col(end) + F.lit(amount))


def filter_length(
    df: DataFrame, min_length: int | float = 0, max_length: int | float | None = None, start: str = "start", end: str = "end"
) -> DataFrame:
    """Keep intervals with length in [min_length, max_length]
    (rekall filter_length, interview.py:96-100)."""
    length = F.col(end) - F.col(start)
    cond = length >= F.lit(min_length)
    if max_length is not None:
        cond = cond & (length <= F.lit(max_length))
    return df.where(cond)


def split_intervals(df: DataFrame, max_length: int, start: str = "start", end: str = "end") -> DataFrame:
    """Split long intervals into consecutive chunks of at most `max_length`
    (supercut chunking idiom). flatMap-style via sequence + explode —
    stays in whole-stage codegen."""
    s, e = F.col(start), F.col(end)
    # guard empty/inverted intervals: sequence() with a positive step throws
    # on e <= s at runtime, while the oracle's range() yields an empty set
    chunk_starts = F.when(
        e > s, F.sequence(s, e - F.lit(1), F.lit(max_length))
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("__cs", F.explode(chunk_starts))
        .withColumn(end, F.least(F.col("__cs") + F.lit(max_length), e))
        .withColumn(start, F.col("__cs"))
        .drop("__cs")
    )


def set_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Rekall set_union (commercial_detection_rekall.py:223,240,262-264)."""
    return a.unionByName(b, allowMissingColumns=True)


def count_duration(df: DataFrame, key_cols: list[str] | None = None, start: str = "start", end: str = "end") -> DataFrame:
    """n_intervals + total duration (rekall_query.py:26-46), optionally per key."""
    aggs = [
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col(end) - F.col(start)).alias("total_duration"),
    ]
    return df.groupBy(*key_cols).agg(*aggs) if key_cols else df.agg(*aggs)


# --------------------------------------------------------------------------
# temporal predicates (condition builders for the binary ops)
# --------------------------------------------------------------------------


def t_overlaps(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
    return (a_s < b_e) & (a_e > b_s)


def t_contains(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
    """b contained in a (reference containment: spark.py:122-158)."""
    return (a_s <= b_s) & (b_e <= a_e)


def t_equal(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
    return (a_s == b_s) & (a_e == b_e)


def t_before(max_dist: int | float) -> Callable[[Column, Column, Column, Column], Column]:
    """a ends before b starts, within max_dist (rekall before(max_dist),
    rekall_query.py:130-140)."""

    def pred(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
        return (a_e <= b_s) & (b_s - a_e <= F.lit(max_dist))

    return pred


def t_after(max_dist: int | float) -> Callable[[Column, Column, Column, Column], Column]:
    def pred(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
        return (b_e <= a_s) & (a_s - b_e <= F.lit(max_dist))

    return pred


# --------------------------------------------------------------------------
# binary ops (range joins)
# --------------------------------------------------------------------------


def _prefixed(df: DataFrame, prefix: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])


def interval_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    pred: Callable[[Column, Column, Column, Column], Column] = t_overlaps,
    start: str = "start",
    end: str = "end",
    band: int | str | None = None,
    reach: int = 0,
) -> DataFrame:
    """θ-join on intervals: pairs (a, b) sharing `key_cols` and satisfying
    `pred` on their spans. Output columns are prefixed a_/b_.

    Rekall join(pred, merge_op) (interview.py:118-121) is this plus a
    projection; `overlaps` (rekall_query.py:323-333) is pred=t_overlaps.

    With a band (the scale path), both sides are exploded into W-sized
    buckets and the join becomes an equi-join on (key, band) — the pair is
    emitted only from the bucket containing max(a_start, b_start), so no
    dedup pass is needed. Catalyst gets a hash-joinable key and the
    per-task cross product is bounded by bucket population — the same
    pruning the reference's working_window does for its Python loops
    (rekall_query.py:133-140).

    band=W      explicit width. band="auto" chooses W from interval-length
                stats (plans/banding.choose_band_width — one sampled
                aggregate pass per call site, clamped to >= reach so
                before-style joins don't explode into reach/W bands).
    reach=d     for non-overlapping local predicates (t_before(d),
                t_after(d), or their disjunction with overlaps): BOTH
                sides' spans are extended by d on the right when banding,
                so any pair within gap d shares the bucket of
                max(a_start, b_start). The pred must bound the gap by
                `reach` (t_overlaps alone: reach=0).
    """
    if band == "auto":
        from esper_tv_spark.plans.banding import choose_band_width

        band = max(choose_band_width(a, b, start=start, end=end), reach, 1)
    pa, pb = _prefixed(a, "a_"), _prefixed(b, "b_")
    a_s, a_e = F.col(f"a_{start}"), F.col(f"a_{end}")
    b_s, b_e = F.col(f"b_{start}"), F.col(f"b_{end}")
    cond = pred(a_s, a_e, b_s, b_e)
    keys = [F.col(f"a_{k}") == F.col(f"b_{k}") for k in key_cols]
    if band is None:
        joined = pa.join(pb, keys, "inner").where(cond) if keys else pa.crossJoin(pb).where(cond)
        return joined

    def banded(df: DataFrame, prefix: str, extend: int) -> DataFrame:
        s_col = F.col(f"{prefix}{start}")
        e_col = F.col(f"{prefix}{end}")
        lo_bucket = F.floor(s_col / F.lit(band))
        # Upper bucket = floor(e/W): the FLOAT-SAFE bound.  Every bucket
        # assignment in this join is the same computed map
        # g(x) = floor(x/W); IEEE division and floor are MONOTONE, so for
        # any pair point x with s <= x <= e, g(s) <= g(x) <= g(e) holds
        # unconditionally and the emit bucket g(max(a_s, b_s)) is always
        # inside both sides' exploded ranges.  Two prior "tighter" bounds
        # were both unsound: floor((e-1)/W) assumed INTEGER coordinates
        # (a partner starting inside (e-1, e) was dropped — caught by the
        # r8 skewed-interval fixture, 17,940 pairs short), and the r8 fix
        # ceil(e/W)-1 assumed EXACT arithmetic — it excludes the boundary
        # bucket when e/W is an integer, but IEEE rounding can COLLAPSE a
        # contained point x < e onto that same quotient (hypothesis found
        # b_start = -5e-324, where x/W underflows to -0.0 == e/W, so
        # g(x) = 0 landed outside [g(s), ceil(e/W)-1 = -1]).  floor(e/W)
        # costs at most one extra exploded bucket per interval whose end
        # sits exactly on a bucket boundary; emit_once dedups any pair
        # found in two shared buckets.  `reach` extends the e side
        # inclusively (gap <= reach).
        if extend:
            hi_bucket = F.floor((e_col + F.lit(extend)) / F.lit(band))
        else:
            hi_bucket = F.floor(e_col / F.lit(band))
        return df.withColumn(
            "__band", F.explode(F.sequence(lo_bucket, hi_bucket))
        )

    ja = banded(pa, "a_", reach)
    jb = banded(pb, "b_", reach).withColumnRenamed("__band", "__band_b")
    emit_once = F.col("__band") == F.floor(F.greatest(a_s, b_s) / F.lit(band))
    joined = ja.join(jb, keys + [F.col("__band") == F.col("__band_b")], "inner").where(cond & emit_once)
    return joined.drop("__band", "__band_b")


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
    clip: bool = True,
    band: int | str | None = None,
) -> DataFrame:
    """Overlapping pairs with the clipped intersection span
    (reference interval_overlap_join, spark_util.py:247-269 — there a
    collect()+driver dict; here a range join). Adds overlap_start /
    overlap_end / overlap_length."""
    j = interval_join(a, b, key_cols, t_overlaps, start, end, band)
    j = j.withColumn("overlap_start", F.greatest(F.col(f"a_{start}"), F.col(f"b_{start}"))).withColumn(
        "overlap_end", F.least(F.col(f"a_{end}"), F.col(f"b_{end}"))
    )
    j = j.withColumn("overlap_length", F.col("overlap_end") - F.col("overlap_start"))
    if clip:
        j = j.withColumn(start, F.col("overlap_start")).withColumn(end, F.col("overlap_end"))
    return j


def filter_against(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    pred: Callable[[Column, Column, Column, Column], Column] = t_overlaps,
    start: str = "start",
    end: str = "end",
    anti: bool = False,
) -> DataFrame:
    """Semi-join (or anti-join) of a's intervals against b under a temporal
    predicate — rekall filter_against (rekall_query.py:130-140,
    commercial_detection_rekall.py:193-203). Keeps a's schema."""
    pb = _prefixed(b, "b_")
    a_s, a_e = F.col(start), F.col(end)
    b_s, b_e = F.col(f"b_{start}"), F.col(f"b_{end}")
    keys = [F.col(k) == F.col(f"b_{k}") for k in key_cols]
    cond = keys + [pred(a_s, a_e, b_s, b_e)]
    how = "left_anti" if anti else "left_semi"
    return a.join(pb, cond, how)


def merge_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    pred: Callable[[Column, Column, Column, Column], Column],
    start: str = "start",
    end: str = "end",
    band: int | str | None = None,
    reach: int = 0,
) -> DataFrame:
    """Cross-merge pairs satisfying pred into spanning intervals — rekall
    merge (interview_with_person_x.py:46-57, interview.py:87-93)."""
    j = interval_join(a, b, key_cols, pred, start, end, band, reach)
    out = j
    for k in key_cols:
        out = out.withColumn(k, F.col(f"a_{k}"))
    return (
        out.withColumn(start, F.least(F.col(f"a_{start}"), F.col(f"b_{start}")))
        .withColumn(end, F.greatest(F.col(f"a_{end}"), F.col(f"b_{end}")))
        .select(*key_cols, start, end)
    )


def minus(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
    unique_rows: bool = False,
) -> DataFrame:
    """Interval set-difference A \\ B on the time axis, splitting intervals —
    rekall minus (commercial_detection_rekall.py:199-205,234,
    interview.py:102). SURVEY §2.3 mapped this to an applyInPandas sweep;
    this implementation is stronger: fully relational (coalesce B,
    left-join overlaps, then gaps via a lag window + a per-interval tail),
    so it scales like any join + window.

    Output: a's key columns + (start, end) of the surviving sub-intervals.
    Non-key payload columns of `a` are preserved.

    `unique_rows=True` is the caller's contract that a's rows are unique
    (e.g. a unique event id in the payload): the sweep then windows over
    the full row directly — no distinct, no join-back, two fewer
    exchanges. With the default False, the sweep runs on DISTINCT
    intervals and re-attaches payloads by an equi-join afterwards, which
    both handles duplicate rows and keeps payload bytes out of the sweep.
    Either way there is no monotonically_increasing_id: recomputed ids
    can differ under stage retry, splitting the window groups.
    """
    payload_cols = [c for c in a.columns if c not in {*key_cols, start, end}]
    bc = coalesce(b.select(*key_cols, start, end), key_cols, start, end).drop("n_merged")
    pb = _prefixed(bc, "b_")
    gk = [*key_cols, start, end]
    row_key = list(a.columns) if unique_rows else gk
    a_uniq = a if unique_rows else a.select(*gk).distinct()
    keys = [F.col(k) == F.col(f"b_{k}") for k in key_cols]
    overlap = (F.col(f"b_{start}") < F.col(end)) & (F.col(f"b_{end}") > F.col(start))
    j = a_uniq.join(pb, keys + [overlap], "left")

    # Single window pass over the joined rows (the join subtree is evaluated
    # once — a 3-way union of filtered branches would recompute it 3x):
    # per a-interval, the overlapping b's are disjoint and sorted (B was
    # coalesced), so each joined row emits up to two surviving segments:
    #   - the gap before this b:    [max(lag(b_end), a_start), b_start)
    #   - after the LAST b only:    [b_end, a_end)
    # Unmatched a rows (b_start null) emit themselves unchanged.
    w = Window.partitionBy(*row_key).orderBy(F.col(f"b_{start}"))
    j = j.withColumn("__seg_start", F.coalesce(F.lag(F.col(f"b_{end}")).over(w), F.col(start))).withColumn(
        "__is_last_b", F.lead(F.col(f"b_{start}")).over(w).isNull()
    )
    candidates = F.when(
        F.col(f"b_{start}").isNull(),
        F.array(F.struct(F.col(start).alias("s"), F.col(end).alias("e"))),
    ).otherwise(
        F.filter(
            F.array(
                F.struct(F.col("__seg_start").alias("s"), F.col(f"b_{start}").alias("e")),
                F.struct(
                    F.when(F.col("__is_last_b"), F.col(f"b_{end}")).otherwise(F.lit(None)).alias("s"),
                    F.col(end).alias("e"),
                ),
            ),
            lambda seg: seg["s"].isNotNull() & (seg["e"] > seg["s"]),
        )
    )
    if unique_rows:
        # payloads rode through the sweep on the unique row — emit directly
        return (
            j.select(*key_cols, *payload_cols, F.explode(candidates).alias("__seg"))
            .withColumn(start, F.col("__seg.s"))
            .withColumn(end, F.col("__seg.e"))
            .select(*key_cols, start, end, *payload_cols)
        )
    # re-attach payloads: original rows join their interval's segments (an
    # interval fully covered by B has no segments -> its rows drop, as the
    # inner join encodes; exact-duplicate rows each re-emit every segment —
    # which is why the join-back runs even with no payload columns:
    # returning the distinct segments directly would silently collapse
    # duplicate input rows).
    # segs derives from `a`, so its columns are fully renamed before the
    # join-back — otherwise Spark flags the self-join as ambiguous lineage.
    segs = j.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        F.col(start).alias("__a_start"),
        F.col(end).alias("__a_end"),
        F.explode(candidates).alias("__seg"),
    )
    on = [
        *[F.col(f"__k_{k}").eqNullSafe(F.col(k)) for k in key_cols],
        F.col("__a_start").eqNullSafe(F.col(start)),
        F.col("__a_end").eqNullSafe(F.col(end)),
    ]
    joined = a.join(segs, functools.reduce(lambda x, y: x & y, on))
    return joined.select(
        *key_cols,
        F.col("__seg.s").alias(start),
        F.col("__seg.e").alias(end),
        *payload_cols,
    )


def overlap_measure(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
    out_col: str = "overlap_total",
    coalesce_b: bool = True,
    band: int | str | None = None,
    unique_rows: bool = False,
) -> DataFrame:
    """Annotate each interval of `a` with its total overlap against the set
    `b` (reference annotate_interval_overlap, spark_util.py:594-622 — there a
    broadcast-dict UDF; here a range join + sum(least(e)-greatest(s)), with a
    left join so zero-overlap rows survive with 0).

    With `band` (W or "auto"), the overlap pairs come from the banded
    equi-join scale path instead of the keyed range join; zero-overlap rows
    are restored by joining the per-interval sums back onto the distinct
    a-rows (banding a LEFT join directly would duplicate unmatched rows
    per band)."""
    if coalesce_b:
        b = coalesce(b.select(*key_cols, start, end), key_cols, start, end).drop("n_merged")
    # deterministic duplicate handling instead of a retry-hazardous
    # monotonically_increasing_id (see minus): measure DISTINCT intervals
    # only — one distinct on (key_cols, start, end) — then left-join the
    # per-interval sums back onto the original rows, where duplicates
    # re-expand naturally and payload bytes never enter the overlap
    # join/aggregate at all. `unique_rows=True` (caller's contract that
    # a's rows are unique) skips both the distinct and the join-back and
    # aggregates per full row directly — two fewer exchanges.
    a_cols = list(a.columns)
    gk = [*key_cols, start, end]
    if unique_rows and band is None:
        pb = _prefixed(b, "b_")
        keys = [F.col(k) == F.col(f"b_{k}") for k in key_cols]
        overlap = (F.col(f"b_{start}") < F.col(end)) & (F.col(f"b_{end}") > F.col(start))
        j = a.join(pb, keys + [overlap], "left")
        piece = F.least(F.col(end), F.col(f"b_{end}")) - F.greatest(
            F.col(start), F.col(f"b_{start}")
        )
        return j.groupBy(*a_cols).agg(
            F.sum(F.when(F.col(f"b_{start}").isNotNull(), piece).otherwise(F.lit(0))).alias(
                out_col
            )
        )
    a_iv = a.select(*gk).distinct()
    if band is not None:
        ij = interval_join(
            a_iv, b.select(*key_cols, start, end), key_cols, t_overlaps, start, end, band
        )
        piece = F.least(F.col(f"a_{end}"), F.col(f"b_{end}")) - F.greatest(
            F.col(f"a_{start}"), F.col(f"b_{start}")
        )
        sums = ij.groupBy(*[F.col(f"a_{c}").alias(c) for c in gk]).agg(
            F.sum(piece).alias(out_col)
        )
    else:
        pb = _prefixed(b, "b_")
        keys = [F.col(k) == F.col(f"b_{k}") for k in key_cols]
        overlap = (F.col(f"b_{start}") < F.col(end)) & (F.col(f"b_{end}") > F.col(start))
        j = a_iv.join(pb, keys + [overlap], "left")
        piece = F.least(F.col(end), F.col(f"b_{end}")) - F.greatest(
            F.col(start), F.col(f"b_{start}")
        )
        sums = j.groupBy(*gk).agg(
            F.sum(F.when(F.col(f"b_{start}").isNotNull(), piece).otherwise(F.lit(0))).alias(
                out_col
            )
        )
    # fully rename the derived side before the self-join-back (lineage
    # ambiguity otherwise) and re-expand duplicates via the left join
    sums = sums.select(
        *[F.col(c).alias(f"__k_{c}") for c in gk], F.col(out_col).alias("__sum")
    )
    on = functools.reduce(
        lambda x, y: x & y, [F.col(f"__k_{c}").eqNullSafe(F.col(c)) for c in gk]
    )
    return a.join(sums, on, "left").select(
        *a_cols, F.coalesce(F.col("__sum"), F.lit(0)).alias(out_col)
    )


# --------------------------------------------------------------------------
# order-dependent folds (the one genuinely-sequential rekall op)
# --------------------------------------------------------------------------


def fold_intervals(
    df: DataFrame,
    key_cols: list[str],
    fold_fn: Callable,
    output_schema: str,
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Ordered per-key fold with an arbitrary Python function — rekall
    fold_list (commercial_detection_rekall.py:168-213). Inherently sequential
    per key, so this is the one place we drop to Python. fold_fn:
    pandas.DataFrame (sorted by start, end) -> pandas.DataFrame matching
    output_schema.

    Implementation: repartition by key + sort within partitions, then ONE
    mapInPandas pass that splits groups pandas-side. applyInPandas would pay
    a JVM->Python Arrow round-trip per key — with millions of tiny groups
    (one per video) that per-group overhead dominates the fold itself;
    here each Arrow batch carries many groups and the per-key work is a
    plain Python call. Groups never split across partitions (hash
    repartition by key); they can split across Arrow batches WITHIN a
    partition, so the tail key of every batch is carried into the next.
    """
    import pandas as pd

    part = df.repartition(*[F.col(k) for k in key_cols]).sortWithinPartitions(
        *key_cols, start, end
    )

    def run(batches):
        pending = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            # the last key's group may continue in the next batch: hold it
            last = pdf.iloc[-1]
            mask = pd.Series(True, index=pdf.index)
            for k in key_cols:
                mask &= pdf[k] == last[k]
            pending = pdf[mask]
            head = pdf[~mask]
            for _, g in head.groupby(key_cols, sort=False):
                out = fold_fn(g.reset_index(drop=True))
                if len(out):
                    yield out
        if pending is not None and len(pending):
            for _, g in pending.groupby(key_cols, sort=False):
                out = fold_fn(g.reset_index(drop=True))
                if len(out):
                    yield out

    return part.mapInPandas(run, schema=output_schema)
