"""Aggregation helpers.

Re-expresses the reference's driver-side aggregation workarounds as native
Spark aggregations:

- sum_over_column (prob-weighted E/Var; /root/reference/app/esper/
  spark_util.py:629-663) -> weighted_sum_var: two column exprs + groupBy.sum.
- sum_distinct_over_column (driver-side set dedup, spark_util.py:666-727,
  whose comment claims "Spark does not have an easy way") ->
  dropDuplicates + groupBy.sum — fully native, distributed.
- argmax per group (driver dict scan, spark_util.py:741-778) ->
  row_number() window.
- bucketized CDF percentile (spark_util.py:432-464) -> percent_rank()
  window — exact, no 10k-bucket approximation, no driver round-trip.

Exact deterministic sums
------------------------
`exact_sum` sums fixed-decimal data (money columns, 2-decimal measures) as
scaled BIGINTs and divides once at the end. Integer summation is associative,
so the result is bit-identical no matter how Spark partitions the data or in
which order DuckDB accumulates — double sums are not, and an
order-of-accumulation wobble in the 15th digit would break value-hash
comparison between engines. At 100 TB this also means partial (map-side)
aggregation of longs, which is cheaper than doubles and immune to the
catastrophic-cancellation issues of large float sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact scaled-integer sums (deterministic across engines/partitionings)
# --------------------------------------------------------------------------

def exact_sum(col: Column | str, decimals: int = 2) -> Column:
    """Sum a fixed-decimal double column exactly via scaled-bigint sum.

    Result is a double equal to sum(col) with the final division as the only
    floating-point operation.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**decimals
    return F.sum(F.round(c * F.lit(scale)).cast("long")).cast("double") / F.lit(float(scale))


def exact_avg(col: Column | str, decimals: int = 2) -> Column:
    """Average of a fixed-decimal column: exact sum, then /count."""
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**decimals
    s = F.sum(F.round(c * F.lit(scale)).cast("long")).cast("double") / F.lit(float(scale))
    return s / F.count(c).cast("double")


def exact_sum_sql(expr: str, decimals: int = 2) -> str:
    """ANSI-SQL text equivalent of exact_sum, for DuckDB oracles."""
    scale = 10**decimals
    return f"CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {float(scale)}"


def exact_avg_sql(expr: str, decimals: int = 2) -> str:
    scale = 10**decimals
    return (
        f"(CAST(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {float(scale)})"
        f" / CAST(count({expr}) AS DOUBLE)"
    )


# --------------------------------------------------------------------------
# probability-weighted aggregation (Bernoulli screen-time model)
# --------------------------------------------------------------------------

def weighted_sum_var(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    prob_col: str,
    value_decimals: int = 2,
    prob_decimals: int = 2,
) -> DataFrame:
    """E = sum(p*x), Var = sum(p*(1-p)*x^2) per group.

    Reference: sum_over_column, /root/reference/app/esper/spark_util.py:629-663
    and spark_identity.py:52-60. There it is two withColumns plus a
    groupBy.sum; here additionally made bit-deterministic with scaled-int
    sums (inputs are fixed-decimal).
    """
    x, p = F.col(value_col), F.col(prob_col)
    exp_d = value_decimals + prob_decimals
    var_d = 2 * value_decimals + 2 * prob_decimals
    return df.groupBy(*group_cols).agg(
        exact_sum(p * x, exp_d).alias("expected_sum"),
        exact_sum(p * (F.lit(1.0) - p) * x * x, var_d).alias("variance_sum"),
    )


def weighted_sum_var_sql(
    table_expr: str,
    group_cols: list[str],
    value_expr: str,
    prob_expr: str,
    value_decimals: int = 2,
    prob_decimals: int = 2,
) -> str:
    exp_d = value_decimals + prob_decimals
    var_d = 2 * value_decimals + 2 * prob_decimals
    gc = ", ".join(group_cols)
    return f"""
        SELECT {gc},
               {exact_sum_sql(f'({prob_expr}) * ({value_expr})', exp_d)} AS expected_sum,
               {exact_sum_sql(f'({prob_expr}) * (1.0 - ({prob_expr})) * ({value_expr}) * ({value_expr})', var_d)} AS variance_sum
        FROM {table_expr}
        GROUP BY {gc}
    """


# --------------------------------------------------------------------------
# distinct-key aggregation
# --------------------------------------------------------------------------

def sum_distinct_over_column(
    df: DataFrame,
    distinct_cols: list[str],
    sum_col: str,
    group_cols: list[str] | None = None,
    decimals: int = 2,
) -> DataFrame:
    """Sum one row per distinct key tuple (reference spark_util.py:666-727
    collected all rows to a driver-side set; this is dropDuplicates +
    groupBy.sum, fully distributed — the dedup is a shuffle on the distinct
    key, the sum piggybacks map-side partials)."""
    deduped = df.dropDuplicates(distinct_cols)
    if group_cols:
        return deduped.groupBy(*group_cols).agg(exact_sum(sum_col, decimals).alias(f"sum_{sum_col}"))
    return deduped.agg(exact_sum(sum_col, decimals).alias(f"sum_{sum_col}"))


def count_distinct_over_column(df: DataFrame, distinct_cols: list[str], group_cols: list[str] | None = None) -> DataFrame:
    """countDistinct wrapper (reference spark_util.py:730-738)."""
    agg = F.countDistinct(*[F.col(c) for c in distinct_cols]).alias("n_distinct")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


# --------------------------------------------------------------------------
# window-backed helpers
# --------------------------------------------------------------------------

def argmax_per_group(df: DataFrame, group_cols: list[str], order_col: str, tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Keep the max-`order_col` row per group (reference argmax was a driver
    dict scan, spark_util.py:741-778; also groupBy.agg(max) at
    spark_identity.py:36-50). row_number over a composite ordering makes the
    winner deterministic under ties."""
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def percentile_rank(df: DataFrame, partition_cols: list[str], value_col: str, out_col: str = "pct_rank") -> DataFrame:
    """Exact percentile within partition (replaces the reference's
    10k-bucket histogram CDF + driver UDF lookup, spark_util.py:432-464)."""
    w = Window.partitionBy(*partition_cols).orderBy(F.col(value_col))
    return df.withColumn(out_col, F.percent_rank().over(w))


def exact_quantiles(
    df,
    col: str,
    qs: list[float],
    buckets: int = 4096,
    max_rows_exact: int = 200_000,
    max_iters: int = 16,
):
    """EXACT discrete quantiles at corpus scale via histogram refinement —
    the distributed alternative to both a full global sort (what
    percent_rank costs) and an approximate sketch (what approx_percentile
    returns).  Semantics: for each q, the value whose 1-based rank in the
    ascending sort is ceil(q * n) (DuckDB's ``quantile_disc``) — exact,
    deterministic, partitioning-independent.

    Algorithm (classic iterative bisection / distributed k-th statistic):
    per refinement round, one exact integer histogram over the live
    candidate set's range; the bucket holding the target rank becomes the
    next candidate set.  The NEXT round's filter is the SAME floor-bucket
    expression that produced the counts — never a reconstructed `v >= lo`
    range, whose float boundary can disagree with floor((v-lo)/width) at
    the last ulp and silently shift the rank offset.  Termination:
    min == max (dense ties — the candidate IS the answer), candidate
    count <= max_rows_exact (exact k-th smallest via TakeOrdered), or
    ~buckets x narrowing per round.  No global sort; no shuffle wider
    than `buckets` rows.

    Job-count shape (r10, guide §1.2 — identical values, fewer passes):
    quantiles sharing a candidate set share its jobs — all qs start on
    `base`, so round 1 is ONE aggregate + ONE histogram for the whole
    list (the original looped quantiles independently: 3 quantiles paid
    round 1 three times) — and each histogram also carries per-bucket
    min/max/count, which ARE the next round's (lo, hi, total) over the
    chosen bucket (same rows, same aggregates), so the per-round
    (count, min, max) pass disappears entirely.  Measured at the q125
    pin (buckets=64, max_rows_exact=500, sf0.1): ~20 jobs -> 8,
    1.69s -> ~0.9s, same output.

    Returns a list of (q, value) floats (driver-small by construction),
    in input order.
    """
    import math

    from pyspark.sql import functions as F

    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError("quantiles must be in (0, 1]")
    base = df.where(F.col(col).isNotNull()).select(F.col(col).alias("v"))
    st = base.agg(
        F.count("v").alias("c"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n = st["c"]
    if n == 0:
        return []
    out: dict[int, tuple[float, float]] = {}
    # groups of quantiles sharing one candidate set: (cand, lo, hi, total,
    # [(slot, q, k), ...]) — all quantiles start on `base` together
    groups = [
        (base, float(st["lo"]), float(st["hi"]), n,
         [(i, q, max(1, math.ceil(q * n))) for i, q in enumerate(qs)])
    ]
    for _ in range(max_iters):
        if not groups:
            break
        next_groups = []
        for cand, lo, hi, total, members in groups:
            if lo == hi:
                for slot, q, _k in members:
                    out[slot] = (q, lo)
                continue
            if total <= max_rows_exact:
                for slot, q, k in members:
                    kth = (
                        cand.orderBy("v").limit(k)
                        .agg(F.max("v").alias("m")).collect()[0]["m"]
                    )
                    out[slot] = (q, float(kth))
                continue
            width = (hi - lo) / buckets
            bucket = F.least(
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
                F.lit(buckets - 1),
            )
            stats = {
                r["b"]: (r["c"], float(r["blo"]), float(r["bhi"]))
                for r in cand.groupBy(bucket.alias("b")).agg(
                    F.count(F.lit(1)).alias("c"),
                    F.min("v").alias("blo"),
                    F.max("v").alias("bhi"),
                ).collect()
            }
            # walk each member's rank to its bucket; members landing in
            # the same bucket share the next round's jobs
            by_bucket: dict[int, list] = {}
            for slot, q, k in members:
                cum = 0
                placed = False
                for b in range(buckets):
                    cb = stats.get(b, (0,))[0]
                    if cum + cb >= k:
                        by_bucket.setdefault(b, []).append((slot, q, k - cum))
                        placed = True
                        break
                    cum += cb
                if not placed:
                    # bucket counts sum to `total` >= k by construction, so
                    # an unplaced member means the histogram lost rows (e.g.
                    # a float boundary) — fail HERE naming the quantile
                    # instead of an opaque KeyError at the end
                    raise RuntimeError(
                        f"exact_quantiles failed to converge: quantile {q} "
                        f"(rank {k}) not reachable in histogram summing "
                        f"{cum} < {k} over [{lo}, {hi}]"
                    )
            for b, mem in by_bucket.items():
                cb, blo, bhi = stats[b]
                next_groups.append(
                    (cand.where(bucket == F.lit(b)), blo, bhi, cb, mem)
                )
        groups = next_groups
    if groups:
        raise RuntimeError("exact_quantiles failed to converge")
    return [out[i] for i in range(len(qs))]
