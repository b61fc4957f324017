"""Broadcast bloom pre-filter for large-build joins.

When BOTH join sides are too big to broadcast, Spark shuffles both — and at
100 TB the probe side's shuffle is usually the bill. If the join is
selective (most probe rows match nothing), a bloom filter of the build
side's keys can drop non-matching probe rows BEFORE the shuffle: Spark's
own optimizer does this with runtime row-group filters, but only when
statistics trigger it; this module is the explicit, deterministic version
(the same move as Spark's InjectRuntimeFilter / the classic semi-join
reduction).

The bloom is a bitset stored as (word_idx, word) rows — n_bits/64 longs,
a few MB even for 2^26 bits — built with one bounded groupBy (bit_or
partial-aggregates map-side, so the shuffle moves at most n_bits/64 rows
per partition). Probing is k broadcast-hash joins + bit tests: no shuffle,
no Python, whole-stage codegen. False positives only cost wasted shuffle
rows (the real join still decides); false negatives cannot happen, which
the tests assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos(col: Column, seed: int, n_bits: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_bits))


def build_bloom(
    df: DataFrame, key_col: str, n_bits: int = 1 << 22, n_hashes: int = 3
) -> DataFrame:
    """Bloom bitset of df[key_col]: (word_idx, word) rows, n_bits/64 max.
    Size the filter from the build side's distinct-count estimate:
    n_bits ~= 10x distinct keys gives ~1% false positives at k=3."""
    positions = F.array(*[_pos(F.col(key_col), i, n_bits) for i in range(n_hashes)])
    return (
        df.select(F.explode(positions).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            (F.col("__pos") % 64).cast("int").alias("__b"),
        )
        # the python shiftleft() API takes only a literal shift amount
        .select("word_idx", F.expr("shiftleft(CAST(1 AS BIGINT), __b)").alias("__bit"))
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 1 << 22,
    n_hashes: int = 3,
    out_col: str = "__might_contain",
) -> DataFrame:
    """Annotate probe rows with whether the bloom might contain their key:
    k broadcast lookups, zero shuffles on the probe side."""
    out = probe
    checks = []
    for i in range(n_hashes):
        pos = _pos(F.col(key_col), i, n_bits)
        out = out.withColumn(f"__bp_{i}", (pos % 64).cast("int"))
        w = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"__wi_{i}"), F.col("word").alias(f"__w_{i}")
            )
        )
        out = out.join(w, (pos / 64).cast("long") == F.col(f"__wi_{i}"), "left")
        checks.append(
            F.coalesce(
                F.expr(f"(shiftrightunsigned(__w_{i}, __bp_{i}) & 1) = 1"),
                F.lit(False),
            )
        )
        out = out.drop(f"__wi_{i}")
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return out.withColumn(out_col, cond).drop(
        *[f"__w_{i}" for i in range(n_hashes)], *[f"__bp_{i}" for i in range(n_hashes)]
    )


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    n_bits: int = 1 << 22,
    n_hashes: int = 3,
) -> DataFrame:
    """probe ⋈ build with the probe side bloom-thinned first. Semantics
    identical to probe.join(build, on, how) for probe-preserving-or-inner
    join types (no false negatives; survivors re-checked by the real join).
    """
    if how not in ("inner", "left_semi", "right", "right_outer"):
        raise ValueError(
            f"bloom prefilter would drop unmatched probe rows a {how!r} join must keep"
        )
    # the bitset is consumed by k probe lookups: persist it (n_bits/64
    # longs — a few MB) so the build-side agg runs once, not k times
    bloom = build_bloom(build, on, n_bits, n_hashes).cache()
    thinned = bloom_might_contain(probe, bloom, on, n_bits, n_hashes)
    thinned = thinned.where(F.col("__might_contain")).drop("__might_contain")
    return thinned.join(build, on, how)
