"""Salting helpers: salted results must equal unsalted results."""

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.plans.salting import replicated_skew_join, salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 is hot: 5000 rows; keys 1-9 have 10 each
    hot = spark.range(5000).select(F.lit(0).alias("k"), (F.col("id") % 100).alias("v"))
    rest = (
        spark.range(90)
        .select((F.col("id") % 9 + 1).alias("k"), (F.col("id") % 7).alias("v"))
    )
    return hot.unionByName(rest)


def test_salted_agg_equals_plain(spark, skewed):
    aggs = {
        "total": (F.col("v"), "sum"),
        "n": (F.col("v"), "count"),
        "vmin": (F.col("v"), "min"),
        "vmax": (F.col("v"), "max"),
    }
    got = {r["k"]: (r["total"], r["n"], r["vmin"], r["vmax"]) for r in salted_agg(skewed, ["k"], aggs, n_salts=8).collect()}
    want = {
        r["k"]: (r["total"], r["n"], r["vmin"], r["vmax"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"a": (F.col("v"), "avg")})


def test_replicated_skew_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([(i, f"name_{i}") for i in range(10)], "k long, name string")
    got = sorted(
        tuple(r) for r in replicated_skew_join(skewed, dim, ["k"], n_salts=4).collect()
    )
    want = sorted(tuple(r) for r in skewed.join(dim, "k").collect())
    assert got == want
    # the salted plan replicates the build side: row count preserved exactly
    assert len(got) == 5090


def test_replicated_skew_join_rejects_outer_on_build(spark, skewed):
    """right/full would emit unmatched build rows once per salt — rejected."""
    dim = spark.createDataFrame([(1, "x")], "k long, name string")
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError):
            replicated_skew_join(skewed, dim, ["k"], n_salts=4, how=how)


def test_salted_agg_splits_zipfian_hot_key(spark):
    """The skew-stress demonstration: on a zipfian key distribution (one
    key holding half the rows), phase-1 of the salted agg splits the hot
    key into ~n_salts near-equal partial groups — the per-reducer row
    bound drops from |hot key| to ~|hot key|/n_salts."""
    from esper_tv_spark.plans.salting import _SALT

    n_hot, n_salts = 8000, 16
    rows = [(0, i) for i in range(n_hot)] + [(1 + i % 50, i) for i in range(n_hot)]
    df = spark.createDataFrame(rows, "key long, v long")
    # replicate phase 1 exactly as salted_agg builds it, but keep the salt
    # visible so group sizes are observable
    partial = (
        df.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), n_salts))
        .groupBy("key", _SALT)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hot = [r["n"] for r in partial.where("key = 0").collect()]
    assert len(hot) == n_salts
    assert max(hot) <= (n_hot // n_salts) * 2  # near-uniform split
    # end-to-end result still exact
    out = {
        r["key"]: r["n"]
        for r in __import__("esper_tv_spark.plans.salting", fromlist=["salted_agg"])
        .salted_agg(df, ["key"], {"n": (F.lit(1), "count")}, n_salts=n_salts)
        .collect()
    }
    assert out[0] == n_hot
