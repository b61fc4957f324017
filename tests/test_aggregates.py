"""Aggregate helpers vs hand-computed values."""

import math
import random

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.functions.aggregates import (
    argmax_per_group,
    count_distinct_over_column,
    exact_avg,
    exact_sum,
    percentile_rank,
    sum_distinct_over_column,
    weighted_sum_var,
)


def money_rows(seed=7, n=500):
    rng = random.Random(seed)
    return [
        (i % 5, round(rng.uniform(1, 100), 2), round(rng.uniform(0, 1), 2))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(money_rows(), "grp int, x double, p double")


def test_exact_sum_avg(spark, df):
    rows = money_rows()
    got = df.agg(exact_sum("x", 2).alias("s"), exact_avg("x", 2).alias("a")).first()
    want_s = round(sum(round(x * 100) for _, x, _ in rows) / 100.0, 10)
    assert math.isclose(got["s"], want_s, rel_tol=0, abs_tol=1e-9)
    assert math.isclose(got["a"], want_s / len(rows), rel_tol=1e-12)


def test_weighted_sum_var(spark, df):
    rows = money_rows()
    out = {r["grp"]: r for r in weighted_sum_var(df, ["grp"], "x", "p").collect()}
    for g in range(5):
        exp = sum(p * x for gg, x, p in rows if gg == g)
        var = sum(p * (1 - p) * x * x for gg, x, p in rows if gg == g)
        assert math.isclose(out[g]["expected_sum"], exp, rel_tol=1e-9)
        assert math.isclose(out[g]["variance_sum"], var, rel_tol=1e-9)


def test_argmax_per_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.5), (1, "b", 0.9), (1, "c", 0.9), (2, "d", 0.1)],
        "grp int, name string, prob double",
    )
    got = {r["grp"]: r["name"] for r in argmax_per_group(df, ["grp"], "prob", ["name"]).collect()}
    assert got == {1: "b", 2: "d"}  # tie broken by name asc


def test_percentile_rank(spark):
    df = spark.createDataFrame([(1, float(v)) for v in [10, 20, 30, 40]], "g int, v double")
    got = sorted(r["pct_rank"] for r in percentile_rank(df, ["g"], "v").collect())
    assert got == [0.0, 1 / 3, 2 / 3, 1.0]


def test_sum_distinct_and_count_distinct(spark):
    df = spark.createDataFrame(
        [(1, 100, 5.0), (1, 100, 5.0), (1, 101, 3.0), (2, 102, 7.0), (2, 102, 7.0)],
        "grp int, key int, val double",
    )
    got = {
        r["grp"]: r["sum_val"]
        for r in sum_distinct_over_column(df, ["key"], "val", ["grp"]).collect()
    }
    assert got == {1: 8.0, 2: 7.0}
    cd = count_distinct_over_column(df, ["key"]).first()["n_distinct"]
    assert cd == 3


# ---------------------------------------------------------------------------
# exact_quantiles (q125): histogram-refinement k-th statistic
# ---------------------------------------------------------------------------


def test_exact_quantiles_matches_sorted_rank(spark):
    import math
    import random

    from esper_tv_spark.functions.aggregates import exact_quantiles

    rng = random.Random(3)
    vals = [round(rng.uniform(-50, 50), 2) for _ in range(5000)]
    vals += [7.77] * 400  # dense tie block
    df = spark.createDataFrame([(v,) for v in vals], "value DOUBLE")
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    # force the refinement loop (n > max_rows_exact) with a coarse grid
    got = exact_quantiles(df, "value", qs, buckets=16, max_rows_exact=100)
    sv = sorted(vals)
    for q, v in got:
        assert v == sv[max(1, math.ceil(q * len(vals))) - 1], q


def test_exact_quantiles_partitioning_invariant_and_small_n(spark):
    from esper_tv_spark.functions.aggregates import exact_quantiles

    vals = [float(x) for x in [5, 1, 9, 3, 3, 3, 7]]
    df1 = spark.createDataFrame([(v,) for v in vals], "value DOUBLE").repartition(1)
    df7 = spark.createDataFrame([(v,) for v in vals], "value DOUBLE").repartition(7)
    a = exact_quantiles(df1, "value", [0.5, 0.9])
    b = exact_quantiles(df7, "value", [0.5, 0.9])
    assert a == b == [(0.5, 3.0), (0.9, 9.0)]


def test_exact_quantiles_rejects_bad_q(spark):
    import pytest as _pytest

    from esper_tv_spark.functions.aggregates import exact_quantiles

    df = spark.createDataFrame([(1.0,)], "value DOUBLE")
    with _pytest.raises(ValueError):
        exact_quantiles(df, "value", [0.0])
