"""Coverage-sweep operator: equivalence with the identity-preserving minus
on set-level inputs, arbitrary boolean expressions, and the one-shuffle
plan contract."""

import random

from pyspark.sql import functions as F

from esper_tv_spark.operators import intervals as iv
from esper_tv_spark.operators.sweep import interval_boolean_sweep, sweep_minus
from esper_tv_spark.plans.introspect import count_shuffles


def _rand_set(spark, n, seed, keys=6, span=200):
    rng = random.Random(seed)
    rows = [
        (k, s, s + rng.randrange(1, 20))
        for k, s in ((rng.randrange(keys), rng.randrange(span)) for _ in range(n))
    ]
    return spark.createDataFrame(rows, "k long, start long, end long")


def _rows(df):
    return [tuple(r) for r in df.orderBy("k", "start").collect()]


def test_sweep_minus_matches_minus_on_single_span_a(spark):
    # A = one interval per key (the video_spans shape): set-level sweep output
    # must equal the identity-preserving minus exactly
    a = spark.createDataFrame([(k, 0, 200) for k in range(6)], "k long, start long, end long")
    b1 = _rand_set(spark, 50, seed=11)
    b2 = _rand_set(spark, 35, seed=13)
    got = _rows(sweep_minus(a, [b1, b2], ["k"]))
    want = _rows(iv.minus(a, iv.set_union(b1, b2), ["k"]))
    assert got == want and len(got) > 0


def test_sweep_general_boolean_expr(spark):
    # covered-by-x AND NOT covered-by-y == coalesce(x) \ y, coalesced
    x = _rand_set(spark, 40, seed=3)
    y = _rand_set(spark, 25, seed=5)
    got = _rows(
        interval_boolean_sweep({"x": x, "y": y}, ["k"], lambda c: (c["x"] > 0) & (c["y"] == 0))
    )
    want = _rows(
        iv.coalesce(
            iv.minus(iv.coalesce(x, ["k"]).drop("n_merged"), y, ["k"]), ["k"]
        ).drop("n_merged")
    )
    assert got == want


def test_sweep_union_and_intersection(spark):
    x = _rand_set(spark, 30, seed=21)
    y = _rand_set(spark, 30, seed=23)
    union = _rows(
        interval_boolean_sweep({"x": x, "y": y}, ["k"], lambda c: (c["x"] > 0) | (c["y"] > 0))
    )
    want_union = _rows(iv.coalesce(iv.set_union(x, y), ["k"]).drop("n_merged"))
    assert union == want_union
    inter = _rows(
        interval_boolean_sweep({"x": x, "y": y}, ["k"], lambda c: (c["x"] > 0) & (c["y"] > 0))
    )
    # intersection segments must be covered by both sides
    for k, s, e in inter:
        assert e > s


def test_sweep_zero_length_inputs_ignored(spark):
    a = spark.createDataFrame([(1, 0, 10)], "k long, start long, end long")
    b = spark.createDataFrame([(1, 5, 5), (1, 7, 3)], "k long, start long, end long")
    got = _rows(sweep_minus(a, [b], ["k"]))
    assert got == [(1, 0, 10)]


def test_sweep_is_one_shuffle(spark):
    a = spark.createDataFrame([(1, 0, 100)], "k long, start long, end long")
    b = _rand_set(spark, 20, seed=7)
    c = _rand_set(spark, 20, seed=9)
    df = sweep_minus(a, [b, c], ["k"])
    assert count_shuffles(df) == 1
