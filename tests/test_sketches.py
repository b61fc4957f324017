"""Count-min sketch: upper-bound property, exactness at low load, and
partition-mergeability (cell-wise addition == sketch of the union)."""

from pyspark.sql import functions as F

from esper_tv_spark.functions.sketches import (
    build_count_min,
    cm_estimate,
    heavy_hitters_exact,
)


def _freq_df(spark, freqs):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cm_upper_bound_and_skew(spark):
    freqs = {f"k{i}": (100 if i < 3 else 2) for i in range(200)}
    df = _freq_df(spark, freqs)
    sk = build_count_min(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {r["k"]: r["est_count"] for r in cm_estimate(sk, keys, "k", 4, 64).collect()}
    # CM never underestimates, and total overestimation is bounded
    for k, n in freqs.items():
        assert est[k] >= n
    n_total = sum(freqs.values())
    assert all(est[k] - freqs[k] <= 2 * n_total / 64 * 4 for k in freqs)
    # the three hot keys dominate every estimate-ranked listing
    top3 = sorted(est, key=lambda k: -est[k])[:3]
    assert set(top3) == {"k0", "k1", "k2"}


def test_cm_exact_when_wide(spark):
    freqs = {f"x{i}": i + 1 for i in range(10)}
    df = _freq_df(spark, freqs)
    sk = build_count_min(df, "k", depth=4, width=4096)
    est = {
        r["k"]: r["est_count"]
        for r in cm_estimate(sk, df.select("k").distinct(), "k", 4, 4096).collect()
    }
    assert est == freqs  # no collisions at this load factor


def test_cm_mergeability(spark):
    fa = {"a": 5, "b": 3}
    fb = {"b": 4, "c": 7}
    da, db = _freq_df(spark, fa), _freq_df(spark, fb)
    merged_cells = (
        build_count_min(da, "k", 4, 64)
        .unionByName(build_count_min(db, "k", 4, 64))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    union_cells = build_count_min(da.unionByName(db), "k", 4, 64)
    got = sorted(map(tuple, merged_cells.collect()))
    want = sorted(map(tuple, union_cells.collect()))
    assert got == want


def test_heavy_hitters_exact_order(spark):
    df = _freq_df(spark, {"a": 3, "b": 5, "c": 5, "d": 1})
    out = [(r["k"], r["cnt"]) for r in heavy_hitters_exact(df, "k", 3).collect()]
    assert out == [("b", 5), ("c", 5), ("a", 3)]  # count desc, key asc ties


def test_kmv_distinct_accuracy_and_exact_small_groups(spark):
    from esper_tv_spark.functions.sketches import kmv_distinct

    rows = [("big", f"v{i}") for i in range(5000)] + [("small", f"s{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "g string, key string")
    out = {r["g"]: r for r in kmv_distinct(df, "key", ["g"], k=64).collect()}
    assert out["small"]["est_distinct"] == 20.0  # below k -> exact
    est = out["big"]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.30  # KMV std err ~ 1/sqrt(k-1) ~ 12.6%


def test_kmv_distinct_mergeable(spark):
    """The 100 TB property: sketching the union == merging per-part
    sketches (union + re-truncate)."""
    from esper_tv_spark.functions.sketches import kmv_distinct

    part1 = spark.createDataFrame([("g", f"a{i}") for i in range(300)], "g string, key string")
    part2 = spark.createDataFrame([("g", f"b{i}") for i in range(300)] + [("g", "a0")], "g string, key string")
    whole = kmv_distinct(part1.unionByName(part2), "key", ["g"], k=32).collect()[0]
    merged = kmv_distinct(part1.unionByName(part2).distinct(), "key", ["g"], k=32).collect()[0]
    assert whole["est_distinct"] == merged["est_distinct"]
