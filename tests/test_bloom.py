"""Bloom pre-filter: no false negatives, bounded false positives, join
equivalence, and a shuffle-free probe side."""

import random
import re

from pyspark.sql import functions as F

from esper_tv_spark.plans.bloom import (
    bloom_might_contain,
    bloom_prefilter_join,
    build_bloom,
)
from esper_tv_spark.plans.introspect import physical_plan


def test_no_false_negatives_and_fp_bounded(spark):
    build = spark.range(0, 1000).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    bloom = build_bloom(build, "k", n_bits=1 << 16, n_hashes=3)
    out = bloom_might_contain(probe, bloom, "k", n_bits=1 << 16, n_hashes=3)
    passed = {r["k"] for r in out.where("__might_contain").collect()}
    members = {i * 7 for i in range(1000)}
    assert members <= passed  # every true member survives
    fp = len(passed - members) / (20000 - len(members & set(range(20000))))
    assert fp < 0.05  # 2^16 bits / 1000 keys / k=3 -> well under 5%


def test_join_equivalence(spark):
    rng = random.Random(3)
    build = spark.createDataFrame(
        [(rng.randrange(500), i) for i in range(300)], "k long, v long"
    )
    probe = spark.createDataFrame(
        [(rng.randrange(5000), i) for i in range(4000)], "k long, p long"
    )
    got = sorted(map(tuple, bloom_prefilter_join(probe, build, "k").collect()))
    want = sorted(map(tuple, probe.join(build, "k").collect()))
    assert got == want and len(got) > 0


def test_probe_side_stays_shuffle_free(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"), F.col("id").alias("p"))
    bloom = build_bloom(build, "k").cache()
    bloom.count()  # materialize: probing reads the bitset, not the agg
    out = bloom_might_contain(probe, bloom, "k")
    plan = physical_plan(out)
    # the k probe lookups are all broadcast-hash joins; every hash exchange
    # in the plan belongs to the (cached) bitset build keyed by word_idx —
    # probe rows are NEVER shuffled
    assert plan.count("BroadcastHashJoin") == 3
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert exchanges and all(k.startswith("word_idx") for k in exchanges)
    bloom.unpersist()


def test_rejects_probe_preserving_joins(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    try:
        bloom_prefilter_join(df, df, "k", how="left")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
