"""As-of join (union+window, no join node) and connected-components
clustering."""

import pytest
import random

import pandas as pd
from pyspark.sql import functions as F

from esper_tv_spark.operators.asof import asof_join
from esper_tv_spark.operators.dedup import connected_components, dedup_groups
from esper_tv_spark.plans.introspect import count_shuffles, physical_plan


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(42)
    trades = [(k, rng.randrange(1000), i) for i, k in enumerate(rng.choices(range(5), k=200))]
    quotes = [(k, rng.randrange(1000), rng.random()) for k in rng.choices(range(5), k=300)]
    left = spark.createDataFrame(trades, "k long, ts long, trade_id long")
    right = spark.createDataFrame(quotes, "k long, ts long, px double")

    got = (
        asof_join(left, right, ["k"], "ts", "ts")
        .orderBy("k", "ts", "trade_id")
        .toPandas()[["k", "ts", "trade_id", "px_r", "ts_r"]]
    )
    lp = pd.DataFrame(trades, columns=["k", "ts", "trade_id"]).sort_values("ts", kind="mergesort")
    rp = (
        pd.DataFrame(quotes, columns=["k", "ts", "px"])
        .sort_values(["ts", "px"], kind="mergesort")  # deterministic tie-break: max px at equal ts
        .rename(columns={"px": "px_r", "ts": "ts_r"})
    )
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="ts_r", by="k", direction="backward")
        .sort_values(["k", "ts", "trade_id"], kind="mergesort")
        .reset_index(drop=True)[["k", "ts", "trade_id", "px_r", "ts_r"]]
    )
    # merge_asof picks the LAST right row at the matched ts; our window picks
    # the last in (ts, insertion) order — compare on the matched timestamp,
    # and on payload only where the matched ts is unique
    assert list(got["ts_r"].fillna(-1)) == list(want["ts_r"].fillna(-1))
    dup_ts = rp.groupby(["k", "ts_r"]).size()
    uniq = {(k, t) for (k, t), n in dup_ts.items() if n == 1}
    for g, w in zip(got.itertuples(index=False), want.itertuples(index=False)):
        if (g.k, g.ts_r) in uniq:
            assert g.px_r == w.px_r


def test_asof_tolerance_and_no_match(spark):
    left = spark.createDataFrame([(1, 100), (1, 500), (2, 50)], "k long, ts long")
    right = spark.createDataFrame([(1, 90), (1, 120)], "k long, ts long")
    out = {
        (r["k"], r["ts"]): r["ts_r"]
        for r in asof_join(left, right, ["k"], "ts", "ts", tolerance=50).collect()
    }
    assert out[(1, 100)] == 90       # within tolerance
    assert out[(1, 500)] is None     # 120 is 380 stale
    assert out[(2, 50)] is None      # key never seen on the right


def test_asof_is_single_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, 10, 1)], "k long, ts long, v long")
    right = spark.createDataFrame([(1, 5, 2.0)], "k long, ts long, p double")
    df = asof_join(left, right, ["k"], "ts", "ts")
    plan = physical_plan(df)
    assert "Join" not in plan
    assert count_shuffles(df) == 1


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


@pytest.mark.slow
def test_connected_components_long_chain(spark):
    # a 40-node path exercises the O(log n) doubling, not just 1-hop merges
    chain = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(chain, "a long, b long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0} and len(got) == 41


def test_dedup_groups_keepers(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], "a long, b long")
    out = {r["doc_id"]: (r["group_id"], r["is_keeper"]) for r in dedup_groups(docs, pairs).collect()}
    assert out[1] == (1, True) and out[3] == (1, False) and out[5] == (1, False)
    assert out[6] == (6, True) and out[7] == (6, False)
    # singletons keep themselves
    assert out[0] == (0, True) and out[2] == (2, True)


def test_cogrouped_backward_matches_window_asof(spark):
    from esper_tv_spark.operators.asof import asof_join_cogrouped

    rng = random.Random(11)
    # unique right timestamps per key so the tie-break rules of the two
    # implementations can't diverge
    quotes = [(k, t, rng.random()) for k in range(4) for t in rng.sample(range(2000), 80)]
    trades = [(k, rng.randrange(2000), i) for i, k in enumerate(rng.choices(range(4), k=150))]
    left = spark.createDataFrame(trades, "k long, ts long, trade_id long")
    right = spark.createDataFrame(quotes, "k long, ts long, px double")

    cols = ["k", "ts", "trade_id", "px_r", "ts_r"]
    got = sorted(
        tuple(r) for r in asof_join_cogrouped(left, right, ["k"], "ts", "ts").select(*cols).collect()
    )
    want = sorted(tuple(r) for r in asof_join(left, right, ["k"], "ts", "ts").select(*cols).collect())
    assert got == want and len(got) == 150


def test_cogrouped_forward_and_nearest(spark):
    from esper_tv_spark.operators.asof import asof_join_cogrouped

    left = spark.createDataFrame([(1, 100), (1, 200), (1, 310)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 205, "b"), (1, 400, "c")], "k long, ts long, tag string"
    )
    fwd = {
        (r["k"], r["ts"]): r["tag_r"]
        for r in asof_join_cogrouped(left, right, ["k"], direction="forward").collect()
    }
    assert fwd == {(1, 100): "b", (1, 200): "b", (1, 310): "c"}
    near = {
        (r["k"], r["ts"]): r["tag_r"]
        for r in asof_join_cogrouped(left, right, ["k"], direction="nearest").collect()
    }
    # 100 -> 90 (|10| < |105|), 200 -> 205, 310 -> 205 (|105| > |90|? no: 310-205=105, 400-310=90 -> c)
    assert near == {(1, 100): "a", (1, 200): "b", (1, 310): "c"}
    tol = {
        (r["k"], r["ts"]): r["tag_r"]
        for r in asof_join_cogrouped(left, right, ["k"], direction="nearest", tolerance=20).collect()
    }
    assert tol == {(1, 100): "a", (1, 200): "b", (1, 310): None}


def test_asof_null_payload_from_matched_row_preserved(spark):
    """The matched right row's legitimately-NULL payload must come through
    as NULL, and ALL payload columns must come from that same row — not
    stitched from older non-null rows (the per-column last(ignorenulls)
    hazard)."""
    from esper_tv_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "key long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 7.0, "old"), (1, 50, None, "new")],
        "key long, ts long, price double, tag string",
    )
    out = asof_join(left, right, ["key"]).collect()
    assert len(out) == 1
    r = out[0]
    # matched row is ts=50: price must be NULL (not 7.0 from ts=10), tag 'new'
    assert r["ts_r"] == 50
    assert r["price_r"] is None
    assert r["tag_r"] == "new"

    # pandas parity
    import pandas as pd

    m = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("ts"),
        on="ts",
        by="key",
    )
    assert pd.isna(m["price"].iloc[0]) and m["tag"].iloc[0] == "new"


def test_asof_fuzz_matches_pandas(spark):
    """Property: both as-of encodings equal pandas merge_asof on random
    keyed series with duplicate timestamps, NULL payloads, and tolerance
    (seeded sweep, no hypothesis fixture juggling)."""
    import numpy as np
    import pandas as pd

    from esper_tv_spark.operators.asof import asof_join, asof_join_cogrouped

    rng = np.random.RandomState(99)
    for trial in range(6):
        n_l, n_r = rng.randint(1, 25), rng.randint(1, 25)
        keys_l = rng.randint(0, 3, n_l)
        keys_r = rng.randint(0, 3, n_r)
        ts_l = rng.randint(0, 40, n_l)
        ts_r = rng.randint(0, 40, n_r)
        val = [None if rng.rand() < 0.25 else float(round(rng.rand(), 3)) for _ in range(n_r)]
        tol = [None, 5, 15][trial % 3]

        left = spark.createDataFrame(
            [(int(k), int(t), i) for i, (k, t) in enumerate(zip(keys_l, ts_l))],
            "key long, ts long, lid long",
        )
        # unique right timestamps per key: merge_asof picks the LAST of
        # equal-ts rows, our window the last by input order -- both
        # ambiguous under duplicates, so dedup (real feeds have unique
        # event times per key at micro resolution)
        seen = set()
        r_rows = []
        for k, t, v in zip(keys_r, ts_r, val):
            if (int(k), int(t)) not in seen:
                seen.add((int(k), int(t)))
                r_rows.append((int(k), int(t), v))
        right = spark.createDataFrame(r_rows, "key long, ts long, price double")

        lp = left.toPandas().sort_values("ts", kind="mergesort")
        rp = right.toPandas().sort_values("ts", kind="mergesort")
        want = pd.merge_asof(
            lp, rp, on="ts", by="key",
            tolerance=tol, allow_exact_matches=True,
        ).sort_values("lid")
        wmap = {
            int(r["lid"]): (None if pd.isna(r["price"]) else round(float(r["price"]), 3))
            for _, r in want.iterrows()
        }

        for impl in (asof_join, asof_join_cogrouped):
            got = impl(left, right, ["key"], tolerance=tol).collect()
            gmap = {
                int(r["lid"]): (None if r["price_r"] is None else round(r["price_r"], 3))
                for r in got
            }
            assert gmap == wmap, (impl.__name__, trial, gmap, wmap)
