"""Interval algebra vs brute-force pure-Python oracles (SURVEY §5: golden
oracles for interval ops, small enough to verify by brute force)."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from esper_tv_spark.operators import intervals as iv


def make_intervals(seed: int, n_keys: int = 5, n_per_key: int = 30, span: int = 1000):
    rng = random.Random(seed)
    rows = []
    i = 0
    for k in range(n_keys):
        for _ in range(n_per_key):
            s = rng.randint(0, span)
            e = s + rng.randint(1, 60)
            rows.append((k, i, s, e))
            i += 1
    return rows


def brute_coalesce(rows, gap=0):
    out = []
    bykey = {}
    for k, _, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in ivs:
            if cur_s is None:
                cur_s, cur_e, n = s, e, 1
            elif s <= cur_e + gap:
                cur_e, n = max(cur_e, e), n + 1
            else:
                out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        if cur_s is not None:
            out.append((k, cur_s, cur_e, n))
    return sorted(out)


def brute_minus(a_rows, b_rows):
    out = []
    b_bykey = {}
    for k, _, s, e in b_rows:
        b_bykey.setdefault(k, []).append((s, e))
    for k, aid, s, e in a_rows:
        segments = [(s, e)]
        for bs, be in b_bykey.get(k, []):
            nxt = []
            for ss, se in segments:
                if be <= ss or bs >= se:
                    nxt.append((ss, se))
                    continue
                if ss < bs:
                    nxt.append((ss, bs))
                if be < se:
                    nxt.append((be, se))
            segments = nxt
        out.extend((k, aid, ss, se) for ss, se in segments)
    return sorted(out)


def brute_overlap_pairs(a_rows, b_rows):
    out = []
    for k, aid, s, e in a_rows:
        for k2, bid, s2, e2 in b_rows:
            if k == k2 and s < e2 and e > s2:
                out.append((k, aid, bid, min(e, e2) - max(s, s2)))
    return sorted(out)


@pytest.fixture(scope="module")
def df_a(spark):
    return spark.createDataFrame(make_intervals(1), "key int, iid int, start long, end long")


@pytest.fixture(scope="module")
def df_b(spark):
    return spark.createDataFrame(make_intervals(2), "key int, iid int, start long, end long")


@pytest.mark.parametrize("gap", [0, 10, 100])
def test_coalesce(spark, df_a, gap):
    got = sorted(
        tuple(r)
        for r in iv.coalesce(df_a.select("key", "start", "end"), ["key"], gap=gap).collect()
    )
    want = brute_coalesce(make_intervals(1), gap)
    assert got == want


def test_minus(spark, df_a, df_b):
    got = sorted(
        (r["key"], r["iid"], r["start"], r["end"])
        for r in iv.minus(df_a, df_b.select("key", "start", "end"), ["key"]).collect()
    )
    assert got == brute_minus(make_intervals(1), make_intervals(2))


def test_minus_empty_b(spark, df_a):
    empty = spark.createDataFrame([], "key int, start long, end long")
    got = sorted(
        (r["key"], r["iid"], r["start"], r["end"]) for r in iv.minus(df_a, empty, ["key"]).collect()
    )
    assert got == sorted((k, i, s, e) for k, i, s, e in make_intervals(1))


def test_overlap_join(spark, df_a, df_b):
    j = iv.overlap_join(df_a, df_b, ["key"], clip=False)
    got = sorted(
        (r["a_key"], r["a_iid"], r["b_iid"], r["overlap_length"]) for r in j.collect()
    )
    assert got == brute_overlap_pairs(make_intervals(1), make_intervals(2))


@pytest.mark.parametrize("band", [64, 128, 1024])
def test_overlap_join_banded_matches_plain(spark, df_a, df_b, band):
    plain = sorted(
        (r["a_iid"], r["b_iid"]) for r in iv.interval_join(df_a, df_b, ["key"]).collect()
    )
    banded = sorted(
        (r["a_iid"], r["b_iid"])
        for r in iv.interval_join(df_a, df_b, ["key"], band=band).collect()
    )
    assert banded == plain


def test_dilate_filter_length(spark, df_a):
    d = iv.dilate(df_a, 5)
    row = d.where(F.col("iid") == 0).first()
    orig = [r for r in make_intervals(1) if r[1] == 0][0]
    assert row["start"] == orig[2] - 5 and row["end"] == orig[3] + 5
    fl = iv.filter_length(df_a, min_length=30)
    assert all(r["end"] - r["start"] >= 30 for r in fl.collect())
    assert fl.count() == sum(1 for _, _, s, e in make_intervals(1) if e - s >= 30)


def test_split_intervals(spark):
    df = spark.createDataFrame([(1, 0, 95)], "key int, start long, end long")
    got = sorted((r["start"], r["end"]) for r in iv.split_intervals(df, 30).collect())
    assert got == [(0, 30), (30, 60), (60, 90), (90, 95)]


def test_split_intervals_empty_and_inverted(spark):
    """end <= start must yield no chunks, not an illegal-sequence error."""
    df = spark.createDataFrame(
        [(1, 10, 10), (2, 20, 5), (3, 0, 7)], "key int, start long, end long"
    )
    got = sorted((r["key"], r["start"], r["end"]) for r in iv.split_intervals(df, 30).collect())
    assert got == [(3, 0, 7)]


def test_overlap_measure(spark, df_a, df_b):
    out = iv.overlap_measure(df_a, df_b.select("key", "start", "end"), ["key"])
    got = {(r["key"], r["iid"]): r["overlap_total"] for r in out.collect()}
    # brute force against coalesced b
    b_co = brute_coalesce(make_intervals(2))
    b_bykey = {}
    for k, s, e, _ in b_co:
        b_bykey.setdefault(k, []).append((s, e))
    for k, aid, s, e in make_intervals(1):
        want = sum(
            max(0, min(e, be) - max(s, bs)) for bs, be in b_bykey.get(k, [])
        )
        assert got[(k, aid)] == want, (k, aid)


def test_merge_join_before(spark, df_a, df_b):
    out = iv.merge_join(df_a, df_b, ["key"], iv.t_before(20))
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        (k, min(s, s2), max(e, e2))
        for k, _, s, e in make_intervals(1)
        for k2, _, s2, e2 in make_intervals(2)
        if k == k2 and e <= s2 and s2 - e <= 20
    )
    assert got == want


def test_fold_intervals(spark, df_a):
    # capped-length accumulation à la commercial_detection_rekall fold
    def fold_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        total = 0
        for _, row in pdf.iterrows():
            total += row["end"] - row["start"]
        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "total_len": [total]})

    out = iv.fold_intervals(df_a, ["key"], fold_fn, "key int, total_len long")
    got = {r["key"]: r["total_len"] for r in out.collect()}
    for k in range(5):
        want = sum(e - s for kk, _, s, e in make_intervals(1) if kk == k)
        assert got[k] == want


def test_set_union_count_duration(spark, df_a, df_b):
    u = iv.set_union(df_a, df_b)
    assert u.count() == df_a.count() + df_b.count()
    cd = iv.count_duration(df_a, ["key"]).collect()
    for r in cd:
        want = sum(e - s for k, _, s, e in make_intervals(1) if k == r["key"])
        assert r["total_duration"] == want and r["n_intervals"] == 30


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    iv_lists = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=200),    # start
            st.integers(min_value=1, max_value=50),     # length
        ),
        min_size=0,
        max_size=25,
    )

    @given(a=iv_lists, b=iv_lists)
    @settings(max_examples=5, deadline=None)
    def test_minus_property(spark_session_holder, a, b):
        spark = spark_session_holder
        a_rows = [(k, i, s, s + l) for i, (k, s, l) in enumerate(a)]
        b_rows = [(k, i, s, s + l) for i, (k, s, l) in enumerate(b)]
        schema = "key int, iid int, start long, end long"
        df_a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
        df_b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)
        got = sorted(
            (r["key"], r["iid"], r["start"], r["end"])
            for r in iv.minus(df_a, df_b, ["key"]).collect()
        )
        assert got == brute_minus(a_rows, b_rows)

    @pytest.fixture(scope="module")
    def spark_session_holder(spark):
        return spark

except ImportError:  # pragma: no cover
    pass


def test_banded_reach_matches_plain_before_after(spark):
    """The reach-extended banded join must reproduce the unbanded result for
    gap predicates (before/after/disjunction), including pairs that straddle
    band boundaries."""
    rows_a = [(1, s, s + 10) for s in range(0, 500, 37)]
    rows_b = [(1, s, s + 8) for s in range(5, 500, 29)]
    a = spark.createDataFrame(rows_a, "key long, start long, end long")
    b = spark.createDataFrame(rows_b, "key long, start long, end long")

    def ovl_before_after(a_s, a_e, b_s, b_e):
        return (
            iv.t_overlaps(a_s, a_e, b_s, b_e)
            | iv.t_before(25)(a_s, a_e, b_s, b_e)
            | iv.t_after(25)(a_s, a_e, b_s, b_e)
        )

    plain = sorted(
        (r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"], ovl_before_after).collect()
    )
    for band in (16, 50, "auto"):
        banded = sorted(
            (r["a_start"], r["b_start"])
            for r in iv.interval_join(
                a, b, ["key"], ovl_before_after, band=band, reach=25
            ).collect()
        )
        assert banded == plain, band


def test_overlap_measure_banded_matches_plain(spark):
    """Banded overlap_measure (inner join + join-back) keeps zero-overlap
    rows and exact totals, duplicates included."""
    a = spark.createDataFrame(
        [(1, 0, 100), (1, 0, 100), (1, 500, 600), (2, 0, 50)],
        "key long, start long, end long",
    )
    b = spark.createDataFrame(
        [(1, 10, 30), (1, 20, 60), (2, 200, 300)], "key long, start long, end long"
    )
    plain = sorted(
        tuple(r) for r in iv.overlap_measure(a, b, ["key"]).collect()
    )
    banded = sorted(
        tuple(r) for r in iv.overlap_measure(a, b, ["key"], band=64).collect()
    )
    assert banded == plain
    assert (1, 500, 600, 0) in banded  # zero-overlap row survives with 0


def test_choose_band_width_skewed(spark):
    """On a skewed length mix the p95 heuristic lands near the long tail —
    wide enough that long intervals span ~1-2 bands, far below the span of
    the timeline (buckets stay tight)."""
    from esper_tv_spark.plans.banding import choose_band_width

    rows = [(i, i * 1000, i * 1000 + 10) for i in range(950)]  # short: len 10
    rows += [(10_000 + i, i * 1000, i * 1000 + 5_000) for i in range(50)]  # long tail
    df = spark.createDataFrame(rows, "key long, start long, end long")
    w = choose_band_width(df)
    assert 10 < w <= 5_000
    assert w >= 1_000  # p95 sits in the long tail, not the short mass


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([7, 16, 64]),
)
@pytest.mark.slow
def test_banded_join_fuzz_matches_plain(spark, rows_a, rows_b, band):
    """Property: banded == plain for overlap and gap predicates, on
    arbitrary (negative-coordinate) intervals — guards the floor-division
    and emit-once bucket logic of the default-banded paths."""
    a = spark.createDataFrame(
        [(k, s, s + l) for k, s, l in rows_a], "key long, start long, end long"
    )
    b = spark.createDataFrame(
        [(k, s, s + l) for k, s, l in rows_b], "key long, start long, end long"
    )
    plain_ovl = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"]).collect()
    )
    banded_ovl = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"], band=band).collect()
    )
    assert banded_ovl == plain_ovl

    pred = iv.t_before(13)
    plain_gap = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"], pred).collect()
    )
    banded_gap = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"], pred, band=band, reach=13).collect()
    )
    assert banded_gap == plain_gap


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-50.0, max_value=50.0, allow_nan=False),
            st.floats(min_value=0.1, max_value=40.0, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(min_value=-50.0, max_value=50.0, allow_nan=False),
            st.floats(min_value=0.1, max_value=40.0, allow_nan=False),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([7, 16, 64]),
)
@pytest.mark.slow
def test_banded_join_fuzz_fractional_coordinates(spark, rows_a, rows_b, band):
    """Property: banded == plain on FRACTIONAL (double) coordinates —
    the r8 regression: the old upper-bucket bound floor((e-1)/W) assumed
    integer coordinates, so a partner starting inside (e-1, e) sat in a
    bucket the interval never exploded into and the pair was silently
    dropped (caught by the skewed-interval fixture, 17,940 pairs short).
    ceil(e/W) - 1 is tight for both."""
    a = spark.createDataFrame(
        [(k, float(s), float(s) + float(l)) for k, s, l in rows_a],
        "key long, start double, end double",
    )
    b = spark.createDataFrame(
        [(k, float(s), float(s) + float(l)) for k, s, l in rows_b],
        "key long, start double, end double",
    )
    plain = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"]).collect()
    )
    banded = sorted(
        (r["a_key"], r["a_start"], r["b_start"])
        for r in iv.interval_join(a, b, ["key"], band=band).collect()
    )
    assert banded == plain
