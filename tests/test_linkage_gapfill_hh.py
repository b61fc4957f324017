"""edit_similarity_join (PassJoin, q119), gap_fill (q120), heavy_hitters
(q121).

The DuckDB hash gates prove end-to-end equality on the fixture; these
tests pin what the oracles can't: PassJoin's candidate COMPLETENESS
against brute-force Levenshtein on randomized strings (the pigeonhole +
shift-window argument is easy to get off by one), the short-string
fallback (pigeonhole has no nonempty segment below t+1 chars), gap_fill's
dense-spine/LOCF/filled contract on hand-built histories, and
heavy_hitters' exactness UNDER SKETCH SHRINK — the fixture's cardinality
never exceeds k, so only a Zipf fixture with tiny k actually exercises
the Misra-Gries decrement path and the superset guarantee.
"""

import itertools
import os
import random
import sys
from datetime import datetime

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esper_tv_spark.operators.corpus import heavy_hitters
from esper_tv_spark.operators.dedup import edit_similarity_join
from esper_tv_spark.operators.events import gap_fill


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


@pytest.mark.parametrize("t,alpha,maxlen,seed", [(1, "ab", 8, 1), (2, "abc", 14, 2), (3, "ab", 5, 3)])
def test_passjoin_matches_bruteforce(spark, t, alpha, maxlen, seed):
    rng = random.Random(seed)
    strs = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen))) for _ in range(50)]
    df = spark.createDataFrame(list(enumerate(strs)), "doc_id LONG, s STRING")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_similarity_join(df, t=t).collect()}
    want = {
        (i, j, _lev(strs[i], strs[j]))
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _lev(strs[i], strs[j]) <= t
    }
    assert got == want


def test_passjoin_short_string_fallback(spark):
    # every string shorter than t+1=3 chars: pigeonhole never applies,
    # pairs must still come out exact through the banded fallback
    strs = ["", "a", "ab", "ba", "b", "abcd", "abce"]
    df = spark.createDataFrame(list(enumerate(strs)), "doc_id LONG, s STRING")
    got = {(r.id_a, r.id_b, r.dist) for r in edit_similarity_join(df, t=2).collect()}
    want = {
        (i, j, _lev(strs[i], strs[j]))
        for i, j in itertools.combinations(range(len(strs)), 2)
        if _lev(strs[i], strs[j]) <= 2
    }
    assert got == want
    assert (0, 1, 1) in got and (5, 6, 1) in got


def test_gap_fill_dense_locf(spark):
    rows = [
        (0, datetime(2024, 1, 1, 0, 10), "a", 2.0),
        (1, datetime(2024, 1, 1, 0, 50), "a", 4.0),
        # hour 1 and 2 empty for 'a'
        (2, datetime(2024, 1, 1, 3, 5), "a", 10.0),
        (3, datetime(2024, 1, 1, 2, 0), "b", 7.0),  # b starts at hour 2
    ]
    ev = spark.createDataFrame(rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
    out = gap_fill(ev, bucket="1 hour", by="event_type").collect()
    by = {(r.event_type, r.bucket.hour): r for r in out}
    # dense: 2 groups x 4 hours
    assert len(out) == 8
    assert by[("a", 0)].cnt == 2 and by[("a", 0)].avg_val_locf == 3.0 and not by[("a", 0)].filled
    # gap hours carry cnt=0, LOCF value, filled flag
    assert by[("a", 1)].cnt == 0 and by[("a", 1)].avg_val_locf == 3.0 and by[("a", 1)].filled
    assert by[("a", 2)].avg_val_locf == 3.0
    assert by[("a", 3)].avg_val_locf == 10.0
    # before a group's first observation: NULL value, still dense
    assert by[("b", 0)].cnt == 0 and by[("b", 0)].avg_val_locf is None and by[("b", 0)].filled
    assert by[("b", 2)].cnt == 1 and by[("b", 2)].avg_val_locf == 7.0


def test_gap_fill_rejects_multi_unit_bucket(spark):
    ev = spark.createDataFrame(
        [(0, datetime(2024, 1, 1), "a", 1.0)],
        "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    with pytest.raises(ValueError):
        gap_fill(ev, bucket="5 minutes")


def test_heavy_hitters_exact_under_shrink(spark):
    # Zipf-ish: key i has frequency ~ 1/i; 400 distinct keys, k=10
    # counters -> the Misra-Gries decrement path runs constantly, and the
    # candidate set is a strict subset of the key space
    rng = random.Random(7)
    vals = [f"k{min(int(1 / max(rng.random(), 1e-9)), 400)}" for _ in range(20000)]
    df = spark.createDataFrame([(v,) for v in vals], "g STRING").repartition(8)
    phi = 0.03
    out = {(r.g, r.cnt) for r in heavy_hitters(df, "g", phi=phi).collect()}
    import collections, math

    exact = collections.Counter(vals)
    thr = math.ceil(phi * len(vals))
    want = {(g, c) for g, c in exact.items() if c >= thr}
    assert out == want and len(want) > 0


def test_heavy_hitters_partitioning_invariant(spark):
    rng = random.Random(9)
    vals = [f"k{min(int(1 / max(rng.random(), 1e-9)), 50)}" for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "g STRING")
    a = {(r.g, r.cnt) for r in heavy_hitters(df.repartition(1), "g", 0.05).collect()}
    b = {(r.g, r.cnt) for r in heavy_hitters(df.repartition(13), "g", 0.05).collect()}
    assert a == b and len(a) > 0


def test_heavy_hitters_rejects_bad_phi(spark):
    df = spark.createDataFrame([("x",)], "g STRING")
    with pytest.raises(ValueError):
        heavy_hitters(df, "g", 0.0)


def test_set_similarity_join_matches_bruteforce(spark):
    # randomized docs with planted near-dups; prefix-filtered result must
    # equal brute force EXACTLY (the completeness claim LSH can't make)
    from esper_tv_spark.operators.dedup import set_similarity_join

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
    for i in range(6):  # near-dups: one token edited
        toks = texts[i].split()
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        texts.append(" ".join(toks))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    tau = 0.4
    got = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in set_similarity_join(df, tau).collect()}

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()

    want = set()
    for i, j in itertools.combinations(range(len(texts)), 2):
        a, b = shingles(texts[i]), shingles(texts[j])
        if not a or not b:
            continue
        jac = len(a & b) / len(a | b)
        if jac >= tau:
            want.add((i, j, round(jac, 9)))
    assert got == want and len(want) > 0


def test_set_similarity_join_rejects_bad_tau(spark):
    from esper_tv_spark.operators.dedup import set_similarity_join

    df = spark.createDataFrame([(0, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        set_similarity_join(df, 0.0)
