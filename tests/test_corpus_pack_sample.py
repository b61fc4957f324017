"""weighted_sample (sequential Poisson / Ohlsson, hash-derived uniforms) and
pack_shards (two-level distributed prefix sum).  q110/q111 hash-gate
both against DuckDB; these tests pin the properties the oracles can't:
the group decomposition is invisible at ANY group_span, the sample
matches a brute-force Python replay, and weights actually bias the
draw."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esper_tv_spark.operators.corpus import pack_shards, weighted_sample

SF = "/root/testdata/sf0.001"
_KNUTH = 2654435761
_M32 = 1 << 32


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def test_weighted_sample_matches_python_replay(spark, docs):
    rows = docs.select("doc_id", "n_chars").collect()
    exp = sorted(
        (
            (
                round(
                    (((r["doc_id"] % _M32) * _KNUTH % _M32 + 0.5) / _M32)
                    / r["n_chars"],
                    9,
                ),
                r["doc_id"],
            )
            for r in rows
            if r["n_chars"] > 0
        )
    )[:20]
    exp_ids = [d for _, d in exp]
    got = [
        int(r["doc_id"]) for r in weighted_sample(docs, "n_chars", 20).collect()
    ]
    assert got == exp_ids


def test_weighted_sample_biases_toward_heavy_weights(spark):
    """Half the ids carry weight 100, half weight 1: a 50-draw from 200
    rows must be dominated by the heavy half (the scheme's whole
    point; expected heavy share is ~0.99, demand >= 0.8)."""
    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", 50, id_col="doc_id").collect()
    heavy = sum(1 for r in got if int(r["doc_id"]) % 2 == 0)
    assert heavy >= 40


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {int(r["doc_id"]) for r in weighted_sample(df, "w", 10).collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 0)


def test_pack_shards_group_decomposition_invisible(spark, docs):
    """The two-level prefix sum must equal flat sequential packing at
    every group_span — including spans that scatter these ids over
    many groups and the span that puts them all in one."""
    rows = sorted(
        (int(r["doc_id"]), int(r["n_tokens"]))
        for r in pack_shards(docs, budget=500, group_span=100_000).collect()
    )
    # flat replay
    cum, exp = 0, []
    for did, nt in rows:
        exp.append((did, nt, (cum) // 500))
        cum += nt
    for span in (7, 100, 100_000):
        got = sorted(
            (int(r["doc_id"]), int(r["n_tokens"]), int(r["shard_id"]))
            for r in pack_shards(docs, budget=500, group_span=span).collect()
        )
        assert got == exp, f"span={span}"


def test_pack_shards_budget_semantics(spark):
    """Greedy sequential packing: a shard overflows by at most one
    document and never underfills (every shard but the last reaches the
    budget once its overflow doc lands)."""
    rows = [(i, "w " * 30) for i in range(40)]  # 30 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_shards(df, budget=100, group_span=8)
    per = (
        out.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n"))
        .orderBy("shard_id")
        .collect()
    )
    # 30-token docs against budget 100: shards carry docs whose START
    # offset is inside [s*100, (s+1)*100) -> 3 or 4 docs per shard
    assert all(int(r["n"]) in (3, 4) for r in per[:-1])
    with pytest.raises(ValueError):
        pack_shards(df, budget=0)


def test_pack_shards_precomputed_count_col(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "doc_id long, n_tok long"
    )
    got = sorted(
        (int(r["doc_id"]), int(r["shard_id"]))
        for r in pack_shards(df, budget=15, count_col="n_tok").collect()
    )
    # starts at 0, 10, 20 -> shards 0, 0, 1
    assert got == [(1, 0), (2, 0), (3, 1)]


@pytest.mark.slow
def test_pack_shards_fuzz_matches_flat_replay(spark):
    """Hypothesis fuzz: random (sparse-id, token-count) corpora packed
    at random budgets and group spans always equal the flat sequential
    replay — the decomposition can never leak into the answer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=0, max_value=400),
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[0],
        ),
        budget=st.integers(min_value=1, max_value=500),
        span=st.sampled_from([1, 3, 50, 10_000]),
    )
    @settings(max_examples=12, deadline=None)
    def check(rows, budget, span):
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        got = sorted(
            (int(r["doc_id"]), int(r["n_tokens"]), int(r["shard_id"]))
            for r in pack_shards(
                df, budget=budget, count_col="n_tok", group_span=span
            ).collect()
        )
        cum, exp = 0, []
        for did, nt in sorted(rows):
            exp.append((did, nt, cum // budget))
            cum += nt
        assert got == exp

    check()


# ---------------------------------------------------------------------------
# weighted_sample_grouped (q126): per-group sequential-Poisson quotas
# ---------------------------------------------------------------------------


def test_grouped_weighted_sample_matches_python_replay(spark):
    from esper_tv_spark.operators.corpus import _KNUTH, _M32, weighted_sample_grouped

    rows = [(i, f"s{i % 3}", (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, w LONG")
    got = {
        (r.doc_id, r.source, r.draw_rank)
        for r in weighted_sample_grouped(df, "source", "w", 4).collect()
    }
    by_src = {}
    for i, s, w in rows:
        u = ((i * _KNUTH) % _M32 + 0.5) / _M32
        by_src.setdefault(s, []).append((round(u / w, 9), i))
    want = set()
    for s, ks in by_src.items():
        for rank, (_, i) in enumerate(sorted(ks), start=1):
            if rank <= 4:
                want.add((i, s, rank))
    assert got == want


def test_grouped_weighted_sample_excludes_nonpositive_and_invariant(spark):
    from esper_tv_spark.operators.corpus import weighted_sample_grouped

    rows = [(1, "a", 5), (2, "a", 0), (3, "a", -1), (4, "a", None), (5, "b", 1)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, w INT")
    out = weighted_sample_grouped(df, "source", "w", 10)
    assert {r.doc_id for r in out.collect()} == {1, 5}
    a = {(r.doc_id, r.draw_rank) for r in weighted_sample_grouped(df.repartition(1), "source", "w", 10).collect()}
    b = {(r.doc_id, r.draw_rank) for r in weighted_sample_grouped(df.repartition(5), "source", "w", 10).collect()}
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_sample_grouped(df, "source", "w", 0)
