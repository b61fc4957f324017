"""Reciprocal-rank fusion (operators/retrieval.rrf_fuse): closed-form
contributions, rank determinism over rounded scores, multi-list
membership, and validation.  The e2e hybrid (BM25 + IVF probe) is
hash-gated by q109's DuckDB oracle."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esper_tv_spark.operators.retrieval import rrf_fuse


def _mk(spark, rows, score_type="double"):
    return spark.createDataFrame(rows, f"id long, s {score_type}")


def test_rrf_closed_form(spark):
    """Two 3-element lists with a known overlap: every fused score is
    the hand-computed sum of rounded 1/(60+rank) contributions."""
    a = _mk(spark, [(1, 0.9), (2, 0.8), (3, 0.7)])
    b = _mk(spark, [(2, 0.95), (4, 0.5), (1, 0.4)])
    got = {
        (int(r["doc_id"])): (r["rrf_score"], int(r["n_lists"]))
        for r in rrf_fuse(
            [(a, "id", "s", True), (b, "id", "s", True)], k=60, id_out="doc_id"
        ).collect()
    }

    def c(rank):
        return round(1.0 / (60 + rank), 9)

    exp = {
        1: (round(c(1) + c(3), 6), 2),
        2: (round(c(2) + c(1), 6), 2),
        3: (round(c(3), 6), 1),
        4: (round(c(2), 6), 1),
    }
    assert got == exp


def test_rrf_orders_by_fused_score_then_id(spark):
    a = _mk(spark, [(10, 1.0), (20, 0.9)])
    b = _mk(spark, [(20, 1.0), (10, 0.9)])
    rows = rrf_fuse([(a, "id", "s", True), (b, "id", "s", True)]).collect()
    # both ids have rank sets {1,2} -> equal fused scores; tie to smaller id
    assert [int(r["doc_id"]) for r in rows] == [10, 20]
    assert rows[0]["rrf_score"] == rows[1]["rrf_score"]


def test_rrf_rank_uses_rounded_scores(spark):
    """Scores differing only below round_digits rank as ties (id-broken)
    — the cross-engine determinism contract."""
    a = _mk(spark, [(2, 0.5000000001), (1, 0.5)])
    rows = rrf_fuse([(a, "id", "s", True)], round_digits=6).collect()
    by_id = {int(r["doc_id"]): r["rrf_score"] for r in rows}
    # id 1 wins rank 1 by the id tie-break despite the raw float edge
    assert by_id[1] > by_id[2]


def test_rrf_ascending_lists(spark):
    """descending=False ranks small-is-better scores (distances)."""
    a = _mk(spark, [(1, 0.1), (2, 0.2), (3, 0.3)])
    rows = rrf_fuse([(a, "id", "s", False)]).collect()
    assert [int(r["doc_id"]) for r in rows] == [1, 2, 3]


def test_rrf_validation():
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([(None, "id", "s", True)], k=0)


def test_rrf_weighted_lists(spark):
    """Weighted RRF: contribution w_i/(k+rank); closed-form check and
    validation."""
    a = _mk(spark, [(1, 0.9), (2, 0.8)])
    b = _mk(spark, [(2, 0.9), (1, 0.8)])
    got = {
        int(r["doc_id"]): r["rrf_score"]
        for r in rrf_fuse(
            [(a, "id", "s", True), (b, "id", "s", True)], k=60, weights=[2.0, 1.0]
        ).collect()
    }

    def c(w, rank):
        return round(w / (60 + rank), 9)

    assert got == {
        1: round(c(2.0, 1) + c(1.0, 2), 6),
        2: round(c(2.0, 2) + c(1.0, 1), 6),
    }
    # 2:1 weighting makes list a's ranking dominate: id 1 wins
    assert got[1] > got[2]
    with pytest.raises(ValueError):
        rrf_fuse([(a, "id", "s", True)], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        rrf_fuse([(a, "id", "s", True)], weights=[0.0])


# ------------------------------------------------ score interpolation


def test_interp_closed_form_and_gap_preservation(spark):
    """Min-max normalized linear fusion: closed form, and the property
    that separates it from RRF — score GAPS survive.  List a has a huge
    gap between ranks 1 and 2; under RRF both fusions are identical,
    under interpolation the gap dominates."""
    from esper_tv_spark.operators.retrieval import interp_fuse

    a = _mk(spark, [(1, 1.0), (2, 0.1), (3, 0.0)])
    b = _mk(spark, [(2, 0.9), (1, 0.8), (3, 0.7)])
    got = {
        int(r["doc_id"]): (r["fused_score"], r["n_lists"])
        for r in interp_fuse(
            [(a, "id", "s", True), (b, "id", "s", True)], weights=[0.7, 0.3]
        ).collect()
    }

    def n(s, mn, mx):
        return (s - mn) / (mx - mn)

    def c(w, s, mn, mx):
        return round(w * n(s, mn, mx), 9)

    want = {
        1: (round(c(0.7, 1.0, 0.0, 1.0) + c(0.3, 0.8, 0.7, 0.9), 6), 2),
        2: (round(c(0.7, 0.1, 0.0, 1.0) + c(0.3, 0.9, 0.7, 0.9), 6), 2),
        3: (round(c(0.7, 0.0, 0.0, 1.0) + c(0.3, 0.7, 0.7, 0.9), 6), 2),
    }
    assert got == want
    # gap preservation: id 1's .9 raw-score lead in list a outweighs
    # id 2's rank-1 in list b (RRF with these ranks would prefer id 2's
    # 1/(k+1)+1/(k+2) tie profile symmetric to id 1's — check the
    # interpolated order instead reflects the magnitude)
    assert got[1][0] > got[2][0]


def test_interp_ascending_constant_and_missing(spark):
    """Ascending (distance) lists flip so 1.0 is best; a constant list
    normalizes to 1.0 for every member; ids absent from a list
    contribute zero (n_lists records the coverage)."""
    from esper_tv_spark.operators.retrieval import interp_fuse

    dist = _mk(spark, [(1, 0.0), (2, 5.0)])  # ascending: 1 is best
    const = _mk(spark, [(2, 3.3), (3, 3.3)])
    got = {
        int(r["doc_id"]): (r["fused_score"], r["n_lists"])
        for r in interp_fuse(
            [(dist, "id", "s", False), (const, "id", "s", True)]
        ).collect()
    }
    assert got == {
        1: (1.0, 1),          # best distance, absent from const
        2: (0.0 + 1.0, 2),    # worst distance (0) + constant credit (1)
        3: (1.0, 1),
    }


def test_interp_validation(spark):
    from esper_tv_spark.operators.retrieval import interp_fuse

    a = _mk(spark, [(1, 0.9)])
    with pytest.raises(ValueError):
        interp_fuse([])
    with pytest.raises(ValueError):
        interp_fuse([(a, "id", "s", True)], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        interp_fuse([(a, "id", "s", True)], weights=[-1.0])


def test_mmr_skips_near_duplicate(spark):
    """Two near-identical top candidates: relevance order picks both first;
    MMR must demote the duplicate below the diverse third item — the one
    property q118's hash can't localize (it gates the whole trajectory)."""
    from esper_tv_spark.operators.retrieval import candidate_pairwise_sims, mmr_rerank
    from pyspark.sql import functions as F

    # query deliberately distinct from every candidate: if the query IS the
    # top candidate's direction, sim-to-picked == relevance and MMR
    # degenerates to the relevance order (no test power)
    rows = [
        (1, [0.9, 0.1, 0.4]),    # rel .909 — picked first
        (2, [0.9, 0.12, 0.41]),  # near-dup of 1 (sim .9998), rel .903
        (3, [0.8, -0.6, 0.0]),   # diverse (sim to 1 = .667), rel .800
    ]
    # step-2 scores: near-dup 0.7*.903-0.3*.9998 = .332; diverse
    # 0.7*.800-0.3*.667 = .360 -> diversity wins despite lower relevance
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    from esper_tv_spark.operators.similarity import cosine_topk

    qv = [1.0, 0.0, 0.0]
    cand = cosine_topk(emb, qv, 3, id_col="vec_id")
    sims = candidate_pairwise_sims(emb, id_col="vec_id")
    out = mmr_rerank(cand, sims, k=3, id_col="vec_id")
    picks = [r["vec_id"] for r in out.orderBy("pick").collect()]
    assert picks[0] == 1          # highest relevance first
    assert picks[1] == 3          # diversity beats the near-dup
    assert picks[2] == 2


def test_mmr_fewer_candidates_than_k(spark):
    from esper_tv_spark.operators.retrieval import candidate_pairwise_sims, mmr_rerank
    from esper_tv_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id INT, embedding ARRAY<DOUBLE>"
    )
    cand = cosine_topk(emb, [1.0, 0.0], 2, id_col="vec_id")
    out = mmr_rerank(cand, candidate_pairwise_sims(emb, id_col="vec_id"), k=5)
    assert out.count() == 2  # stops when candidates run out
