"""Sentiment scorer, rule-based POS tagger, nearest-centroid classifier."""

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.operators import pos, sentiment, similarity


def test_sentiment_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "fast fast good"),      # scores 2+2+3=7, 3 matched / 3 tokens
            (2, "slow query"),          # -2, 1/2
            (3, "the table join"),      # no lexicon hits -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in sentiment.score_documents(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["polarity"] == pytest.approx(7 / 15)
    assert got[1]["subjectivity"] == 1.0
    assert got[1]["n_matched"] == 3
    assert got[2]["polarity"] == pytest.approx(-2 / 5)
    assert got[2]["subjectivity"] == 0.5


def test_sentiment_custom_lexicon(spark):
    df = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    got = sentiment.score_documents(df, lexicon={"x": 5}).collect()[0]
    assert got["polarity"] == 1.0  # 10 / (5*2)
    assert got["n_matched"] == 2


def test_pos_rules(spark):
    df = spark.createDataFrame(
        [(1, "the fast runner was running quickly over 42 tables")],
        "doc_id long, text string",
    )
    got = {r["token"]: r["tag"] for r in pos.pos_table(df).collect()}
    assert got["the"] == "DT"
    assert got["fast"] == "JJ"
    assert got["runner"] == "JJR"   # suffix rule: -er
    assert got["was"] == "VBD"
    assert got["running"] == "VBG"
    assert got["quickly"] == "RB"
    assert got["over"] == "IN"
    assert got["42"] == "CD"
    assert got["tables"] == "NNS"


def test_pos_positions_match_token_order(spark):
    df = spark.createDataFrame([(7, "a b  c")], "doc_id long, text string")
    rows = sorted(pos.pos_table(df).collect(), key=lambda r: r["pos"])
    assert [(r["pos"], r["token"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_pos_sql_matches_spark(spark):
    """The CASE chain generators must agree token-by-token."""
    import duckdb

    words = ["the", "fast", "running", "jumped", "slowly", "biggest", "cats",
             "12.5", "unknown", "is", "would", "b"]
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, w string")
    got_spark = {
        r["w"]: r["tag"]
        for r in df.withColumn("tag", pos.pos_tag_expr(F.col("w"))).collect()
    }
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    got_duck = dict(
        duckdb.sql(
            f"SELECT w, {pos.pos_tag_sql('w')} AS tag FROM (VALUES {vals}) t(i, w)"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_spacy_path_gated():
    df = None
    try:
        import spacy  # noqa: F401

        pytest.skip("spaCy installed; gating test not applicable")
    except ImportError:
        with pytest.raises(ImportError):
            pos.spacy_pos_table(df)


def test_nearest_centroid_separable(spark):
    """Two well-separated clusters: every held-out vector classifies home."""
    rows = []
    for i in range(20):
        label = i % 2
        base = [1.0, 0.0, 0.0] if label == 0 else [0.0, 1.0, 0.0]
        vec = [v + 0.01 * (i % 5) for v in base]
        rows.append((i, vec, label))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.nearest_centroid_classify(
        emb.where(F.col("vec_id") < 10), emb.where(F.col("vec_id") >= 10)
    )
    got = {r["vec_id"]: r["pred_label"] for r in out.collect()}
    assert len(got) == 10
    for vid, pred in got.items():
        assert pred == vid % 2
