"""Lexicon-based sentiment scoring.

The reference stores per-segment sentiment as `polarity` / `subjectivity`
columns (/root/reference/app/query/models.py:100-101) and its query surface
ranks segments by them (queries/other_queries.py:97-112 "Positive/Negative
segments").  The stored scores came from an offline scorer; here the scorer
itself is part of the engine: an AFINN-style word lexicon joined against the
positional token table, aggregated per document.

Spark-first shape: the lexicon is a tiny dimension — explicitly
`broadcast()` so the join is map-side everywhere and the only shuffle is the
per-document aggregation.  At 100 TB of documents this plan is a scan +
broadcast-hash-join + partial/final agg: no skew risk (doc_id grouping), no
Python.

Scores follow the AFINN convention (integers in [-5, 5]);
polarity = sum(score) / (5 * n_matched)   in [-1, 1]
subjectivity = n_matched / n_tokens       in [0, 1]
Documents with no lexicon hit carry NULL polarity upstream (reference keeps
polarity nullable and filters `polarity__isnull=False`); score_documents
mirrors that by emitting only matched documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esper_tv_spark.operators.text import token_table

# AFINN-style integer scores. Includes common English sentiment terms plus
# the engine-domain words that appear in the synthetic corpus (fast/slow/...).
LEXICON: dict[str, int] = {
    # generic English (AFINN-96 flavored)
    "good": 3, "great": 3, "excellent": 4, "best": 3, "love": 3, "win": 4,
    "bad": -3, "terrible": -3, "worst": -3, "hate": -3, "fail": -2,
    "broken": -1, "wrong": -2, "error": -2, "problem": -2, "issue": -1,
    # engine-domain polarity
    "fast": 2, "slow": -2, "big": 1, "small": -1, "dup": -2,
}


def lexicon_df(spark: SparkSession, lexicon: dict[str, int] | None = None) -> DataFrame:
    lex = LEXICON if lexicon is None else lexicon
    return spark.createDataFrame(
        sorted(lex.items()), "token string, score int"
    )


def lexicon_values_sql(lexicon: dict[str, int] | None = None) -> str:
    """The same lexicon as an inline SQL VALUES list (for oracles)."""
    lex = LEXICON if lexicon is None else lexicon
    rows = ", ".join(f"('{w}', {s})" for w, s in sorted(lex.items()))
    return f"(VALUES {rows}) AS lex(token, score)"


def score_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lexicon: dict[str, int] | None = None,
) -> DataFrame:
    """(id, polarity, subjectivity, n_matched) per document with >=1 hit.

    polarity/subjectivity are rounded to 6 dp at source so the values are
    engine-portable (single double division, no accumulation-order issues:
    the numerator/denominator are exact integers)."""
    spark = df.sparkSession
    toks = token_table(df, id_col=id_col, text_col=text_col)
    lex = F.broadcast(lexicon_df(spark, lexicon))
    scored = toks.join(lex, on="token", how="left")
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count("score").alias("n_matched"),
        F.coalesce(F.sum("score"), F.lit(0)).alias("sum_score"),
    )
    return (
        agg.where(F.col("n_matched") > 0)
        .select(
            F.col(id_col),
            F.round(
                F.col("sum_score").cast("double") / (F.lit(5.0) * F.col("n_matched")), 6
            ).alias("polarity"),
            F.round(F.col("n_matched").cast("double") / F.col("n_tokens"), 6).alias(
                "subjectivity"
            ),
            F.col("n_matched"),
        )
    )


def score_documents_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    lexicon: dict[str, int] | None = None,
) -> str:
    """DuckDB oracle for score_documents (same rounding, same tie behavior)."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(list_filter(string_split({text_col}, ' '), x -> x <> '')) AS token
  FROM {table}
), scored AS (
  SELECT t.{id_col}, lex.score
  FROM toks t LEFT JOIN {lexicon_values_sql(lexicon)} ON t.token = lex.token
), agg AS (
  SELECT {id_col},
         count(*) AS n_tokens,
         count(score) AS n_matched,
         coalesce(sum(score), 0) AS sum_score
  FROM scored GROUP BY {id_col}
)
SELECT {id_col},
       round(CAST(sum_score AS DOUBLE) / (5.0 * n_matched), 6) AS polarity,
       round(CAST(n_matched AS DOUBLE) / n_tokens, 6) AS subjectivity,
       CAST(n_matched AS BIGINT) AS n_matched
FROM agg WHERE n_matched > 0
"""
