"""Corpus pipeline operators: decontamination, stratified sampling,
token-window chunking."""

from pyspark.sql import functions as F

from esper_tv_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    portable_hash,
    stratified_sample_exact,
)
from esper_tv_spark.plans.introspect import has_broadcast_join


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_ngrams(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words in this one here now"),
            (3, "quick brown fox jumps over something else entirely"),
        ],
    )
    bench = _docs(spark, [(100, "a quick brown fox jumps over fences daily")])
    out = {r["doc_id"]: (r["n_collisions"], r["contaminated"]) for r in decontaminate(corpus, bench, n=5).collect()}
    # doc 1 shares the 5-gram "quick brown fox jumps over"; doc 3 too; doc 2 clean
    assert out[1][1] and out[3][1] and not out[2][1]
    assert out[2][0] == 0 and out[1][0] >= 1


def test_decontaminate_benchmark_broadcasts(spark):
    corpus = _docs(spark, [(i, f"word{i} filler text body here") for i in range(50)])
    bench = _docs(spark, [(999, "tiny benchmark text body here")])
    assert has_broadcast_join(decontaminate(corpus, bench, n=3))


def test_stratified_sample_exact_counts_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    a = sorted(tuple(r) for r in stratified_sample_exact(df, "source", 7).collect())
    # repartitioning must not change the chosen rows
    b = sorted(
        tuple(r) for r in stratified_sample_exact(df.repartition(13), "source", 7).collect()
    )
    assert a == b and len(a) == 21
    # small strata are returned whole
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert stratified_sample_exact(tiny, "source", 10).count() == 2


def test_portable_hash_matches_duckdb(spark):
    """DuckDB parity INCLUDING the int64-overflow regime: ids past ~3.5e9
    are exactly where the naive multiply broke (found by the sf1
    rehearsal), so the parity sweep must cover them — the DuckDB side
    needs a HUGEINT cast (128-bit) for the same reason the oracles do."""
    import random

    import duckdb

    rng = random.Random(7)
    ids = (
        list(range(0, 5000, 97))
        + [2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**33 + 5, 2**62 - 1]
        + [rng.randrange(0, 2**62) for _ in range(50)]
    )
    got = {
        r["id"]: r["h"]
        for r in spark.createDataFrame([(i,) for i in ids], "id long")
        .select("id", portable_hash(F.col("id")).alias("h"))
        .collect()
    }
    want = dict(
        duckdb.connect()
        .execute(
            "SELECT i, CAST((i::HUGEINT * 2654435761) % 4294967296 AS BIGINT)"
            " FROM unnest(?::BIGINT[]) AS t(i)",
            [ids],
        )
        .fetchall()
    )
    assert got == want


def test_chunk_documents_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = _docs(spark, [(1, words), (2, "short doc only"), (3, "")])
    out = chunk_documents(df, chunk_tokens=32, overlap=8)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: stride 24, chunks at 0,24,48,72 -> ceil((100-8)/24)=4 chunks
    assert sorted(c for d, c in rows if d == 1) == [0, 1, 2, 3]
    c0, c1 = rows[(1, 0)], rows[(1, 1)]
    assert c0["n_tokens"] == 32 and c0["chunk_text"].startswith("w0 ")
    # overlap: chunk 1 starts 8 tokens before chunk 0 ends
    assert c1["chunk_text"].split(" ")[0] == "w24"
    assert c0["chunk_text"].split(" ")[-8:] == c1["chunk_text"].split(" ")[:8]
    # last chunk is short but present; every token appears in some chunk
    assert rows[(1, 3)]["n_tokens"] == 100 - 72
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered.update(r["chunk_text"].split(" "))
    assert len(covered) == 100
    # short doc -> single chunk; empty doc -> no rows
    assert rows[(2, 0)]["n_tokens"] == 3
    assert not any(d == 3 for d, _ in rows)


def test_repetition_stats_known_values(spark):
    from esper_tv_spark.operators.corpus import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),       # bigrams: ab ba ab ba -> 4 total, 2 distinct
            (2, "x y z"),           # xy yz -> all unique
            (3, "w w w w"),         # ww ww ww -> one gram, 3 occurrences
            (4, "solo"),            # < n tokens: excluded
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, n=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_grams"] == 4 and out[1]["distinct_grams"] == 2
    assert out[1]["dup_gram_frac"] == 1.0 and out[1]["top_gram_count"] == 2
    assert out[2]["dup_gram_frac"] == 0.0 and out[2]["top_gram_frac"] == 0.5
    assert out[3]["n_grams"] == 3 and out[3]["distinct_grams"] == 1
    assert out[3]["top_gram_frac"] == 1.0


def test_redact_pii_masks_and_counts(spark):
    from esper_tv_spark.operators.corpus import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or 555-000-1111"),
            (3, "host 192.168.1.200 down"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in redact_pii(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["text_redacted"] == "mail [EMAIL] now"
    assert out[2]["n_phone"] == 2 and out[2]["text_redacted"] == "call [PHONE] or [PHONE]"
    assert out[3]["n_ipv4"] == 1 and out[3]["text_redacted"] == "host [IPV4] down"
    # the SSN rule must win over the phone rule (masked as SSN, counted once)
    assert out[4]["n_ssn"] == 1 and out[4]["n_phone"] == 0
    assert out[4]["text_redacted"] == "ssn [SSN] leaked"
    assert out[5]["text_redacted"] == "clean text only"
    assert all(out[5][f"n_{t}"] == 0 for t in ("email", "phone", "ipv4", "ssn"))


def test_source_mix_rates_math():
    from esper_tv_spark.operators.corpus import source_mix_rates

    counts = {"big": 900, "small": 100}
    r = source_mix_rates(counts, alpha=0.5)
    # alpha=0.5: weights 30/10 -> big keeps 750, small capped at 1.0 (250>100)
    assert r["small"] == 1.0
    assert abs(r["big"] - (1000 * 30 / 40) / 900) < 1e-12
    assert source_mix_rates({}) == {}
    # alpha=1 with default target is a no-op mix
    r1 = source_mix_rates(counts, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())


def test_mix_sources_deterministic_and_proportional(spark):
    from esper_tv_spark.operators.corpus import mix_sources

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_sources(df, {"a": 0.5, "b": 0.1})
    got1 = sorted(r["doc_id"] for r in out.collect())
    got2 = sorted(r["doc_id"] for r in mix_sources(df.repartition(7), {"a": 0.5, "b": 0.1}).collect())
    assert got1 == got2  # partitioning-independent
    na = sum(1 for i in got1 if i % 2 == 0)
    nb = len(got1) - na
    assert abs(na / 1000 - 0.5) < 0.1 and abs(nb / 1000 - 0.1) < 0.05
    # unknown sources drop
    assert mix_sources(df, {"zzz": 1.0}).count() == 0


def test_ingest_jsonl_quarantines_bad_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from esper_tv_spark.sources.ingest import ingest_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        'not json at all\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "three", "name": "bad type"}\n'
    )
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    good, bad = ingest_jsonl(spark, str(p), schema)
    assert sorted((r["id"], r["name"]) for r in good.collect()) == [(1, "ok"), (2, "also ok")]
    assert bad.count() == 2
