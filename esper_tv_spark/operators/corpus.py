"""Training-corpus operations: benchmark decontamination, deterministic
stratified sampling, and token-window chunking.

These extend the LLM-data-pipeline layer (dedup/similarity/text) with the
remaining steps a 100 TB pretraining pipeline runs between "deduped corpus"
and "training shards". Everything is expression-only (whole-stage codegen,
no Python UDFs) and engine-portable: the sampling hash is Knuth
multiplicative (not Spark's xxhash64) so a DuckDB/Trino oracle computes the
identical sample.

Scale notes:
- decontaminate: the benchmark n-gram set is tiny next to the corpus —
  build it once, broadcast it, and the corpus side stays a scan + explode +
  broadcast-hash semi-join (no corpus shuffle at all).
- stratified_sample_exact: one shuffle on the stratum key; within-stratum
  order is by hashed id, so the sample is stable under reruns AND under
  corpus re-partitioning (row_number over an arbitrary order would not be).
- chunk_documents: pure per-row array algebra (sequence/slice/join), no
  shuffle; chunk boundaries depend only on the document itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash, mod 2^32 — identical arithmetic in any engine
# with 64-bit integers (DuckDB: (id * 2654435761) % 4294967296)
_KNUTH = 2654435761
_M32 = 1 << 32


def portable_hash(col: Column) -> Column:
    """Deterministic engine-portable pseudo-random rank in [0, 2^32).

    Overflow-safe for the full BIGINT id range (found by the sf1 scale
    rehearsal: a naive id * K breaks int64 once ids pass ~3.5e9, which
    key-shifted 100 TB ids certainly do). x*K mod 2^32 depends only on
    x mod 2^32, and that product is computed 16 bits at a time —
    (hi*K mod 2^32)*2^16 + lo*K — so every intermediate stays far below
    2^63 while the result is bit-identical to the naive formula (DuckDB
    replays it with a HUGEINT cast instead)."""
    x0 = F.pmod(col.cast("long"), F.lit(_M32))
    hi = F.floor(x0 / F.lit(65536)).cast("long")
    lo = F.pmod(x0, F.lit(65536))
    hi_term = F.pmod(F.pmod(hi * F.lit(_KNUTH), F.lit(_M32)) * F.lit(65536), F.lit(_M32))
    return F.pmod(hi_term + lo * F.lit(_KNUTH), F.lit(_M32))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus documents sharing any word n-gram with a benchmark set.

    The standard contamination check (n-gram collision against eval suites)
    run before training. Output: every `docs` row annotated with
    (n_collisions, contaminated). The benchmark n-gram set is broadcast, so
    the corpus-side plan is scan -> explode -> broadcast join -> groupBy on
    doc_id only.
    """
    def grams(df: DataFrame, idc: str) -> DataFrame:
        toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        d = df.select(F.col(idc).alias("__id"), toks.alias("__t"))
        d = d.where(F.size("__t") >= n)
        idxs = F.sequence(F.lit(0), F.size("__t") - F.lit(n))
        gram = F.transform(idxs, lambda i: F.array_join(F.slice("__t", i + 1, n), " "))
        return d.select("__id", F.explode(gram).alias("gram"))

    bench_grams = F.broadcast(grams(benchmark, bench_id_col).select("gram").distinct())
    doc_grams = grams(docs, id_col)
    hits = (
        doc_grams.join(bench_grams, "gram", "inner")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )
    return (
        docs.join(hits, docs[id_col] == hits["__id"], "left")
        .drop("__id")
        .withColumn("n_collisions", F.coalesce("n_collisions", F.lit(0)))
        .withColumn("contaminated", F.col("n_collisions") > 0)
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hashed-id rank.

    Deterministic (same rows every run, on any partitioning) and
    oracle-checkable: rank = Knuth hash of the id, ties impossible for
    distinct ids below 2^32. One shuffle on the stratum key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(portable_hash(F.col(id_col)), F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into token windows of `chunk_tokens` with `overlap`
    tokens of context carried between consecutive chunks — the
    training-shard / RAG chunking step. Short documents yield one chunk.

    Output: (id, chunk_id, chunk_text, n_tokens); pure array algebra, no
    shuffle, no UDF. The final chunk may be shorter; a trailing window
    fully contained in the previous one is not emitted.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    d = df.select(F.col(id_col), toks.alias("__t")).where(F.size("__t") > 0)
    # last chunk start: the largest multiple of stride still leaving new tokens
    n_chunks = F.greatest(
        F.ceil((F.size("__t") - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), (n_chunks - 1) * F.lit(stride), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice("__t", s + 1, chunk_tokens))
    return (
        d.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__c"))
        .select(
            id_col,
            "chunk_id",
            F.array_join("__c", " ").alias("chunk_text"),
            F.size("__c").alias("n_tokens"),
        )
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition metrics (the Gopher/MassiveText repetition
    filter family): documents dominated by repeated fragments are boilerplate
    or spam and get dropped before training.

    Output per doc: n_grams (total word n-grams), distinct_grams,
    dup_gram_frac (fraction of n-gram occurrences whose gram occurs more
    than once), top_gram_count and top_gram_frac (share of the single most
    common n-gram). One explode + one shuffle keyed by (doc, gram), partial
    aggs map-side; nothing touches Python.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    d = docs.select(F.col(id_col), toks.alias("__t")).where(F.size("__t") >= n)
    idxs = F.sequence(F.lit(0), F.size("__t") - F.lit(n))
    gram = F.transform(idxs, lambda i: F.array_join(F.slice("__t", i + 1, n), " "))
    counts = (
        d.select(id_col, F.explode(gram).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("distinct_grams"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            / F.sum("cnt")
        ).alias("dup_gram_frac"),
        F.max("cnt").alias("top_gram_count"),
        (F.max("cnt") / F.sum("cnt")).alias("top_gram_frac"),
    )


# PII patterns chosen to mean the same thing in Java regex (Spark) and RE2
# (DuckDB/Go scrubbers): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
# ssn/phone and ipv4/phone overlap: longest-and-most-specific first
_PII_ORDER = ["email", "ipv4", "ssn", "phone"]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Mask emails / IPv4s / SSNs / phone numbers with [TYPE] tokens and
    count matches per type (n_<type> columns) — the scrubbing pass every
    released training corpus runs. Pure regexp expressions: codegen'd,
    no shuffle, pushdown-friendly. Order masks specific patterns first so
    e.g. an SSN is not half-eaten by the phone rule.
    """
    out = docs
    for name in _PII_ORDER:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[name])))
    red = F.col(text_col)
    for name in _PII_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[name], f"[{name.upper()}]")
    return out.withColumn(out_col, red)


def source_mix_rates(
    counts: dict[str, int], alpha: float = 0.5, target_total: int | None = None
) -> dict[str, float]:
    """Per-source keep rates for temperature-based corpus mixing: sampling
    weight w_s ∝ n_s^alpha (alpha<1 upweights small sources — the
    multilingual/multi-source rebalancing rule), scaled so the expected
    kept total is `target_total` (default: the corpus size, i.e. pure
    rebalancing). Rates cap at 1.0 (no upsampling without replacement).
    Driver-side math over the per-source histogram — a dozen numbers, never
    the corpus."""
    if not counts:
        return {}
    total = sum(counts.values())
    if target_total is None:
        target_total = total
    w = {s: n**alpha for s, n in counts.items()}
    z = sum(w.values())
    return {s: min(1.0, target_total * w[s] / z / counts[s]) for s in counts}


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli thinning per source: keep a row iff
    portable_hash(id)/2^32 < rate(source). Pure filter expression — no
    shuffle, no RNG state, reproducible on any partitioning and in any
    engine (the hash is the Knuth multiplicative map). Sources absent from
    `rates` are dropped."""
    if not rates:
        return df.limit(0)
    items = list(rates.items())
    rate = F.when(F.col(source_col) == items[0][0], F.lit(float(items[0][1])))
    for s, p in items[1:]:
        rate = rate.when(F.col(source_col) == s, F.lit(float(p)))
    rate = rate.otherwise(F.lit(0.0))
    keep = portable_hash(F.col(id_col)).cast("double") / F.lit(float(_M32)) < rate
    return df.where(keep)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
    key_col: str = "sample_key",
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: SEQUENTIAL
    POISSON sampling (Ohlsson 1998, the PPS-without-replacement scheme
    statistical offices run) — take the n SMALLEST ξ = u / w, with the
    uniform DERIVED from the id: u = (knuth_hash(id) + 0.5) / 2^32,
    never 0 or 1 — so the same rows are drawn on any partitioning, any
    run, any engine.  This is the training-data op "sample documents
    proportional to a quality/importance weight" (temperature mixing
    picks per-SOURCE rates; this picks per-DOCUMENT mass) with the
    reproducibility a data pipeline audit needs.

    Why u/w and not Efraimidis-Spirakis' u^(1/w): the E-S key needs
    ln()/pow(), whose last-ulp varies BETWEEN ENGINES — the sf100 gate
    caught two top-50 keys whose 9th decimal disagreed between JVM and
    C++ ln().  ξ = u / w uses only IEEE division, which is CORRECTLY
    ROUNDED by spec: both engines produce bit-identical keys, no
    rounding crutch required (the round() kept here only normalizes
    display formatting; ids break residual ties).

    Plan: a filter (w > 0; zero/negative/null weights carry no mass and
    are excluded by the scheme's definition), one projection, and a
    TakeOrdered bottom-n — per-partition heaps, no global sort, no
    window; the corpus is never range-shuffled.  Output: the input
    columns plus the key (ascending = the draw order)."""
    if n <= 0:
        raise ValueError("weighted_sample needs n > 0")
    w = F.col(weight_col).cast("double")
    u = (portable_hash(F.col(id_col)).cast("double") + F.lit(0.5)) / F.lit(float(_M32))
    key = F.round(u / w, round_digits)
    return (
        df.where(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).asc(), F.col(id_col).asc())
        .limit(n)
    )


def pack_shards(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    count_col: "str | None" = None,
    text_col: str = "text",
    shard_col: str = "shard_id",
    group_span: int = 100_000,
) -> DataFrame:
    """Deterministic token-budget shard packing: documents in id order
    are laid end to end and cut into shards of ~`budget` tokens — the
    "pack the corpus into ~1B-token training shards" step, reproducible
    on any partitioning.  A document goes to the shard its FIRST token
    falls in (greedy sequential packing: shards overflow by at most one
    document, none underfill — exactly what a streaming packer does).

    Scale shape (the reason this is not one window): a cumulative sum
    over a global ORDER BY in Spark is a single-partition window — the
    whole corpus through one task.  This runs the classic two-level
    distributed prefix sum instead: ids are bucketed into coarse groups
    (floor(id / group_span)); within-group prefix sums are a
    partitioned window (distributed); per-group totals — one row per
    group, driver-small — get their running offsets via a window over
    that tiny table, broadcast back.  100 TB of documents flow through
    the partitioned window; only n_groups rows through the global one.

    Output: (id_col, n_tokens, shard_col).  `count_col` names a
    precomputed token-count column; default = whitespace token count of
    `text_col` (the q59 tokenizer's cheap stand-in)."""
    if budget <= 0:
        raise ValueError("pack_shards needs budget > 0")
    from pyspark.sql import Window

    if count_col is None:
        toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        n_tok = F.size(toks).cast("long")
    else:
        n_tok = F.col(count_col).cast("long")
    base = df.select(
        F.col(id_col),
        F.floor(F.col(id_col) / F.lit(group_span)).alias("__grp"),
        n_tok.alias("n_tokens"),
    )
    w_in = Window.partitionBy("__grp").orderBy(F.col(id_col).asc())
    within = base.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
    totals = base.groupBy("__grp").agg(F.sum("n_tokens").alias("__tot"))
    w_grp = Window.orderBy(F.col("__grp").asc())  # n_groups rows only
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_grp) - F.col("__tot"), F.lit(0))
    ).select("__grp", "__off")
    return (
        within.join(F.broadcast(offsets), "__grp")
        .select(
            id_col,
            "n_tokens",
            F.floor(
                (F.col("__off") + F.col("__cum_in") - F.col("n_tokens"))
                / F.lit(budget)
            ).alias(shard_col),
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi: float,
    k: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters via a distributed Misra-Gries sketch +
    exact recount — "which n-grams / domains / user-agents make up more
    than phi of a 100-TB corpus" without a full-cardinality groupBy.

    Semantics (exact, partitioning-independent): all keys with global
    count >= ceil(phi * n), with their exact counts.  The sketch only
    proposes CANDIDATES; a final exact count over the candidate set (a
    broadcast semi-join, then one partial-aggregated groupBy over the
    surviving rows) makes the output exact — the classic two-pass
    heavy-hitter pattern.

    Why it scales where groupBy(key) doesn't: the full-cardinality
    aggregate shuffles one row per DISTINCT key (token n-grams at corpus
    scale: billions); here the shuffled state is <= k counters per
    partition (k = ceil(1/phi), independent of data size), and the second
    pass aggregates only rows whose key is in the (<= k * n_partitions)
    candidate set.  Guarantee: Misra-Gries with k counters retains every
    key with partition-local frequency > n_p/(k+1); any global
    phi-heavy key is phi-heavy in at least one partition (averaging), and
    phi * n_p > n_p/(k+1) holds for k >= 1/phi — so candidates are a
    superset of the answer for ANY partitioning.  Summary merging inside a
    partition uses the mergeable-summaries procedure (Agarwal, Cormode,
    Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012): add
    counters, then subtract the (size-k+1)-th largest count and drop
    non-positives.

    The per-partition sketch runs in mapInPandas (Arrow-batched; a dict of
    <= a few k entries folded across batches — no per-row Python), the
    only Python boundary.  Ties at the threshold are kept (>=), so output
    is deterministic.

    Pass-count shape (r10, guide §1.2): TWO passes over the input, not
    three — the sketch pass already sees every row, so it also emits one
    per-partition row-count row (key NULL), and the global n is the sum
    of those instead of a separate full `count()` pass.  The tiny sketch
    output is site-persisted because both the candidate set and the
    total derive from it (and a re-evaluated mapInPandas under a
    different partitioning could propose a different — still correct —
    candidate superset; persisting pins one).  For a corpus-scale input
    that is 33% fewer full scans; identical output by construction
    (summed partition counts == count(*), candidates unchanged).
    """
    import math

    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    if k is None:
        k = max(1, math.ceil(1.0 / phi))

    import pandas as pd

    from esper_tv_spark.plans.cache import register_persisted

    def mg_partition(batches):
        counters: dict = {}
        nrows = 0
        for pdf in batches:
            nrows += len(pdf)
            vals = pdf[key_col].value_counts()
            for key, c in vals.items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                # mergeable-summaries shrink: subtract the (k+1)-th
                # largest count from everything, drop non-positives
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {x: c - kth for x, c in counters.items() if c - kth > 0}
        keys = list(counters.keys())
        yield pd.DataFrame(
            {key_col: keys + [None], "_pn": [0] * len(keys) + [nrows]}
        )

    sk = register_persisted(
        "corpus.heavy_hitters.sketch",
        df.select(key_col).mapInPandas(
            mg_partition, schema=f"{key_col} string, _pn long"
        ),
    )
    cand = sk.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    total = sk.agg(F.sum("_pn").alias("_n"))
    return (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("_n")))
        .select(key_col, "cnt")
    )


def weighted_sample_grouped(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    key_col: str = "sample_key",
    round_digits: int = 9,
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement —
    `weighted_sample`'s sequential-Poisson draw (ξ = u/w, the engine-
    portable key; see that docstring for why not Efraimidis-Spirakis)
    under a per-group quota: the n smallest keys WITHIN each group.  The
    training-data op "per-source sampling quotas weighted by document
    quality" — `stratified_sample_exact` (uniform per stratum) with
    per-row mass, or `weighted_sample` (global) with a group budget.

    Plan: one shuffle on the group key and a bounded row_number window
    per group — no global sort, no TakeOrdered (the quota is per group,
    so per-partition heaps don't apply); rows with w <= 0 or null carry
    no mass and are excluded, exactly as in the global scheme.  Output:
    input columns + key + within-group draw rank (1-based).
    """
    if n_per_group <= 0:
        raise ValueError("weighted_sample_grouped needs n_per_group > 0")
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    u = (portable_hash(F.col(id_col)).cast("double") + F.lit(0.5)) / F.lit(float(_M32))
    key = F.round(u / w, round_digits)
    win = Window.partitionBy(group_col).orderBy(F.col(key_col).asc(), F.col(id_col).asc())
    return (
        df.where(w > 0)
        .withColumn(key_col, key)
        .withColumn("draw_rank", F.row_number().over(win))
        .where(F.col("draw_rank") <= n_per_group)
    )
