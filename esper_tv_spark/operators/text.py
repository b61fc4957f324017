"""Text / caption operators.

The reference's caption layer (phrase search, boolean query grammar, ngram
scan, topic segmentation — /root/reference/app/esper/captions.py:93-103,
rekall.py:101-140, topics.py:45-72) sits on a memory-mapped Rust inverted
index. Here captions/documents are plain DataFrames and every operator is a
composition of built-in functions (split/explode/windows) — JVM-side,
whole-stage-codegen'd, no UDFs. At 100 TB the token table is the "inverted
index": partitioned by token prefix it serves phrase lookups via
partition-pruned scans.

Also the training-data text analyses: language-ID (stopword-hit heuristic),
quality scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic (mirrors what a fastText-less
# pipeline can do with pure SQL).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "tokens") -> DataFrame:
    """Whitespace tokenization to an array column (reference tokenizes with
    spaCy at spacy_tokenize.py:22-76; plain split matches the fixture data
    and keeps the operator codegen'd)."""
    toks = F.split(F.col(text_col), " ")
    return df.withColumn(out_col, F.filter(toks, lambda t: t != F.lit("")))


def token_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Positional token table (doc_id, pos, token) — the inverted-index shape
    behind phrase search (caption postings carry positions,
    captions.py:111-118)."""
    toks = tokenize(df, text_col)
    return toks.select(F.col(id_col), F.posexplode("tokens").alias("pos", "token"))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term frequencies (reference word_counts,
    transcript_utils.py:56-71)."""
    return (
        token_table(df, df.columns[0], text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def phrase_search(df: DataFrame, phrase: str, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact phrase match -> (doc_id, n_matches) for docs containing it.

    Reference phrase_search (captions.py:93-96) counts every token position
    where the phrase starts. Implemented as a position-chain over the token
    array with higher-order functions (no join, no UDF): every start index i
    with tokens[i..i+n-1] == phrase tokens counts, so overlapping matches
    are included and runs of whitespace don't break matching. A coarse
    substring `contains` on the first word stays a necessary condition and
    is pushed into the parquet scan before the exact per-position check."""
    words = [w for w in phrase.split(" ") if w]
    if not words:
        raise ValueError("empty phrase")
    n = len(words)
    toks = tokenize(df.where(F.col(text_col).contains(words[0])), text_col)
    starts = F.when(
        F.size("tokens") >= F.lit(n),
        F.sequence(F.lit(0), F.size("tokens") - F.lit(n)),
    ).otherwise(F.array().cast("array<int>"))

    def match_at(i):
        cond = None
        for j, w in enumerate(words):
            c = F.element_at(F.col("tokens"), i + F.lit(j + 1)) == F.lit(w)
            cond = c if cond is None else (cond & c)
        return cond

    return (
        toks.withColumn("n_matches", F.size(F.filter(starts, match_at)).cast("long"))
        .where(F.col("n_matches") > 0)
        .select(F.col(id_col), "n_matches")
    )


def query_search(df: DataFrame, query: str, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Boolean caption-query grammar (reference query_search,
    captions.py:99-103; usage `'SEAN SPICER & [RESIGN]'` at
    other_queries.py:246-263):

        query   := clause ('&' clause)*        -- all clauses must match
        clause  := phrase | '[' phrase ('|' phrase)* ']'   -- any alternative

    Each phrase is an exact token-sequence match (phrase_search semantics,
    case-insensitive). Returns the distinct id rows of matching documents.
    Compiles to one boolean column expression — a single scan, no joins."""
    lowered = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def phrase_pred(phrase: str) -> Column:
        return lowered.contains(" " + phrase.strip().lower() + " ")

    cond = None
    for clause in query.split("&"):
        clause = clause.strip()
        if not clause:
            continue
        if clause.startswith("[") and clause.endswith("]"):
            alts = [a for a in clause[1:-1].split("|") if a.strip()]
            if not alts:
                continue
            c = phrase_pred(alts[0])
            for a in alts[1:]:
                c = c | phrase_pred(a)
        else:
            c = phrase_pred(clause)
        cond = c if cond is None else (cond & c)
    if cond is None:
        raise ValueError("empty query")
    return df.where(cond).select(F.col(id_col)).distinct()


def ngrams(df: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text", out_col: str = "ngram") -> DataFrame:
    """Token n-gram table via higher-order functions (no UDF): shingle i =
    tokens[i..i+n-1] joined by space."""
    toks = tokenize(df, text_col)
    # guard: Spark sequence(0, -1) would produce a *descending* sequence,
    # so docs shorter than n get an explicit empty shingle list
    idx = F.when(
        F.size("tokens") >= F.lit(n), F.sequence(F.lit(0), F.size("tokens") - F.lit(n))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(F.col("tokens"), i + 1, n), " "))
    return toks.select(F.col(id_col), F.explode(sh).alias(out_col))


def quality_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", keep_input: bool = False
) -> DataFrame:
    """Per-document quality features: token count, mean token length,
    punctuation ratio, stopword ratio (English list). The
    length/punct/stopword heuristics of a pretraining quality filter, as
    columnar expressions. keep_input=True appends the metrics to the input
    columns (map-side — lets a downstream quality gate avoid a self-join
    back to the source table)."""
    toks = tokenize(df, text_col)
    n_tokens = F.size("tokens")
    n_chars = F.length(F.col(text_col))
    sum_tok_len = F.aggregate(
        F.transform(F.col("tokens"), F.length), F.lit(0), lambda acc, v: acc + v
    )
    sw = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(sw, F.lower(t))))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    metrics = [
        n_tokens.cast("long").alias("n_tokens"),
        (sum_tok_len.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
    ]
    if keep_input:
        return toks.select(*df.columns, *metrics)
    return toks.select(F.col(id_col), *metrics)


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: per doc, count hits from each language's
    list; predict the argmax (ties -> lexicographically first language for
    determinism)."""
    toks = tokenize(df, text_col)

    def lang_hits(words: list[str]) -> Column:
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(F.col("tokens"), lambda t: F.array_contains(arr, F.lower(t))))

    hits = [
        lang_hits(words).alias(f"hits_{lang}") for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = toks.select(F.col(id_col), *hits)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"hits_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.withColumn("pred_lang", F.when(best > 0, pred).otherwise(F.lit("und")))


# GPT-2-style pretokenizer shape, ASCII-only so the Java (Spark) and RE2
# (DuckDB) regex engines agree byte-for-byte
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_tokens(df: DataFrame, text_col: str = "text", out_col: str = "bpe_tokens") -> DataFrame:
    """BPE-ish subword pretokenization (training-data token counting): the
    GPT-2 pretokenizer regex over ASCII classes. A real BPE merge table is a
    model artifact; the pretokenizer split is the engine-side operation and
    its count is the standard corpus-size proxy."""
    return df.withColumn(out_col, F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rolling-hash document fingerprints, winnowed (MOSS-style, tumbling
    variant): hash every char k-gram (md5 — portable rolling stand-in),
    keep the minimum hash per tumbling window of w positions, distinct.
    Output: (doc_id, fp). ~len/w fingerprints per doc; robust to small
    edits because an edit only perturbs the windows it touches.

    Relational shape: positions explode -> substring hash -> groupBy
    (doc, window) min -> distinct. The explode is len(text) rows per doc —
    fingerprinting is a map-side pipeline, the only shuffle is the min."""
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.length(text_col) - k + 1, F.lit(1))))
    g = df.select(F.col(id_col), F.col(text_col), pos.alias("__pos"))
    h = F.md5(F.expr(f"substring({text_col}, __pos, {k})"))
    return (
        g.select(F.col(id_col), F.floor((F.col("__pos") - 1) / w).alias("__win"), h.alias("fp"))
        .groupBy(id_col, "__win")
        .agg(F.min("fp").alias("fp"))
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-normalized text. The exact-dedup key."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))


def sliding_window_topic(
    df: DataFrame,
    lexicon: list[str],
    window_size: int,
    threshold: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Windowed topic segmentation (reference find_segments,
    transcript_utils.py:33-42, topics.py:45-72): slide a token window over
    each document; emit (doc_id, window_start_pos, hits) where the count of
    lexicon tokens in [pos, pos+window_size) >= threshold. Implemented as a
    rangeBetween window over the positional token table — one shuffle by
    doc, no self-join."""
    tt = token_table(df, id_col, text_col)
    lex = F.array([F.lit(w) for w in lexicon])
    hit = F.when(F.array_contains(lex, F.lower(F.col("token"))), 1).otherwise(0)
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rangeBetween(0, window_size - 1)
    )
    return (
        tt.withColumn("hits", F.sum(hit).over(w))
        .where(F.col("hits") >= threshold)
        .select(F.col(id_col), F.col("pos").alias("window_start"), F.col("hits").cast("long").alias("hits"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a bag-of-words query —
    the scoring layer a caption/transcript search surface sits on (the
    reference ranks caption hits by raw counts; BM25 is the standard
    upgrade and exercises the same postings substrate).

    Plan: one token explode filtered to the query terms BEFORE any shuffle
    (postings for 5 terms, not the whole vocabulary), tf/df aggregated from
    that tiny slice, document lengths from a second length-only projection
    (no explode), corpus stats broadcast. idf is the Robertson-Sparck-Jones
    form ln(1 + (N - df + .5)/(df + .5)), nonnegative.

    Output: (doc_id, score) for documents matching >= 1 term.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    lens = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = F.broadcast(lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ))
    post = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = F.broadcast(
        post.groupBy("term").agg(F.count_distinct(F.col(id_col)).alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        post.join(lens, id_col)
        .join(dfreq, "term")
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )
