"""Part-of-speech tagging to a word/POS/position table.

The reference tokenizes every transcript with spaCy and stores a
word/POS/time table (/root/reference/app/esper/spacy_tokenize.py:22-76,
pos_from_str + do_tokenize).  spaCy is not available in this sandbox, so the
default path is a deterministic rule-based tagger (closed-class lexicon +
suffix rules, Penn-Treebank-ish tags) expressed as ONE CASE chain that runs
JVM-side in whole-stage codegen — the Spark Column and the DuckDB oracle SQL
are generated from the same ordered rule list, so cross-engine parity is by
construction.  When spaCy IS importable, `spacy_pos_table` gives the
reference-fidelity path as an Arrow-batched mapInPandas.

At scale the rule path is a pure projection over the exploded token table —
no shuffle at all beyond the explode's narrow dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from esper_tv_spark.operators.text import token_table

# closed-class lexicon: exact (lowercased) word -> tag.  First match wins.
CLOSED_CLASS: dict[str, str] = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP",
    "in": "IN", "on": "IN", "at": "IN", "of": "IN", "to": "IN",
    "with": "IN", "from": "IN", "by": "IN", "for": "IN", "over": "IN",
    "and": "CC", "or": "CC", "but": "CC",
    "is": "VBZ", "am": "VBP", "are": "VBP", "was": "VBD", "were": "VBD",
    "be": "VB", "been": "VBN",
    "will": "MD", "would": "MD", "can": "MD", "could": "MD", "may": "MD",
    "might": "MD", "must": "MD", "shall": "MD", "should": "MD",
    "not": "RB",
    # engine-domain adjectives in the synthetic corpus
    "fast": "JJ", "slow": "JJ", "big": "JJ", "small": "JJ",
}

# (suffix, tag) rules applied in order after the lexicon; "" = default tag.
SUFFIX_RULES: list[tuple[str, str]] = [
    ("ing", "VBG"),
    ("ed", "VBD"),
    ("ly", "RB"),
    ("est", "JJS"),
    ("er", "JJR"),
    ("s", "NNS"),
    ("", "NN"),
]


def pos_tag_expr(token: Column) -> Column:
    """The rule tagger as one Column CASE chain (codegen-friendly)."""
    low = F.lower(token)
    expr = None
    branches: list[tuple[Column, str]] = []
    branches.append((low.rlike("^[0-9]+([.][0-9]+)?$"), "CD"))
    for word, tag in CLOSED_CLASS.items():
        branches.append((low == F.lit(word), tag))
    for suffix, tag in SUFFIX_RULES[:-1]:
        branches.append((low.endswith(suffix) & (F.length(low) > len(suffix)), tag))
    for cond, tag in branches:
        expr = F.when(cond, tag) if expr is None else expr.when(cond, tag)
    return expr.otherwise(SUFFIX_RULES[-1][1])


def pos_tag_sql(token_sql: str) -> str:
    """The SAME rule chain as a DuckDB CASE expression."""
    low = f"lower({token_sql})"
    parts = [f"WHEN regexp_full_match({low}, '[0-9]+([.][0-9]+)?') THEN 'CD'"]
    for word, tag in CLOSED_CLASS.items():
        parts.append(f"WHEN {low} = '{word}' THEN '{tag}'")
    for suffix, tag in SUFFIX_RULES[:-1]:
        parts.append(
            f"WHEN suffix({low}, '{suffix}') AND length({low}) > {len(suffix)} THEN '{tag}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{SUFFIX_RULES[-1][1]}' END"


def pos_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, token, tag) — the reference's word/POS/time table shape
    (position stands in for time; the caption layer multiplies by fps)."""
    toks = token_table(df, id_col=id_col, text_col=text_col)
    return toks.withColumn("tag", pos_tag_expr(F.col("token")))


def spacy_pos_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: str = "en_core_web_sm",
    nlp_factory=None,
) -> DataFrame:
    """Reference-fidelity spaCy tagging (spacy_tokenize.py:22-76) as an
    Arrow-batched mapInPandas.

    `nlp_factory` is the injectable model loader: a zero-arg callable,
    invoked ONCE PER PARTITION on the executor, returning any callable with
    spaCy's minimal Doc interface (``nlp(text)`` iterates tokens exposing
    ``.text`` and ``.tag_``).  Default loads the real spaCy model (raises
    ImportError when spaCy is absent — callers fall back to pos_table); a
    frozen/stub model exercises the identical mapInPandas path in tests, so
    the real-NLP plumbing (per-partition model load, batch iteration, row
    explosion, schema) is covered without the dependency."""
    if nlp_factory is None:
        try:
            import spacy  # noqa: F401
        except ImportError as e:  # pragma: no cover - spacy not in sandbox
            raise ImportError("spaCy not installed; use pos_table (rule-based)") from e

        def nlp_factory():  # pragma: no cover
            import spacy

            return spacy.load(model, disable=["parser", "ner"])

    schema = f"{id_col} long, pos int, token string, tag string"

    def tag_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        nlp = nlp_factory()
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for i, tok in enumerate(nlp(row[text_col])):
                    out.append((row[id_col], i, tok.text, tok.tag_))
            yield pd.DataFrame(out, columns=[id_col, "pos", "token", "tag"])

    return df.select(id_col, text_col).mapInPandas(tag_partition, schema)
