"""Generate the golden spaCy token/POS fixture parquet.

The reference tokenizes transcripts with spaCy and stores a word/POS table
(/root/reference/app/esper/spacy_tokenize.py:22-76).  spaCy is not
installable in this container, so the expected outputs below are
HAND-AUTHORED from spaCy's publicly documented tokenizer semantics
(https://spacy.io/usage/linguistic-features#tokenization):

- contractions split by tokenizer exceptions: "Don't" -> "Do" + "n't",
  "can't" -> "ca" + "n't", "it's" -> "it" + "'s", "We'll" -> "We" + "'ll";
- abbreviations protected by exceptions: "U.S." stays one token;
- prefix/suffix punctuation split off as their own tokens: "(maybe)." ->
  "(" + "maybe" + ")" + ".";
- Penn-Treebank tag set, with -LRB-/-RRB- for parentheses and "." for
  sentence-final punctuation.

Run from the repo root to (re)write the two parquet files next to this
script; tests/test_sentiment_pos.py replays the pipeline against them with
a frozen stub model through the REAL mapInPandas path.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

DOCS = [
    (0, "Don't stop the engine."),
    (1, "She's running fast, isn't she?"),
    (2, "I can't believe it's 2020."),
    (3, "The U.S. economy grew 2.5% last year."),
    (4, "We'll see you at 3 pm (maybe)."),
]

# (doc_id, pos, token, tag) — the word/POS table shape of the reference.
GOLDEN = [
    (0, 0, "Do", "VB"), (0, 1, "n't", "RB"), (0, 2, "stop", "VB"),
    (0, 3, "the", "DT"), (0, 4, "engine", "NN"), (0, 5, ".", "."),
    (1, 0, "She", "PRP"), (1, 1, "'s", "VBZ"), (1, 2, "running", "VBG"),
    (1, 3, "fast", "RB"), (1, 4, ",", ","), (1, 5, "is", "VBZ"),
    (1, 6, "n't", "RB"), (1, 7, "she", "PRP"), (1, 8, "?", "."),
    (2, 0, "I", "PRP"), (2, 1, "ca", "MD"), (2, 2, "n't", "RB"),
    (2, 3, "believe", "VB"), (2, 4, "it", "PRP"), (2, 5, "'s", "VBZ"),
    (2, 6, "2020", "CD"), (2, 7, ".", "."),
    (3, 0, "The", "DT"), (3, 1, "U.S.", "NNP"), (3, 2, "economy", "NN"),
    (3, 3, "grew", "VBD"), (3, 4, "2.5", "CD"), (3, 5, "%", "NN"),
    (3, 6, "last", "JJ"), (3, 7, "year", "NN"), (3, 8, ".", "."),
    (4, 0, "We", "PRP"), (4, 1, "'ll", "MD"), (4, 2, "see", "VB"),
    (4, 3, "you", "PRP"), (4, 4, "at", "IN"), (4, 5, "3", "CD"),
    (4, 6, "pm", "NN"), (4, 7, "(", "-LRB-"), (4, 8, "maybe", "RB"),
    (4, 9, ")", "-RRB-"), (4, 10, ".", "."),
]


def main() -> None:
    docs = pa.table(
        {"doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
         "text": pa.array([d[1] for d in DOCS], pa.string())}
    )
    golden = pa.table(
        {"doc_id": pa.array([g[0] for g in GOLDEN], pa.int64()),
         "pos": pa.array([g[1] for g in GOLDEN], pa.int32()),
         "token": pa.array([g[2] for g in GOLDEN], pa.string()),
         "tag": pa.array([g[3] for g in GOLDEN], pa.string())}
    )
    pq.write_table(docs, os.path.join(HERE, "spacy_docs.parquet"))
    pq.write_table(golden, os.path.join(HERE, "spacy_golden.parquet"))
    print(f"wrote {len(DOCS)} docs, {len(GOLDEN)} golden rows")


if __name__ == "__main__":
    main()
