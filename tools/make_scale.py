"""Build a 10x scale-rehearsal dataset (sf1) from the driver's sf0.1 data.

The driver ships sf0.001/0.01/0.1 only; proving that the banding / salting
/ bucket-cap machinery actually engages needs one decade more data. Each
table is replicated COPIES times with per-copy key shifting so FK
integrity, per-key cardinalities, and value distributions all hold — a
copy is a disjoint tenant, so per-user/per-doc work is identical and total
work should scale linearly (the thing the rehearsal asserts).

Two tables need more than a key shift, or the replication would MANUFACTURE
cross-copy duplicates and turn a linear dedup workload quadratic:

- embeddings: copy c multiplies each vector elementwise by a deterministic
  +-1 sign pattern. Sign flips are isometries — dot(s.x, s.y) = dot(x, y)
  for same-pattern vectors — so every within-copy cosine (and therefore
  q51's per-copy near-dup pair set) is EXACTLY preserved, while cross-copy
  cosines decorrelate to ~N(0, 1/sqrt(dim)), far below the 0.4 threshold.
- documents: copy c suffixes every token with _c<copy>, which destroys
  cross-copy shingle overlap while keeping within-copy Jaccard structure
  identical.

Writes to <out>/sf1/*.parquet (default .scale/ under the repo root —
gitignored; /root/testdata is read-only). Usage:

    python tools/make_scale.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"

KEY_SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 1_000_000},
}
COPY_ONCE = ["region", "nation"]


def build(copies: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # a <copies>-way UNION ALL nests one level per branch; the default
    # parser cap is 1000, which the sf100 (1000-copy) build exceeds
    con.sql(f"SET max_expression_depth TO {max(2000, copies * 2)}")
    # row order is irrelevant to every consumer; preserving it makes COPY
    # buffer the whole union (~60GB at 1000 copies) instead of streaming
    con.sql("SET preserve_insertion_order = false")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    for t, shifts in KEY_SHIFTS.items():
        selects = []
        for c in range(copies):
            cols = []
            for name, _t1, *_ in con.sql(f"DESCRIBE SELECT * FROM {src(t)}").fetchall():
                if name in shifts:
                    cols.append(f"{name} + {c * shifts[name]} AS {name}")
                else:
                    cols.append(name)
            selects.append(f"SELECT {', '.join(cols)} FROM {src(t)}")
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, con.sql(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0])

    for t in COPY_ONCE:
        con.sql(f"COPY (SELECT * FROM {src(t)}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")

    # documents: shift ids, decorrelate text across copies (suffix tokens)
    selects = ["SELECT * FROM " + src("documents")]
    for c in range(1, copies):
        # n_chars recomputed from the rewritten text — copying it verbatim
        # left 9/10 of the corpus with understated lengths, skewing any
        # metric relating n_chars to the actual text
        selects.append(
            f"SELECT doc_id + {c * 1_000_000} AS doc_id, "
            f"regexp_replace(text, '(\\S+)', '\\1_c{c}', 'g') AS text, "
            f"lang, source, "
            f"length(regexp_replace(text, '(\\S+)', '\\1_c{c}', 'g')) AS n_chars "
            f"FROM {src('documents')}"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )
    print("documents", con.sql(f"SELECT count(*) FROM '{out_dir}/documents.parquet'").fetchone()[0])

    # embeddings: shift ids, per-copy elementwise +-1 sign isometry.
    # Streamed one copy per row-group so a 1000-copy build never holds
    # more than one copy's rows in memory.
    base = con.sql(f"SELECT vec_id, embedding, label FROM {src('embeddings')}").fetchall()
    dim = len(base[0][1])
    ids = np.array([r[0] for r in base], dtype=np.int64)
    mat = np.array([r[1] for r in base], dtype=np.float32)
    labels = np.array([r[2] for r in base], dtype=np.int32)
    rng = np.random.RandomState(12345)
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    n = 0
    with pq.ParquetWriter(f"{out_dir}/embeddings.parquet", schema) as writer:
        for c in range(copies):
            signs = np.ones(dim, dtype=np.float32) if c == 0 else rng.choice(
                [-1.0, 1.0], size=dim
            ).astype(np.float32)
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(ids + c * 1_000_000, pa.int64()),
                        "embedding": pa.array((mat * signs).tolist(), pa.list_(pa.float32())),
                        "label": pa.array(labels, pa.int32()),
                    },
                    schema=schema,
                )
            )
            n += len(ids)
    print("embeddings", n)


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
    )
    build(copies, out)
    print("wrote", out)
