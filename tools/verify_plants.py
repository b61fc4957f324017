"""Closed-form check of q51 on a scale fixture: the PLANTED near-duplicate
pairs (tools/make_scale.py) are a known, linear-in-copies answer — this
tool runs the Spark q51 on a .scale dir and scores it against that
closed form, no DuckDB replay needed (the sf100 oracle would be a
multi-million-row SRP self-join in a single-threaded engine).

Expected pairs: for copy c and plant index i,
    (base_id_i + c*1_000_000,  base_id_i + c*1_000_000 + plant_offset)
where base_id_i is the i-th row id of the BASE corpus (sf0.1 parquet row
order) and plant_offset comes from make_scale.plant_offset — the same
derivation the builder used, so a fixture/checker drift is impossible.

Recovery below 100% is SRP recall (the banded index misses a slice of
borderline pairs identically in both engines — sf10 measured 4991/5000);
EXTRA pairs beyond the plants are cross-copy noise (should be ~0 at
dim 256) plus any base-corpus near-dups replicated per copy.

Usage: python tools/verify_plants.py <scale_dir> [plant_per_copy]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_scale import SRC, plant_offset


def expected_pairs(scale_dir: str, plant_per_copy: int = 50) -> set[tuple[int, int]]:
    base = pq.read_table(os.path.join(SRC, "embeddings.parquet"), columns=["vec_id"])
    ids = np.asarray(base["vec_id"])
    off = plant_offset(ids, plant_per_copy)
    n_base = len(ids)
    total = pq.read_metadata(os.path.join(scale_dir, "embeddings.parquet")).num_rows
    copies = round(total / (n_base + plant_per_copy))
    out = set()
    for c in range(copies):
        for i in range(plant_per_copy):
            a = int(ids[i]) + c * 1_000_000
            b = int(ids[i]) + c * 1_000_000 + off
            out.add((min(a, b), max(a, b)))
    return out


def score_plants(spark, entry_mod, scale_dir: str, want: set[tuple[int, int]]):
    """(recovered, extra, wall_s): q51's pair stream scored against the
    planted set EXECUTOR-side — a broadcast semi/anti join + count, never
    a driver collect (at sf100 the base corpus's own near-dups replicate
    x1000 copies and the pair stream is GBs — it blew
    spark.driver.maxResultSize on the first rehearsal attempt).  `extra`
    counts replicated base-corpus near-dups plus any cross-copy noise."""
    import time as _time

    from pyspark.sql import functions as F

    t0 = _time.time()
    pairs = entry_mod.queries()["q51_near_dup_embeddings"](spark, scale_dir).select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    )
    wdf = spark.createDataFrame(sorted(want), "a long, b long").withColumn(
        "__hit", F.lit(1)
    )
    row = (
        pairs.join(F.broadcast(wdf), ["a", "b"], "left")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("hit"),
        )
        .first()
    )
    hit = int(row["hit"] or 0)
    return hit, int(row["total"]) - hit, round(_time.time() - t0, 1)


def main() -> None:
    scale_dir = sys.argv[1]
    ppc = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    want = expected_pairs(scale_dir, ppc)

    import __spark_entry__ as m
    from esper_tv_spark import get_spark

    spark = get_spark("verify-plants")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    hit, extra, wall = score_plants(spark, m, scale_dir, want)
    print(
        f"planted {len(want)}  recovered {hit} ({hit / max(len(want), 1):.4f})  "
        f"extra {extra}  wall {wall:.1f}s"
    )
    assert hit / max(len(want), 1) >= 0.95, "planted-pair recall below 0.95"
    spark.stop()


if __name__ == "__main__":
    main()
