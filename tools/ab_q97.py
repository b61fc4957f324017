"""Interleaved A/B: q97's LUT carrier — inline literal map (current
entry) vs broadcast LUT table (lut_literal_max_probe=2).  Row identity
asserted every pair.  Usage: python tools/ab_q97.py [pairs]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from esper_tv_spark.operators import similarity  # noqa: E402
from esper_tv_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-q97")
    emb = entry._t(spark, SF, "embeddings")
    idx = entry._ivfpq_index_dir(spark, SF)
    queries = emb.where(F.col("vec_id").isin([0, 7, 13])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def run(maxp):
        out = similarity.ivfpq_knn_join_index(
            spark, idx, queries, 10, n_probe=3, fast=True,
            lut_literal_max_probe=maxp,
        ).orderBy("qid", F.col("adist").asc(), "vec_id")
        t0 = time.time()
        rows = out.collect()
        return time.time() - t0, [tuple(r) for r in rows]

    # warmup (JVM/codegen caches) once per carrier
    run(16)
    run(2)
    lit_t, tab_t = [], []
    for i in range(pairs):
        order = [(16, lit_t), (2, tab_t)] if i % 2 == 0 else [(2, tab_t), (16, lit_t)]
        res = {}
        for maxp, acc in order:
            dt, rows = run(maxp)
            acc.append(round(dt, 3))
            res[maxp] = rows
        assert res[16] == res[2], "carrier outputs differ!"
        print(f"pair {i}: literal={lit_t[-1]} table={tab_t[-1]}", flush=True)
    print("literal runs:", lit_t, "best", min(lit_t))
    print("table   runs:", tab_t, "best", min(tab_t))
    spark.stop()


if __name__ == "__main__":
    main()
