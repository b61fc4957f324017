"""Round-6 scale rehearsal: run the round's headline machinery at the
1000x (.scale/sf100) and 100x (.scale/sf10) fixtures with ZERO hand
confs — the operators' own default shuffle advice must carry them.

Steps (each appends one JSON line to .scale/rehearsal_r6.jsonl):

  1. q51 @ sf100 — planted-pair closed form (tools/verify_plants math):
     recovered/extra counts + wall.  SQL replay infeasible at this scale;
     the fixture's known answer IS the oracle.
  2. q37 @ sf100 — Spark wall with only the default advise_for_df sizing
     (the round-4 killer needed a hand conf; round-5 made the advice
     default-on — this is the proof it still completes).
  3. q56 @ sf100 — Spark wall (fused single-projection plan at 1000x).
  4. q85 @ sf100 — PRODUCTION path: frozen rank-init centroids
     (k = recommended_clusters(n) = 1432), BLAS assignment + BLAS grid
     cells.  The exact expression path is Theta(n^1.5 * dim) interpreted
     (~38h here by the sf1 measurement) and stays a small-scale gate.
  5. q85 fast path walls @ sf1 and sf10 — the <=4x-per-decade check.
  6. Full 87-query hash gate @ .scale/sf1 via tools/check.py (separate
     process; its own line).

Usage: nohup python tools/rehearse_r6.py > .scale/rehearsal_r6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

OUT = os.path.join(REPO, ".scale", "rehearsal_r6.jsonl")
SF1 = os.path.join(REPO, ".scale", "sf1")
SF10 = os.path.join(REPO, ".scale", "sf10")
SF100 = os.path.join(REPO, ".scale", "sf100")


def emit(row: dict) -> None:
    row["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main() -> None:
    # The rehearsal provisions the documented 48g local JVM (the same
    # environment deviation as check.py's SPARK_CHECK_DRIVER_MEMORY): at
    # sf100 the q51 probe's two vector-attach broadcasts build ~8GiB
    # relations each, and the heap-aware cutoff
    # (plans/partitions.broadcast_budget_bytes) routes them to a shuffle
    # join on small heaps — we want the rehearsal to exercise the
    # production map-side plan, so give it production memory.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

    import __spark_entry__ as m
    from esper_tv_spark import get_spark
    from verify_plants import expected_pairs, score_plants

    spark = get_spark("rehearse-r6")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()

    # ---- 1. q51 @ sf100: planted-pair closed form (executor-side score:
    # the pair stream is GBs at this scale — never collected) ------------
    want = expected_pairs(SF100, 50)
    hit, extra, wall = score_plants(spark, m, SF100, want)
    emit(
        {
            "step": "q51_sf100_plants",
            "planted": len(want),
            "recovered": hit,
            "extra": extra,
            "wall_s": wall,
        }
    )
    spark.catalog.clearCache()

    # ---- 2/3. q37, q56 @ sf100: Spark walls, default confs only
    # (count() materializes the full computation without shipping
    # multi-GB result sets to the driver) ---------------------------------
    for name in ("q37_jaccard_verify", "q56_commercial_detection"):
        t0 = time.time()
        n = qs[name](spark, SF100).count()
        emit({"step": f"{name}_sf100", "rows": n, "wall_s": round(time.time() - t0, 1)})
        spark.catalog.clearCache()

    # ---- 4. q85 @ sf100: production path (frozen centroids, BLAS) -------
    from pyspark.sql import functions as F

    from esper_tv_spark.operators.dedup import recommended_clusters, semantic_dedup

    emb = m._t(spark, SF100, "embeddings")
    n = m._parquet_num_rows(os.path.join(SF100, "embeddings.parquet"))
    k = recommended_clusters(n)
    t0 = time.time()
    cents = (
        emb.orderBy(F.col("vec_id").asc())
        .limit(k)
        .select(F.col("vec_id").alias("cluster"), F.col("embedding").alias("cvec"))
    )
    out = semantic_dedup(emb, k=k, threshold=0.4, centroids=cents)
    dups = out.where("is_dup").count()
    total = out.count()
    emit(
        {
            "step": "q85_sf100_production",
            "n": n,
            "k": k,
            "rows": total,
            "dups": dups,
            "wall_s": round(time.time() - t0, 1),
        }
    )
    spark.catalog.clearCache()

    # ---- 5. q85 fast walls @ sf1 / sf10 (the per-decade ratio) ----------
    walls = {}
    for tag, d in (("sf1", SF1), ("sf10", SF10)):
        embx = m._t(spark, d, "embeddings")
        nx = m._parquet_num_rows(os.path.join(d, "embeddings.parquet"))
        kx = recommended_clusters(nx)
        t0 = time.time()
        cx = (
            embx.orderBy(F.col("vec_id").asc())
            .limit(kx)
            .select(F.col("vec_id").alias("cluster"), F.col("embedding").alias("cvec"))
        )
        dx = semantic_dedup(embx, k=kx, threshold=0.4, centroids=cx)
        ddups = dx.where("is_dup").count()
        walls[tag] = round(time.time() - t0, 1)
        emit(
            {
                "step": f"q85_{tag}_production",
                "n": nx,
                "k": kx,
                "dups": ddups,
                "wall_s": walls[tag],
            }
        )
        spark.catalog.clearCache()
    emit(
        {
            "step": "q85_decade_ratio",
            "sf10_over_sf1": round(walls["sf10"] / max(walls["sf1"], 0.001), 2),
        }
    )
    spark.stop()

    # ---- 6. full hash gate @ sf1 (93 queries, own process) --------------
    # The bare-session gate defaults to a ~1g driver JVM; at sf1 that heap
    # OOMs mid-gate (first observed run: JVM died after 11 queries, the
    # remaining 76 failed ConnectionRefused).  SPARK_CHECK_DRIVER_MEMORY
    # is check.py's documented scale-rehearsal deviation — set it here.
    # 24g, not 12g: the round-6 run OOM'd a 12g heap at q60's result
    # collect (sf1 winnow pair set + canonicalization).
    # Stream stdout to a file so a mid-gate death can't lose the per-query
    # record (the first run's tail-only capture did).
    t0 = time.time()
    gate_log = os.path.join(REPO, ".scale", "gate_sf1_r6.log")
    env = dict(os.environ, SPARK_CHECK_DRIVER_MEMORY="24g")
    with open(gate_log, "w") as lf:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check.py"), SF1],
            stdout=lf,
            stderr=subprocess.STDOUT,
            cwd=REPO,
            env=env,
        )
    tail = [l for l in open(gate_log).read().splitlines() if l.strip()][-3:]
    emit(
        {
            "step": "full_gate_sf1",
            "rc": r.returncode,
            "tail": tail,
            "wall_s": round(time.time() - t0, 1),
        }
    )


if __name__ == "__main__":
    main()
