"""Iterative graph algorithms as DataFrame loops (Pregel-on-Catalyst).

Connected components already lives in operators/dedup.py (pointer-jumped
min-label, the dedup-group use-case).  This module holds ranking-style
iterative algorithms; the first is PageRank.

Determinism is the design constraint: a float PageRank's Σ rank/outdeg is
re-associated by every shuffle, so no two runs (let alone two engines)
hash-match.  This implementation is EXACT-INTEGER fixed point instead:
ranks are bigints scaled by `scale`, per-edge contributions use integer
division (`div` in Spark, `//` in DuckDB — identical on non-negative
values), and the damping update is (15·scale) div 100 + (85·Σ) div 100.
Every engine that does 64-bit integer arithmetic reproduces the result
bit-for-bit, which is what lets a DuckDB oracle replay the loop unrolled
as k chained CTEs.

Scale shape: each iteration is one join (edges ⋈ ranks on src — ranks is
the small, per-node side; Catalyst picks broadcast when it fits, shuffle
hash otherwise) + one groupBy(dst) sum (partial-aggregated).  The node and
degree tables are computed once and reused.  Lineage grows linearly with
iterations, so the loop truncates it with localCheckpoint every
`checkpoint_every` rounds — without that, 50+ iterations would replan an
ever-deeper tree per action (the classic iterative-Spark failure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**9,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
    persist_loop_tables: bool | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list; returns (node, pr)
    with pr a bigint in units of 1/scale.

    Every node starts at `scale` (so total mass ≈ n·scale) and updates as
        pr' = (100-damping_pct)·scale div 100
            + damping_pct·Σ_{(u,v)∈E} (pr_u div outdeg_u) div 100.
    Dangling nodes (no out-edges) leak their mass — standard for the
    "walk with teleport" formulation on graphs where every node of
    interest has out-edges; symmetrize the edge list (add reverse edges)
    when the input is bipartite-directed, which also guarantees
    outdeg ≥ 1 for every node.

    Overflow headroom: damping_pct·Σ must fit in int64, i.e. per-node
    incoming mass < 9.2e18/damping_pct ≈ 1e17 at the default scale=1e9 —
    a single node would need to receive the ENTIRE rank of a 1e8-node
    graph to overflow; for larger graphs lower `scale`.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if persist_loop_tables is None:
        persist_loop_tables = iters > 0
    if persist_loop_tables and iters > 0:
        # Lineage-truncate the tables every iteration re-consumes.  The
        # final action's tree otherwise re-derives the edge source once
        # per REFERENCE — `edges` appears in nodes (2x), deg, and e, and
        # nodes/e once per iteration, so even 3 iterations re-run the
        # upstream join/distinct ~7x inside ONE action (r10 bench: 33
        # exchanges, 5.4s at sf0.1).  localCheckpoint(eager=False) beats
        # .persist() here (MEASURED, sf0.1 x 3 iters: 3.6s checkpoint vs
        # 6.2s unpersisted vs 11.5s MEMORY_AND_DISK persist): the
        # checkpointed RDD truncates the PLAN, so each iteration is a
        # shallow tree over materialized partitions, while persist keeps
        # the full logical plan and pays cache-write + replan per round.
        # Fault-tolerance loss is the documented localCheckpoint trade —
        # the loop already accepts it for `ranks` below.
        edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.select(src, dst).join(deg, src)
    if persist_loop_tables and iters > 0:
        nodes = nodes.localCheckpoint(eager=False)
        e = e.localCheckpoint(eager=False)
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.withColumn("pr", F.lit(int(scale)).cast("long"))
    for i in range(iters):
        contrib = e.join(ranks, e[src] == ranks["node"]).select(
            F.col(dst).alias("node"), F.expr("pr div outdeg").alias("c")
        )
        inc = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(int(base))
                + F.expr(f"({int(damping_pct)} * coalesce(inc, 0L)) div 100")
            ).cast("long").alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts via degree-ordered orientation — the
    clustering-structure primitive (community detection, spam/bot scoring,
    graph quality metrics for link corpora).

    The naive plan enumerates every wedge (two-hop path) and closes it:
    O(Σ deg²) — a high-degree hub in a 100-TB web graph makes that
    explode.  Degree orientation is the standard fix (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    orient each undirected edge from the LOWER (degree, id) endpoint to
    the higher; every triangle then has exactly ONE wedge whose center is
    its minimum-rank vertex, and oriented out-degree is O(sqrt(m)) for ANY
    degree distribution — the hub's wedges collapse from deg² to m.

    Input: an edge list, either direction, duplicates tolerated (the
    operator canonicalizes + distincts; self-loops dropped).  Output:
    (node, triangles) for every node with >= 1 triangle.

    Shape: one distinct (canonical edges), one degree groupBy, one
    self-join on the oriented wedge center, one join to close the wedge
    (semi shape on the canonical edge set), one explode + count groupBy —
    all equi-joins on ids, no Python anywhere.  The canonical edge set
    and the oriented edges are each consumed by several branches of the
    returned plan; left uncached, Catalyst re-derives the whole upstream
    per reference (measured: 206 exchanges at sf0.01 vs 13 cached) —
    site-keyed persists bound that to one computation each.

    Join strategy is SIZE-ADAPTIVE (r10): when the canonical edge set
    fits the session's broadcast budget (plans.partitions.
    broadcast_budget_bytes — the e/oriented tables are the same row
    count), the degree attach, the wedge self-join and the wedge-closing
    join all run as broadcast hash joins, so NEITHER the edge set nor
    the Θ(Σ outdeg²) wedge stream is ever shuffled — at sf0.1 (1.2M
    edges, ~35M wedges) that removes the two widest exchanges and cut
    the bench row 7.9s → ~5.5s.  Past the budget the plan falls back to
    the shuffle joins, which scale unbounded (a 100-TB edge set cannot
    broadcast; the wedge shuffle is then the honest cost).  The choice
    is made from the MEASURED edge count (one count on the already-
    persisted edge table, not an estimate), and cannot change results —
    join strategy is value-invariant.
    """
    from esper_tv_spark.plans.cache import register_persisted
    from esper_tv_spark.plans.partitions import broadcast_budget_bytes

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    e = register_persisted("graph.triangle_count.edges", e)
    # ~64 bytes/row of HashedRelation state for two longs; measured count
    # on the persisted table, no Spark-estimate guesswork
    n_e = e.count()
    bcast_ok = n_e * 64 <= broadcast_budget_bytes(e.sparkSession)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): lo -> hi
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    if bcast_ok:
        du, dv = F.broadcast(du), F.broadcast(dv)
    ranked = e.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    oriented = register_persisted("graph.triangle_count.oriented", oriented)
    # wedges centered at the min-rank vertex: lo -> x, lo -> y (x < y)
    o1 = oriented.select(F.col("lo").alias("c"), F.col("hi").alias("x"))
    o2 = oriented.select(F.col("lo").alias("c"), F.col("hi").alias("y"))
    wedges = o1.join(F.broadcast(o2) if bcast_ok else o2, "c").where(
        F.col("x") < F.col("y")
    )
    # close the wedge against the canonical undirected edge set (already
    # (min, max)-canonical by construction)
    closer = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    if bcast_ok:
        closer = F.broadcast(closer)
    tris = wedges.join(closer, ["x", "y"])  # (c, x, y) = one triangle each
    # single consumer: explode the three corners in one pass (the union-
    # of-three-projections shape consumed tris 3x and needed a persist)
    per_node = (
        tris.select(F.explode(F.array("c", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node
