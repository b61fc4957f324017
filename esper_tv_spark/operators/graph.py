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

    Shape (r10b — edge-iterator intersection instead of wedge
    materialization, guide §2.3/§2.4): one distinct (canonical edges),
    one degree groupBy, one groupBy(lo) building each node's oriented
    out-neighbor ARRAY, then ONE pass over the oriented edges attaching
    both endpoints' arrays and intersecting them per row
    (`array_intersect`) — each common neighbor w closes the triangle
    (lo, hi, w), and because orientation is a DAG under the total
    (degree, id) order, every triangle is found exactly once, at its
    lowest-ranked edge with w the top-ranked corner.  The arithmetic work
    is the same Θ(Σ outdeg²) the wedge join pays, but it runs inside one
    codegen'd projection: the Θ(Σ outdeg²) wedge stream (~35M rows at
    sf0.1 for 1.2M edges) is never materialized as join input, and the
    wedge-closing join disappears.  Corner counting emits 2 rows per
    triangle-carrying edge (lo/hi with the intersection size) plus 1 row
    per closing corner — bounded by 3x the triangle count, not by the
    wedge count.  The canonical edge set and the adjacency table are
    consumed by several branches; site-keyed persists bound each to one
    computation (unpersisted, Catalyst re-derived the upstream per
    reference — measured 206 exchanges at sf0.01 vs 13 cached).  The
    r10c refinement: `tri_edges` streams `explode(adj)` — the oriented
    edges with nb_lo pre-attached — instead of joining `oriented` back
    to the adjacency on lo, dropping one adjacency broadcast build (or
    one shuffle in the past-budget fallback) and leaving `oriented`
    single-consumer (its persist is gone; `adj` is persisted instead).

    Join strategy is SIZE-ADAPTIVE: when the measured edge count (one
    count() on the already-persisted edge table, not an estimate) fits
    the session's broadcast budget (plans.partitions.
    broadcast_budget_bytes — the adjacency table carries the same m
    endpoint ids, just grouped), the degree attach and both adjacency
    attaches run as broadcast hash joins and nothing wide is ever
    shuffled.  Past the budget the plan falls back to shuffle joins —
    still shuffling only the m-row edge/adjacency tables, never a wedge
    stream (a 100-TB edge set cannot broadcast; the m-row shuffles ARE
    the scale plan).  Strategy choice is value-invariant; per-node
    output is byte-identical either way.
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
    # per-node oriented out-neighbor arrays (out-degree is O(sqrt m)
    # under degree orientation, so each array — and each per-row
    # intersection below — is O(sqrt m) bounded for ANY degree
    # distribution).  The adjacency table is the persisted intermediate
    # (not `oriented`): exploding it regenerates the oriented edge rows
    # WITH each edge's nb_lo array already attached, so the old
    # oriented⋈a_lo attach join — a second broadcast build (or shuffle)
    # of the whole adjacency — disappears, and `oriented` is left with a
    # single consumer (guide §2.4/§3.1).
    adj = register_persisted(
        "graph.triangle_count.adj",
        oriented.groupBy("lo").agg(F.collect_list("hi").alias("nb")),
    )
    a_hi = adj.select(F.col("lo").alias("hi"), F.col("nb").alias("nb_hi"))
    if bcast_ok:
        a_hi = F.broadcast(a_hi)
    # inner join: an edge whose hi has no out-edges closes no triangle,
    # and explode(adj) enumerates exactly the oriented edges (every lo
    # has an adjacency row by construction)
    tri_edges = (
        adj.select("lo", F.col("nb").alias("nb_lo"), F.explode("nb").alias("hi"))
        .join(a_hi, "hi")
        .select("lo", "hi", F.array_intersect("nb_lo", "nb_hi").alias("ws"))
        .where(F.size("ws") > 0)
    )
    # corner contributions: lo and hi each close size(ws) triangles on
    # this edge; each w closes one
    sz = F.size("ws").cast("long")
    contrib = tri_edges.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.col("lo").alias("node"), sz.alias("c")),
                    F.struct(F.col("hi").alias("node"), sz.alias("c")),
                ),
                F.expr("transform(ws, w -> struct(w as node, 1L as c))"),
            )
        ).alias("s")
    ).select("s.node", "s.c")
    per_node = contrib.groupBy("node").agg(F.sum("c").alias("triangles"))
    return per_node
