"""Streaming near-duplicate detection: incremental MinHash-LSH over an
unbounded document stream.

The batch near-dup pipeline (operators/dedup.py) buckets the WHOLE corpus,
then pairs within buckets. On a stream, each arriving document must be
checked against everything seen so far — without rescanning the corpus.
The LSH decomposition makes that stateful-streaming-shaped:

- signature + banding are pure per-row projections (the shingle SET is
  computed inline with array_distinct — no groupBy, so no streaming-agg
  watermark restrictions), and
- candidate generation keys by (band, bucket): the seen-set per bucket
  lives in applyInPandasWithState state, each arrival emits pairs against
  the bucket's members and joins them.

State is O(bucket population); `max_bucket_size` applies the same
hot-bucket discipline as the batch path — a bucket at the cap is
non-discriminative boilerplate, so it stops emitting and stops growing
(bounding both output blowup and state memory). Pairs can repeat across
bands/batches; exact-once consumers dedup downstream (a keyed sink or
dropDuplicates with a watermark), same as the batch `.distinct()`.

Fed the same documents, the uncapped streaming candidate set equals the
batch `lsh_candidate_pairs` set (asserted in tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from esper_tv_spark.operators.dedup import lsh_buckets
from esper_tv_spark.operators.similarity import _round_half_away


def shingle_set_col(text_col: str = "text", shingle_n: int = 3) -> Column:
    """Distinct word-shingle set of one document as an array column — the
    per-row (stream-safe) twin of dedup.shingle_sets' groupBy build."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    idxs = F.when(
        F.size(toks) >= shingle_n,
        F.sequence(F.lit(0), F.size(toks) - F.lit(shingle_n)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.array_join(F.slice(toks, i + 1, shingle_n), " "))
    return F.array_distinct(grams)


def streaming_minhash_buckets(
    stream: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, band, bucket) for each arriving document — pure projections
    (shingle set inline, MinHash = array_min over transform, banding =
    inline explode), so it runs identically on a stream or a batch frame.
    Documents with no shingles (fewer than shingle_n tokens) are excluded,
    matching the batch pipeline."""
    sets = stream.select(
        F.col(id_col), shingle_set_col(text_col, shingle_n).alias("shingles")
    ).where(F.size("shingles") > 0)
    sig = sets.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform("shingles", lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)))
            ).alias(f"mh_{i}")
            for i in range(n_hashes)
        ],
    )
    return lsh_buckets(sig, n_bands, n_hashes // n_bands, id_col)


def streaming_lsh_candidates(
    stream: DataFrame,
    n_hashes: int = 8,
    shingle_n: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Incremental candidate pairs: every arriving document against the
    members already seen in each of its LSH buckets. Output
    (band, bucket, id_a, id_b) with id_a < id_b; duplicates across bands /
    batches are the consumer's dedup, as in the batch pipeline."""
    buckets = streaming_minhash_buckets(
        stream, n_hashes, shingle_n, n_bands, id_col, text_col
    )
    out_schema = "band int, bucket string, id_a long, id_b long"
    state_schema = "ids array<long>, capped boolean"

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, bucket = key
        if state.exists:
            ids, capped = state.get
            ids = list(ids)
        else:
            ids, capped = [], False
        rows: list[tuple] = []
        for pdf in pdf_iter:
            for new_id in sorted(int(x) for x in pdf[id_col]):
                if capped:
                    break
                if new_id in ids:
                    continue
                rows.extend(
                    (band, bucket, min(new_id, m), max(new_id, m)) for m in ids
                )
                ids.append(new_id)
                if max_bucket_size is not None and len(ids) >= max_bucket_size:
                    # non-discriminative hot bucket: freeze it (bounds both
                    # the quadratic pair blowup and state memory)
                    capped = True
        state.update((ids, capped))
        if rows:
            yield pd.DataFrame(rows, columns=["band", "bucket", "id_a", "id_b"])

    return buckets.groupBy("band", "bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_semantic_dedup(
    stream: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_cluster_size: int | None = 65536,
    cluster_probes: int = 1,
) -> DataFrame:
    """Streaming SemDeDup (Abbas et al. 2023): incremental semantic
    deduplication against FROZEN centroids — completes the streaming dedup
    family (exact / MinHash-LSH / semantic), mirroring the batch
    `operators.dedup.semantic_dedup` the way `streaming_lsh_candidates`
    mirrors `lsh_candidate_pairs`.

    Decomposition (the same two phases as batch, re-cast stream-shaped):

    - ASSIGNMENT is a pure per-row projection against the frozen centroid
      matrix — an Arrow-batched BLAS argmin (mapInPandas, stream-safe:
      stateless), identical math to `lloyd_assign_blas` (rounded d2,
      first-occurrence = smallest cluster id tie-break). Centroids are a
      driver-side list because a stream cannot collect a DataFrame
      mid-plan; freeze them with a batch job (the q48 pyspark.ml fit or
      lloyd init) exactly as every production scoring pipeline does.
    - The WITHIN-CLUSTER probe keys state by cluster
      (applyInPandasWithState): each cluster's seen (id, vector, norm)
      rows live in state; an arrival is a duplicate iff some
      ALREADY-SEEN cluster-mate has rounded cosine >= threshold. Rows in
      a micro-batch are processed in ascending id order, so when ingest
      is id-ordered (event-time ingest) the verdicts equal the batch
      operator's smaller-id rule — asserted stream==batch in
      tests/test_streaming_dedup.py.

    State is O(cluster occupancy) vectors; `max_cluster_size` bounds it —
    a full cluster stops storing NEW vectors (arrivals still get verdicts
    against the stored prefix; with id-ordered ingest that prefix is
    exactly the batch rule's smaller-id candidates up to the cap). Output:
    (id_col, cluster, is_dup).

    `cluster_probes=p > 1` is the RECALL knob the batch operator grew in
    round 6 (semantic_dedup(cluster_probes=...)): single-probe blocking
    measured only 74% planted-pair recall at sf1 because a ~0.95-cosine
    pair can straddle a cluster boundary; probing each vector's p nearest
    clusters recovers the boundary pairs (97.4% at p=2, 99.8% at p=3).
    Stream-shaped it means: the assignment projection emits p rows per
    vector (id, cluster, __rank) and each membership row probes (and
    joins) ITS cluster's state.  Spark allows only ONE stateful operator
    per streaming query (chained applyInPandasWithState raises
    AnalysisException), so the cross-membership OR cannot happen in-plan;
    with p > 1 the output is one row PER MEMBERSHIP
    (id_col, cluster, __rank, is_dup) and the consumer collapses verdicts
    downstream — `collapse_probe_verdicts` on the sink table, the same
    consumer-side discipline as streaming_lsh_candidates' cross-band pair
    dedup.  Collapsed, the result equals the batch
    semantic_dedup(cluster_probes=p) (asserted in
    tests/test_streaming_dedup.py).  State grows by the membership factor
    (each vector is stored in up to p cluster states), matching the batch
    pair-discovery table."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cent_rows = sorted(((int(c), list(map(float, v))) for c, v in centroids), key=lambda r: r[0])
    cids = np.array([r[0] for r in cent_rows], dtype=np.int64)
    cmat = _round_half_away(
        np.array([r[1] for r in cent_rows], dtype=np.float64), round_digits
    )
    ccsq = (cmat * cmat).sum(axis=1)

    p = max(1, int(cluster_probes))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d2 = _round_half_away(
                (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cmat.T) + ccsq[None, :],
                round_digits,
            )
            if p == 1:
                best = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].astype("int64"),
                        "cluster": cids[best],
                        "__v": [r.tolist() for r in x],
                    }
                )
            else:
                pp = min(p, d2.shape[1])
                # stable argsort: equal rounded d2 keeps ascending cluster
                # id — __rank 0 is bit-identical to the p=1 assignment
                # (the same rule as lloyd_assign_blas(n_probe=...))
                top = np.argsort(d2, axis=1, kind="stable")[:, :pp]
                vlists = [r.tolist() for r in x]
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(pdf[id_col].astype("int64").to_numpy(), pp),
                        "cluster": cids[top].ravel(),
                        "__rank": np.tile(np.arange(pp, dtype=np.int32), len(pdf)),
                        "__v": [v for v in vlists for _ in range(pp)],
                    }
                )

    rank_field = ", __rank int" if p > 1 else ""
    assigned = stream.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, schema=f"{id_col} long, cluster long{rank_field}, __v array<double>"
    )

    out_fields = [
        StructField(id_col, LongType()),
        StructField("cluster", LongType()),
    ]
    if p > 1:
        out_fields.append(StructField("__rank", LongType()))
    out_fields.append(StructField("is_dup", BooleanType()))
    out_schema = StructType(out_fields)
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("vecs", ArrayType(ArrayType(DoubleType()))),
            StructField("norms", ArrayType(DoubleType())),
        ]
    )

    def probe(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (cluster,) = key
        if state.exists:
            s_ids, s_vecs, s_norms = state.get
            s_ids = list(s_ids)
            mat = [np.asarray(v, dtype=np.float64) for v in s_vecs]
            nrm = list(s_norms)
        else:
            s_ids, mat, nrm = [], [], []
        rows: list[tuple] = []
        # buffer ALL Arrow chunks, then sort ONCE: a >maxRecordsPerBatch
        # group arrives as several chunks, and a per-chunk sort would let a
        # larger id in an earlier chunk be probed before its smaller-id
        # mate in a later chunk — inverting the batch smaller-id-wins rule
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            allp = pd.concat(chunks, ignore_index=True)
            order = allp[id_col].astype("int64").argsort(kind="mergesort")
            # frozen prior-state matrix stacked ONCE per group (not per
            # row); within-batch accepted rows accumulate separately and
            # stay tiny relative to state
            frozen = np.stack(mat) if mat else None
            frozen_nrm = np.asarray(nrm, dtype=np.float64) if nrm else None
            # within-batch arrivals land in a PREALLOCATED buffer and each
            # row probes the filled prefix VIEW — no per-row np.stack copy
            # of either the state or the batch (the copies, not the dots,
            # dominated the naive loop)
            dim0 = len(allp["__v"].iloc[order[0]]) if len(order) else 0
            buf = np.empty((len(order), dim0), dtype=np.float64)
            nbuf = np.empty(len(order), dtype=np.float64)
            cnt = 0
            for i in order:
                new_id = int(allp[id_col].iloc[i])
                v = np.asarray(allp["__v"].iloc[i], dtype=np.float64)
                vn = float(np.sqrt(v @ v))
                dup = False
                if frozen is not None:
                    sims = _round_half_away((frozen @ v) / (frozen_nrm * vn), round_digits)
                    dup = bool((sims >= threshold).any())
                if not dup and cnt:
                    sims = _round_half_away((buf[:cnt] @ v) / (nbuf[:cnt] * vn), round_digits)
                    dup = bool((sims >= threshold).any())
                if p > 1:
                    rows.append(
                        (new_id, int(cluster), int(allp["__rank"].iloc[i]), dup)
                    )
                else:
                    rows.append((new_id, int(cluster), dup))
                if max_cluster_size is None or len(s_ids) < max_cluster_size:
                    s_ids.append(new_id)
                    buf[cnt] = v
                    nbuf[cnt] = vn
                    cnt += 1
            mat.extend(buf[i] for i in range(cnt))
            nrm.extend(nbuf[:cnt].tolist())
        state.update((s_ids, [x.tolist() for x in mat], nrm))
        if rows:
            cols = (
                [id_col, "cluster", "__rank", "is_dup"]
                if p > 1
                else [id_col, "cluster", "is_dup"]
            )
            yield pd.DataFrame(rows, columns=cols)

    return assigned.groupBy("cluster").applyInPandasWithState(
        probe,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def collapse_probe_verdicts(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Consumer-side collapse of multi-probe streaming SemDeDup output
    (one row per membership) into the batch operator's one-row-per-vector
    shape: verdict = caught in ANY probed cluster, reported cluster = the
    primary (__rank 0) assignment.  Run on the SINK table (batch) or
    inside a keyed idempotent sink — Spark's one-stateful-operator-per-
    query rule keeps this OR out of the streaming plan itself."""
    return df.groupBy(id_col).agg(
        F.max(F.when(F.col("__rank") == 0, F.col("cluster"))).alias("cluster"),
        F.max("is_dup").alias("is_dup"),
    )


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT dedup — the unbounded twin of the batch md5-groupBy
    dedup (operators/dedup.exact_dup_groups): emit each key's first
    arrival, drop repeats. Built on dropDuplicatesWithinWatermark, so the
    per-key state is EVICTED once the watermark passes its event time —
    state is bounded by the dedup horizon, not the stream's history.

    Semantics vs batch: within the watermark window, output == batch
    dropDuplicates on key_cols (first arrival wins); a duplicate arriving
    AFTER the watermark expired its twin's state is re-emitted — the
    documented trade every bounded-state streaming dedup makes (an exact
    forever-dedup needs the batch path or a keyed idempotent sink).

    At 100 TB-scale ingest this is the front-door filter: content-hash
    key (md5 of the payload), a horizon matched to the producer's retry
    window, and the ledgered sink downstream absorbing anything older.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
