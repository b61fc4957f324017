"""Key-salting for skewed shuffles.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most skew at
runtime, and the interval library additionally bands hot keys
(plans/banding.py). What AQE cannot fix is a skewed *aggregation* — one hot
group key (a 3-hour video among 10-minute clips, a boilerplate dedup
bucket) lands every row on one reducer — and a skewed join whose build side
is too big to broadcast. These helpers make the salt explicit:

- `salted_agg`: two-phase aggregation — partial agg on (keys, salt), final
  agg on keys. Only algebraic aggregates (sum/count/min/max) re-aggregate
  losslessly; avg must be expressed as sum+count by the caller.
- `replicated_skew_join`: equi-join where the probe side is salted by a
  deterministic hash and the build side is replicated once per salt, so a
  hot key's rows spread over `n_salts` tasks.

The reference hit the same physics by hand-chunking Python work per video
(rekall_parallel.py:40-78, commercial_detection_rekall.py:316-337); here
the salt is a column and Catalyst plans the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    aggs: alias -> (expression, kind) with kind in sum|count|min|max.
    Phase 1 groups by (group_cols, salt) — map-side partials already shrink
    the hot key to at most n_salts * partitions rows — phase 2 merges.
    The salt defaults to a uniform spread of the incoming rows."""
    bad = [k for k, (_, kind) in aggs.items() if kind not in _MERGE]
    if bad:
        raise ValueError(f"non-algebraic aggregate kinds for {bad}; use sum+count")
    salt = salt_on if salt_on is not None else F.monotonically_increasing_id()
    partial = (
        df.withColumn(_SALT, F.pmod(salt, n_salts))
        .groupBy(*group_cols, _SALT)
        .agg(
            *[
                (F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(expr)).alias(a)
                for a, (expr, kind) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[_MERGE[kind](F.col(a)).alias(a) for a, (_, kind) in aggs.items()]
    )


def replicated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit salting: probe rows get salt =
    xxhash64(row) % n_salts; the build side is exploded once per salt value
    and the join key becomes (on..., salt). A key with 10^9 probe rows now
    occupies n_salts reducers instead of one. Build-side cost is
    n_salts × |build| — use only when build is small-ish yet over the
    broadcast threshold, which is exactly the AQE-can't-help regime.

    `how` is restricted to probe-preserving types: an outer side on the
    replicated build would emit each unmatched build row n_salts times."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"replicated_skew_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    probe_cols = [c for c in probe.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe_cols]), n_salts)
    p = probe.withColumn(_SALT, salt)
    b = build.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = p.join(b, [*on, _SALT], how)
    return out.drop(_SALT)
