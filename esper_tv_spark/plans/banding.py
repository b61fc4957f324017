"""Band-width selection for banded interval joins.

The reference prunes interval-join candidates with a hand-chosen
working_window per call site (/root/reference/app/esper/
rekall_query.py:133-140). Our banded join (operators/intervals.interval_join
with band=W) needs W chosen from data statistics:

- W too small: long intervals explode into many band rows (row blowup)
- W too large: each band bucket holds many intervals (per-bucket cross
  product — the O(n²) the band exists to avoid)

Heuristic: W = p95 interval length. Long-tail intervals then span ~1-2 bands
(bounded blowup) while buckets stay temporally tight. Stats come from a
sampled aggregate — one cheap pass, no collect of raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# session-lifetime memo keyed by the inputs' SEMANTIC plan hashes: band
# width is a plan-shape statistic (it changes candidate volume, never the
# result), so recomputing the approxQuantile job on every call to the
# same logical inputs is pure waste — banded call sites in a loop paid
# one stats job per iteration. A (rare) hash collision costs only a
# suboptimal width, not correctness.
_WIDTH_MEMO: dict[tuple, int] = {}


def choose_band_width(
    *dfs: DataFrame,
    start: str = "start",
    end: str = "end",
    quantile: float = 0.95,
    sample_fraction: float | None = None,
    minimum: int = 1,
) -> int:
    """p95 interval length across the join inputs (approx quantile,
    single aggregate pass; optionally over a sample at very large scale).
    Memoized per (semantic plan hashes, params) for the session."""
    try:
        key = (
            tuple(df.semanticHash() for df in dfs),
            start,
            end,
            quantile,
            sample_fraction,
            minimum,
        )
    except Exception:
        key = None
    if key is not None and key in _WIDTH_MEMO:
        return _WIDTH_MEMO[key]
    w = _compute_band_width(
        *dfs, start=start, end=end, quantile=quantile,
        sample_fraction=sample_fraction, minimum=minimum,
    )
    if key is not None:
        if len(_WIDTH_MEMO) > 1024:
            _WIDTH_MEMO.clear()
        _WIDTH_MEMO[key] = w
    return w


def _compute_band_width(
    *dfs: DataFrame,
    start: str = "start",
    end: str = "end",
    quantile: float = 0.95,
    sample_fraction: float | None = None,
    minimum: int = 1,
) -> int:
    lengths = []
    for df in dfs:
        d = df.select((F.col(end) - F.col(start)).cast("double").alias("len"))
        if sample_fraction:
            d = d.sample(fraction=sample_fraction, seed=42)
        lengths.append(d)
    alllen = lengths[0]
    for d in lengths[1:]:
        alllen = alllen.unionByName(d)
    q = alllen.approxQuantile("len", [quantile], 0.01)
    return max(int(q[0]) if q and q[0] else minimum, minimum)
