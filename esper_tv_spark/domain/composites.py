"""Flagship composite pipelines: the interview query and commercial
detection, rebuilt on the relational interval library.

These are the reference's hardest rekall programs; they prove the interval
algebra composes. Both are DataFrame -> DataFrame (per-video parallel at any
scale); only the commercial fold (order-dependent capped merge) drops to
applyInPandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from esper_tv_spark.operators import intervals as iv
from esper_tv_spark.operators.sweep import sweep_minus


def _overlaps_before_after(max_dist: float):
    """or_pred(overlaps, before(max_dist), after(max_dist)) —
    interview_with_person_x.py:46-50."""

    def pred(a_s: Column, a_e: Column, b_s: Column, b_e: Column) -> Column:
        return (
            iv.t_overlaps(a_s, a_e, b_s, b_e)
            | iv.t_before(max_dist)(a_s, a_e, b_s, b_e)
            | iv.t_after(max_dist)(a_s, a_e, b_s, b_e)
        )

    return pred


def interview_query(
    hosts: DataFrame,
    guest: DataFrame,
    epsilon: float = 10,
    dilate_amount: float = 600,
    min_length: float = 1350,
    cache_inputs: bool = True,
) -> DataFrame:
    """Interviews of a guest with hosts, from per-video host/guest interval
    tables (video_id, start, end).

    Mirrors interview_with_person_x.py:41-68 operator for operator:
      guest_with_host = guest.overlaps(hosts).coalesce()
      candidates = (gwh.merge(hosts, ovl|before|after(eps))
                    ∪ gwh.merge(guest, ...)).coalesce()
      interviews = candidates.dilate(d).coalesce().dilate(-d)
                             .filter_length(min_length)
    with dilate/coalesce/dilate fused to coalesce(gap=2d) (the identity the
    reference applies by hand at commercial_detection_rekall.py:154-165).

    The algebra consumes hosts and guest twice each and gwh twice; without
    materialization Spark recomputes each subtree per consumer (5x wall
    time measured at sf0.1). cache_inputs persists the three reused interval
    sets (MEMORY_AND_DISK, spills rather than OOMs at scale) — presence
    tables are tiny relative to the fact tables they derive from.
    """
    key = ["video_id"]
    if cache_inputs:
        hosts = hosts.cache()
        guest = guest.cache()
    gwh = iv.coalesce(
        iv.overlap_join(guest, hosts, key, clip=True, band="auto").select(
            F.col("a_video_id").alias("video_id"), "start", "end"
        ),
        key,
    ).drop("n_merged")
    if cache_inputs:
        gwh = gwh.cache()
    pred = _overlaps_before_after(epsilon)
    # band="auto" + reach=epsilon: the ovl|before|after predicate bounds the
    # pair gap by epsilon, so the banded equi-join path applies (band width
    # clamps to >= reach inside interval_join)
    reach = int(-(-epsilon // 1))
    candidates = iv.coalesce(
        iv.set_union(
            iv.merge_join(
                gwh, hosts.select(*key, "start", "end"), key, pred, band="auto", reach=reach
            ),
            iv.merge_join(
                gwh, guest.select(*key, "start", "end"), key, pred, band="auto", reach=reach
            ),
        ),
        key,
    ).drop("n_merged")
    interviews = iv.coalesce(candidates, key, gap=2 * dilate_amount).drop("n_merged")
    return iv.filter_length(interviews, min_length=min_length)


def detect_commercials(
    black_windows: DataFrame,
    arrow_text: DataFrame,
    arrow_announcer: DataFrame,
    arrow_having: DataFrame,
    transcripts: DataFrame,
    video_spans: DataFrame,
    max_commercial_time: float = 240.0,
    min_commercial_time: float = 10.0,
    reliable_text_duration: float = 5.0,
) -> DataFrame:
    """Commercial-block detection (commercial_detection_rekall.py:108-313,
    core pipeline; the lowercase-interval augmentation of lines 220+ layers
    the same ops and is exposed separately via the interval library).

    Inputs are per-video interval tables (video_id, start, end) in seconds:
    black frame windows, '>>' text locations, '>> Announcer:' locations,
    '>> HAVING' locations, transcript line spans, and (video_id, 0,
    video_length) whole-video spans.
    """
    key = ["video_id"]

    def bare(df: DataFrame) -> DataFrame:
        return df.select(*key, "start", "end")

    reliable = iv.filter_length(
        iv.coalesce(bare(transcripts), key, gap=2).drop("n_merged"),
        min_length=reliable_text_duration,
    )
    # A \ B \ C == A \ (B ∪ C): one subtraction pass instead of two.
    # Identity-preserving minus, NOT the sweep: each surviving arrow
    # sub-interval is tested against `reliable` individually, so merging
    # adjacent survivors here would change which spans pass the filter.
    # arrows is only ever a FILTER side downstream (filter_against +
    # anti-join), so duplicate arrow rows cannot change the result —
    # pre-distinct and take minus's unique_rows fast path (direct window
    # sweep, no join-back re-expansion).
    arrows = iv.filter_against(
        iv.minus(
            bare(arrow_text).distinct(),
            iv.set_union(bare(arrow_announcer), bare(arrow_having)),
            key,
            unique_rows=True,
        ),
        reliable,
        key,
        iv.t_overlaps,
    )
    # video_spans is one interval per video, so the set-level sweep output is
    # identical to the identity-preserving minus — at one exchange instead of
    # a coalesce + range-join + gap-window per subtraction.
    #
    # The reference then computes
    #   non_commercial    = all_blocks.filter_against(arrows, overlaps)
    #   commercial_blocks = spans \ non_commercial \ black
    # but all_blocks = spans \ black is DISJOINT per video and non_commercial
    # keeps whole member intervals of it, so
    #   spans \ (non_commercial ∪ black) = all_blocks \ non_commercial
    #                                    = all_blocks ANTI-overlaps arrows
    # — the second sweep and the separate semi-join collapse into one
    # anti-join (same rows bit-for-bit; hash-checked against the oracle's
    # literal two-subtraction encoding).
    all_blocks = sweep_minus(bare(video_spans), [bare(black_windows)], key)
    commercial_blocks = iv.filter_against(
        all_blocks, arrows, key, iv.t_overlaps, anti=True
    )

    # capped-length stack fold (commercial_detection_rekall.py:168-213):
    # inherently sequential per video -> applyInPandas
    def fold_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        stack: list[tuple[float, float]] = []
        for s, e in zip(pdf["start"].to_numpy(), pdf["end"].to_numpy()):
            s, e = float(s), float(e)
            if e - s > max_commercial_time:
                e = s + max_commercial_time
            if not stack:
                stack.append((s, e))
                continue
            ls, le = stack[-1]
            # or_pred(overlaps, after(max_dist=5)): the next interval (sorted
            # by start) merges if it overlaps the last or follows within 5s
            if s <= le + 5:
                ms, me = min(ls, s), max(le, e)
                if me - ms > max_commercial_time:
                    me = ms + max_commercial_time
                stack[-1] = (ms, me)
            else:
                stack.append((s, e))
        vid = pdf["video_id"].iloc[0]
        return pd.DataFrame(
            {"video_id": vid, "start": [s for s, _ in stack], "end": [e for _, e in stack]}
        )

    folded = iv.fold_intervals(
        commercial_blocks, key, fold_fn, "video_id long, start double, end double"
    )
    return iv.filter_length(folded, min_length=min_commercial_time)


def panel_frames(
    faces: DataFrame,
    n_faces: int = 3,
    y_eps: float = 0.1,
    height_ratio: float = 1.8,
    exclude_hosts: bool = True,
) -> DataFrame:
    """Panel detection (panels_rekall.py:19-57 / panels_sql.py:13-18):
    frames with exactly `n_faces` faces aligned in a horizontal row —
    same-row y positions (spread < y_eps), comparable heights
    (max/min < height_ratio), optionally no host faces.

    One groupBy per frame collects the faces into a sorted array (by x1, so
    left-to-right order is free); every predicate is then a higher-order
    array expression — no self-joins, no per-frame Python. Input: the
    `face` table (id, frame_id, bbox_*, is_host).
    Output: (frame_id, face_ids left-to-right).
    """
    fs = F.sort_array(
        F.collect_list(F.struct("bbox_x1", "bbox_y1", "bbox_y2", "id"))
    )
    per = faces.groupBy("frame_id").agg(
        fs.alias("fs"), F.max(F.col("is_host").cast("int")).alias("any_host")
    )
    cand = per.where(F.size("fs") == n_faces)
    if exclude_hosts:
        cand = cand.where(F.col("any_host") == 0)
    y1s = F.transform("fs", lambda f: f["bbox_y1"])
    hts = F.transform("fs", lambda f: f["bbox_y2"] - f["bbox_y1"])
    same_row = (F.array_max(y1s) - F.array_min(y1s)) < F.lit(y_eps)
    similar_h = F.array_max(hts) < F.array_min(hts) * F.lit(height_ratio)
    return cand.where(same_row & similar_h).select(
        "frame_id", F.transform("fs", lambda f: f["id"]).alias("face_ids")
    )
