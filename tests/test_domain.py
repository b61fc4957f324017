"""Esper-domain layer: builders, screen time, and the flagship composites
vs brute-force Python oracles on the synthetic fixtures."""

import random

import pytest
from pyspark.sql import functions as F

from esper_tv_spark.domain import builders, composites, fixtures, screen_time
from esper_tv_spark.functions import geometry as geo


@pytest.fixture(scope="module")
def tables(spark):
    t = fixtures.generate(spark, n_videos=8, seed=42)
    return {k: v.cache() for k, v in t.items()}


def test_get_videos_excludes_bad(tables):
    v = builders.get_videos(tables["video"])
    assert v.where(F.col("corrupted") | F.col("duplicate")).count() == 0
    row = v.first()
    assert 0 <= row["hour"] <= 23 and 1 <= row["week_day"] <= 7


def test_get_faces_geometry_and_span(tables):
    faces = builders.get_faces(tables["face"], tables["frame"], tables["video"])
    r = faces.first()
    assert r["height"] == pytest.approx(r["bbox_y2"] - r["bbox_y1"])
    assert r["area"] == pytest.approx(r["height"] * r["width"])
    assert r["min_frame"] == r["number"]
    assert r["max_frame"] == r["number"] + int(r["fps"] * 3) - 1
    # every face's video must be non-corrupted/non-duplicate
    bad = {
        row["id"] for row in tables["video"].where(F.col("corrupted") | F.col("duplicate")).collect()
    }
    assert faces.where(F.col("video_id").isin(list(bad))).count() == 0


def test_annotate_in_commercial_matches_bruteforce(tables):
    faces = builders.get_faces(tables["face"], tables["frame"], tables["video"])
    out = builders.annotate_in_commercial(faces, tables["commercial"])
    got = {r["id"]: r["in_commercial"] for r in out.collect()}
    coms = {}
    for c in tables["commercial"].collect():
        coms.setdefault(c["video_id"], []).append((c["min_frame"], c["max_frame"]))
    for r in faces.select("id", "video_id", "number").collect():
        want = any(lo <= r["number"] <= hi for lo, hi in coms.get(r["video_id"], []))
        assert got[r["id"]] == want


def test_size_percentile_exact(tables):
    faces = builders.get_faces(tables["face"], tables["frame"], tables["video"])
    fg = builders.get_face_genders(faces, tables["face_gender"], tables["commercial"])
    out = builders.annotate_size_percentile(fg, gender_threshold=0.9)
    rows = [
        (r["gender_id"], r["in_commercial"], r["height"], r["size_percentile"])
        for r in out.where(F.col("gender_probability") > 0.9).collect()
    ]
    groups = {}
    for g, ic, h, p in rows:
        groups.setdefault((g, ic), []).append((h, p))
    for (g, ic), vals in groups.items():
        heights = sorted(h for h, _ in vals)
        n = len(heights)
        for h, p in vals:
            if n == 1:
                assert p == 0.0
            else:
                rank = heights.index(h)  # percent_rank uses rank of first equal
                assert p == pytest.approx(100.0 * rank / (n - 1))


def test_screen_time_vs_bruteforce(tables):
    faces = builders.get_faces(tables["face"], tables["frame"], tables["video"])
    fi = builders.get_face_identities(faces, tables["face_identity"])
    out = {
        r["channel_id"]: (r["expected_sum"], r["variance_sum"])
        for r in screen_time.screen_time(fi, identity_id=3, group_col="channel_id").collect()
    }
    # brute force: per face keep max-prob label for identity 3
    rows = fi.where(F.col("identity_id") == 3).select(
        "face_id", "face_identity_id", "channel_id", "identity_probability"
    ).collect()
    best = {}
    for r in rows:
        k = r["face_id"]
        cand = (r["identity_probability"], -r["face_identity_id"], r["channel_id"])
        if k not in best or cand > best[k]:
            best[k] = cand
    exp, var = {}, {}
    for p, _, ch in best.values():
        exp[ch] = exp.get(ch, 0.0) + p * 3.0
        var[ch] = var.get(ch, 0.0) + p * (1 - p) * 9.0
    for ch in exp:
        assert out[ch][0] == pytest.approx(exp[ch], abs=1e-9)
        assert out[ch][1] == pytest.approx(var[ch], abs=1e-9)


def test_host_probability(tables):
    faces = builders.get_faces(tables["face"], tables["frame"], tables["video"])
    fi = builders.get_face_identities(faces, tables["face_identity"])
    hp = {r["face_id"]: r["host_probability"] for r in builders.host_probability(fi, [1, 2]).collect()}
    rows = fi.where(F.col("identity_id").isin([1, 2])).collect()
    want = {}
    for r in rows:
        want[r["face_id"]] = max(want.get(r["face_id"], 0.0), r["identity_probability"])
    assert hp == pytest.approx(want)


# ---------------------------------------------------------------------------
# composites vs brute-force rekall semantics
# ---------------------------------------------------------------------------


def brute_coalesce(ivs, gap=0):
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1] + gap:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def brute_interview(hosts, guest, eps=10, dilate=600, min_len=1350):
    # guest.overlaps(hosts) clipped, coalesced
    gwh = brute_coalesce(
        [
            (max(gs, hs), min(ge, he))
            for gs, ge in guest
            for hs, he in hosts
            if gs < he and ge > hs
        ]
    )
    pred = lambda a, b: (a[0] < b[1] and a[1] > b[0]) or (
        a[1] <= b[0] and b[0] - a[1] <= eps
    ) or (b[1] <= a[0] and a[0] - b[1] <= eps)
    merged = [
        (min(a[0], b[0]), max(a[1], b[1]))
        for a in gwh
        for b in hosts + guest
        if pred(a, b)
    ]
    cands = brute_coalesce(merged)
    return [(s, e) for s, e in brute_coalesce(cands, gap=2 * dilate) if e - s >= min_len]


def test_interview_query_vs_bruteforce(spark):
    rng = random.Random(5)
    host_rows, guest_rows = [], []
    for vid in range(3):
        t = 0
        while t < 30000:
            length = rng.randint(100, 900)
            r = rng.random()
            if r < 0.4:
                host_rows.append((vid, t, t + length))
            elif r < 0.7:
                guest_rows.append((vid, t, t + length))
            if r < 0.55 and rng.random() < 0.5:  # overlapping host+guest shot
                guest_rows.append((vid, t + length // 4, t + length))
            t += length + rng.randint(5, 700)
    hosts = spark.createDataFrame(host_rows, "video_id long, start long, end long")
    guest = spark.createDataFrame(guest_rows, "video_id long, start long, end long")
    out = composites.interview_query(hosts, guest)
    got = {}
    for r in out.collect():
        got.setdefault(r["video_id"], []).append((r["start"], r["end"]))
    for vid in range(3):
        want = brute_interview(
            [(s, e) for v, s, e in host_rows if v == vid],
            [(s, e) for v, s, e in guest_rows if v == vid],
        )
        assert sorted(got.get(vid, [])) == want, f"video {vid}"


def test_detect_commercials_smoke(spark):
    # one video, 600s: black windows partition the timeline; '>>' marks news
    video_spans = spark.createDataFrame([(1, 0.0, 600.0)], "video_id long, start double, end double")
    black = spark.createDataFrame(
        [(1, 100.0, 102.0), (1, 300.0, 302.0), (1, 420.0, 422.0)],
        "video_id long, start double, end double",
    )
    arrows = spark.createDataFrame(
        [(1, 10.0, 11.0), (1, 450.0, 451.0)], "video_id long, start double, end double"
    )
    empty = spark.createDataFrame([], "video_id long, start double, end double")
    transcripts = spark.createDataFrame(
        [(1, float(i * 10), float(i * 10 + 8)) for i in range(60)],
        "video_id long, start double, end double",
    )
    out = composites.detect_commercials(
        black, arrows, empty, empty, transcripts, video_spans
    )
    got = sorted((r["start"], r["end"]) for r in out.collect())
    # news blocks [0,100) and [422,600) contain '>>'; the middle blocks
    # (102-300, 302-420) have no arrows -> commercial candidates. The fold
    # merges them (gap 2s <= 5s, the rekall after(max_dist=5) predicate) and
    # caps the merged span at MAX_COMMERCIAL_TIME=240s from its start
    # (commercial_detection_rekall.py:168-186 capped-merge semantics).
    assert got == [(102.0, 342.0)]


def test_panel_frames_matches_bruteforce(spark, tables):
    from esper_tv_spark.domain.composites import panel_frames

    got = {
        r["frame_id"]: list(r["face_ids"])
        for r in panel_frames(tables["face"], n_faces=3, y_eps=0.2, height_ratio=2.5).collect()
    }
    by_frame = {}
    for f in tables["face"].collect():
        by_frame.setdefault(f["frame_id"], []).append(f)
    want = {}
    for fid, fl in by_frame.items():
        if len(fl) != 3 or any(f["is_host"] for f in fl):
            continue
        y1s = [f["bbox_y1"] for f in fl]
        hts = [f["bbox_y2"] - f["bbox_y1"] for f in fl]
        if max(y1s) - min(y1s) < 0.2 and max(hts) < min(hts) * 2.5:
            want[fid] = [f["id"] for f in sorted(fl, key=lambda f: f["bbox_x1"])]
    assert got == want and len(want) > 0


def test_get_spans_duration_and_context(tables):
    """get_spans (reference get_shots/get_commercials shape): video context
    joined in, duration = span frames / fps, hour from video time."""
    out = builders.get_spans(tables["shot"], tables["video"])
    vids = {r["id"]: r for r in builders.get_videos(tables["video"]).collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        v = vids[r["video_id"]]
        assert r["fps"] == v["fps"] and r["hour"] == v["hour"]
        assert r["duration"] == (r["max_frame"] - r["min_frame"]) / v["fps"]
    # excluded (corrupt/duplicate) videos contribute no spans
    assert {r["video_id"] for r in rows} <= set(vids)
