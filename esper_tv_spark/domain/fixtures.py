"""Deterministic synthetic esper-domain fixtures (FIXTURES.md schemas).

Generates the TV-news star schema the reference queries run against:
videos (channel/show/time), sampled frames, shots, faces with bboxes,
probabilistic gender/identity labels, commercials, caption lines. Seeded RNG;
invariants match /root/reference/app/query/models.py +
base_models.py (normalized bboxes, probability columns, labeler provenance,
frame-number time axis with per-video fps).

Used by tests and the domain-layer demos; the driver's TPC-H-ish testdata
covers the generic relational surface, this covers the esper-specific one.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

CHANNELS = ["CNN", "FOXNEWS", "MSNBC"]
SHOWS = [f"show_{i}" for i in range(6)]
IDENTITIES = [f"person_{i}" for i in range(12)]
GENDERS = ["M", "F", "U"]
LABELERS = ["mtcnn", "rudecarnie", "face-identity:all", "haotian-commercials", "handlabeled-face"]


def generate(spark: SparkSession, n_videos: int = 12, seed: int = 42) -> dict[str, DataFrame]:
    rng = random.Random(seed)
    videos, frames, shots, faces, face_genders, face_identities, commercials = (
        [], [], [], [], [], [], []
    )
    frame_id = face_id = shot_id = fg_id = fi_id = com_id = 1
    base_time = datetime(2016, 1, 1)

    for vid in range(1, n_videos + 1):
        fps = rng.choice([25.0, 29.97, 59.94])
        duration_s = rng.randint(600, 3600)
        num_frames = int(fps * duration_s)
        channel_id = rng.randrange(len(CHANNELS))
        show_id = rng.randrange(len(SHOWS))
        t = base_time + timedelta(hours=rng.randint(0, 24 * 300))
        corrupted = vid % 11 == 0
        duplicate = vid % 13 == 0
        videos.append(
            (vid, f"tvnews/videos/{CHANNELS[channel_id]}_{t:%Y%m%d_%H%M%S}_{SHOWS[show_id]}.mp4",
             num_frames, fps, 640, 480, channel_id + 1, show_id + 1, t,
             duplicate, corrupted)
        )

        # shots: consecutive intervals over the frame axis
        f = 0
        while f < num_frames:
            length = rng.randint(int(fps), int(fps * 30))
            shots.append((shot_id, vid, f, min(f + length, num_frames - 1), rng.random() < 0.2))
            f += length + 1
            shot_id += 1

        # commercials: a few per video
        for _ in range(rng.randint(1, 4)):
            s = rng.randint(0, max(num_frames - int(fps * 120), 1))
            commercials.append((com_id, vid, s, s + int(fps * rng.randint(15, 120))))
            com_id += 1

        # frames sampled every 3 seconds (the reference's stride —
        # spark_util.py:402-405) + faces on ~half of them
        stride = int(math.floor(fps * 3))
        for number in range(0, num_frames, stride):
            frames.append((frame_id, vid, number, rng.random() < 0.1))
            if rng.random() < 0.5:
                for _ in range(rng.randint(1, 3)):
                    x1, y1 = rng.uniform(0, 0.7), rng.uniform(0, 0.7)
                    w, h = rng.uniform(0.05, 0.3), rng.uniform(0.05, 0.3)
                    faces.append(
                        (face_id, frame_id, x1, y1, x1 + w, y1 + h,
                         rng.random() < 0.1, rng.random() < 0.15, round(rng.uniform(0.5, 1.0), 2))
                    )
                    face_genders.append(
                        (fg_id, face_id, rng.randrange(len(GENDERS)) + 1, 2,
                         round(rng.uniform(0.5, 1.0), 2))
                    )
                    fg_id += 1
                    # some faces get multiple identity labels (dedup-by-max tested)
                    for _ in range(rng.choice([0, 1, 1, 2])):
                        face_identities.append(
                            (fi_id, face_id, rng.randrange(len(IDENTITIES)) + 1, 3,
                             round(rng.uniform(0.3, 1.0), 2))
                        )
                        fi_id += 1
                    face_id += 1
            frame_id += 1

    return {
        "video": spark.createDataFrame(
            videos,
            "id long, path string, num_frames long, fps double, width int, height int, "
            "channel_id long, show_id long, time timestamp, duplicate boolean, corrupted boolean",
        ),
        "frame": spark.createDataFrame(frames, "id long, video_id long, number long, shot_boundary boolean"),
        "shot": spark.createDataFrame(shots, "id long, video_id long, min_frame long, max_frame long, in_commercial boolean"),
        "face": spark.createDataFrame(
            faces,
            "id long, frame_id long, bbox_x1 double, bbox_y1 double, bbox_x2 double, bbox_y2 double, "
            "background boolean, is_host boolean, probability double",
        ),
        "face_gender": spark.createDataFrame(
            face_genders, "id long, face_id long, gender_id long, labeler_id long, probability double"
        ),
        "face_identity": spark.createDataFrame(
            face_identities, "id long, face_id long, identity_id long, labeler_id long, probability double"
        ),
        "commercial": spark.createDataFrame(commercials, "id long, video_id long, min_frame long, max_frame long"),
        "channel": spark.createDataFrame(
            [(i + 1, c) for i, c in enumerate(CHANNELS)], "id long, name string"
        ),
        "show": spark.createDataFrame([(i + 1, s) for i, s in enumerate(SHOWS)], "id long, name string"),
        "identity": spark.createDataFrame(
            [(i + 1, p) for i, p in enumerate(IDENTITIES)], "id long, name string"
        ),
        "gender": spark.createDataFrame([(i + 1, g) for i, g in enumerate(GENDERS)], "id long, name string"),
    }
