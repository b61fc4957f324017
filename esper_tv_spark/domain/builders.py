"""Derived-table builders — the esper dataset pipeline as pure DataFrame
transforms.

Rebuilds /root/reference/app/esper/spark_util.py's get_videos / get_faces /
get_face_genders / get_face_identities (spark_util.py:34-60, 360-429,
494-536, 544-591) with every collect()+broadcast-dict-UDF replaced by an
optimizer-visible join or window:

- _annotate_in_commercial (spark_util.py:135-158: driver dict of commercial
  intervals + boolean UDF)  ->  interval containment semi-join flag
- _annotate_size_percentile (spark_util.py:432-464: 10k-bucket CDF + UDF)
  ->  exact percent_rank window
- host probability (spark_util.py:306-337: collect + closure)  ->
  aggregate + broadcast join

Scale: faces/frames/videos are fact->dim joins; the dims broadcast. The
in_commercial flag is a per-video range join — banded when commercial
density warrants (plans/banding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from esper_tv_spark.functions import geometry as geo


def get_videos(video: DataFrame) -> DataFrame:
    """Videos with derived time columns, excluding corrupted/duplicate
    (spark_util.py:34-60: hour/week_day annotations, corrupt filters at
    377-378)."""
    return (
        video.where(~F.col("corrupted") & ~F.col("duplicate"))
        .withColumn("hour", F.hour("time"))
        .withColumn("week_day", F.dayofweek("time"))
        .withColumn("month", F.month("time"))
        .withColumn("year", F.year("time"))
        .withColumn("duration_s", F.col("num_frames") / F.col("fps"))
    )


def get_faces(face: DataFrame, frame: DataFrame, video: DataFrame) -> DataFrame:
    """Faces joined to frames/videos with bbox geometry and a 3-second
    track span (spark_util.py:360-429: height/width/area, duration=3,
    min_frame=number, max_frame=number+floor(fps*3)-1). Frame-stride
    sampling (number % floor(fps*3) == 0, spark_util.py:402-405) is applied
    by the fixture generator/ingest, and re-checked here."""
    videos = get_videos(video)
    stride_ok = F.col("number") % F.floor(F.col("fps") * 3) == 0
    out = (
        face.join(frame.select(F.col("id").alias("frame_id"), "video_id", "number"), "frame_id")
        .join(
            F.broadcast(
                videos.select(
                    F.col("id").alias("video_id"), "channel_id", "show_id", "time", "fps",
                    "hour", "week_day",
                )
            ),
            "video_id",
        )
        .where(stride_ok)
    )
    return (
        out.withColumn("height", geo.height(F.col("bbox_y1"), F.col("bbox_y2")))
        .withColumn("width", geo.width(F.col("bbox_x1"), F.col("bbox_x2")))
        .withColumn("area", F.col("height") * F.col("width"))
        .withColumn("duration", F.lit(3.0))
        .withColumn("min_frame", F.col("number"))
        .withColumn("max_frame", F.col("number") + F.floor(F.col("fps") * 3) - 1)
    )


def get_spans(spans: DataFrame, video: DataFrame) -> DataFrame:
    """Frame-span tables (shots / commercials / segments) joined to video
    context with duration + hour annotations — the shared shape of the
    reference's get_shots and get_commercials (spark_util.py:81-132):
    span columns + video fps/show/channel/time fields +
    duration = (max_frame - min_frame) / fps. Videos broadcast (dim)."""
    videos = get_videos(video)
    return (
        spans.join(
            F.broadcast(
                videos.select(
                    F.col("id").alias("video_id"), "fps", "show_id", "channel_id",
                    "time", "hour", "week_day", "month", "year",
                )
            ),
            "video_id",
        )
        .withColumn("duration", (F.col("max_frame") - F.col("min_frame")) / F.col("fps"))
    )


def annotate_in_commercial(faces: DataFrame, commercial: DataFrame) -> DataFrame:
    """Flag faces whose frame lies inside a commercial of the same video.

    Reference (_annotate_in_commercial, spark_util.py:135-158) collected all
    commercials into a driver dict and probed it from a row UDF. Here: a
    containment range semi-join + left join of the flag — distributed,
    optimizer-visible, and the commercial side stays a table (broadcast when
    small)."""
    com = commercial.select(
        F.col("video_id").alias("c_video_id"),
        F.col("min_frame").alias("c_min"),
        F.col("max_frame").alias("c_max"),
    )
    inside = (
        (F.col("video_id") == F.col("c_video_id"))
        & (F.col("number") >= F.col("c_min"))
        & (F.col("number") <= F.col("c_max"))
    )
    flagged = faces.join(F.broadcast(com), inside, "left_semi").select(
        F.col("id").alias("__in_com_id")
    )
    return faces.join(
        flagged, faces["id"] == flagged["__in_com_id"], "left"
    ).withColumn("in_commercial", F.col("__in_com_id").isNotNull()).drop("__in_com_id")


def get_face_genders(
    faces: DataFrame, face_gender: DataFrame, commercial: DataFrame | None = None
) -> DataFrame:
    """Face-gender labels joined to the face facts (spark_util.py:494-536),
    optionally with in_commercial."""
    fg = face_gender.select(
        F.col("id").alias("face_gender_id"), F.col("face_id"), "gender_id",
        F.col("probability").alias("gender_probability"),
    )
    out = faces.withColumnRenamed("probability", "face_probability").join(
        fg, faces["id"] == fg["face_id"]
    )
    if commercial is not None:
        out = annotate_in_commercial(out, commercial)
    return out


def get_face_identities(faces: DataFrame, face_identity: DataFrame) -> DataFrame:
    """Face-identity labels joined to face facts (spark_util.py:544-591)."""
    fi = face_identity.select(
        F.col("id").alias("face_identity_id"), F.col("face_id"), "identity_id",
        F.col("probability").alias("identity_probability"),
    )
    return faces.withColumnRenamed("probability", "face_probability").join(
        fi, faces["id"] == fi["face_id"]
    )


def annotate_size_percentile(
    face_genders: DataFrame,
    gender_threshold: float = 0.9,
    height_col: str = "height",
) -> DataFrame:
    """Exact within-(gender, in_commercial) height percentile.

    Replaces the reference's 10k-bucket histogram CDF built on the driver +
    per-row UDF lookup (spark_util.py:432-464) with one percent_rank window —
    exact instead of bucketized, one shuffle instead of a collect. Rows under
    the probability threshold get the percentile of their group's
    qualifying distribution boundary semantics preserved by ranking only
    qualifying rows and left-joining the rank back."""
    qualifying = face_genders.where(F.col("gender_probability") > gender_threshold)
    w = Window.partitionBy("gender_id", "in_commercial").orderBy(F.col(height_col))
    ranked = qualifying.select(
        F.col("face_gender_id").alias("__fg_id"),
        (F.percent_rank().over(w) * 100.0).alias("size_percentile"),
    )
    return face_genders.join(
        ranked, face_genders["face_gender_id"] == ranked["__fg_id"], "left"
    ).drop("__fg_id")


def host_probability(face_identities: DataFrame, host_identity_ids: list[int]) -> DataFrame:
    """Max identity-probability over host identities per face
    (spark_util.py:306-337 collected per-face dicts; here groupBy.max +
    join)."""
    hosts = (
        face_identities.where(F.col("identity_id").isin(host_identity_ids))
        .groupBy("face_id")
        .agg(F.max("identity_probability").alias("host_probability"))
    )
    return hosts
