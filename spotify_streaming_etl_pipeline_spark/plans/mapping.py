"""Parent-track mapping queries (SURVEY §3.3; J5/J6/J8/J11, A11-A14).

Reference: scripts/parent_mapping/{track_parent_select.py,
ts_version_mapping.py, album_mapping.sql}. The interactive stdin
curation is out of engine scope; these are the candidate-finding
queries and the upsert API the human loop drives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.writer import upsert


def variant_groups(
    dim_track: DataFrame, fact_tracks: DataFrame, min_total_minutes: float = 45.0
) -> DataFrame:
    """A11-A13: title/artist groups with >1 distinct uri and enough
    playtime (track_parent_select.py:11-46). The reference zips three
    parallel ARRAY_AGGs assuming consistent order; we aggregate a
    single collect_list(struct(...)) sorted by track_id —
    deterministic (SURVEY §7 risk note)."""
    playtime = fact_tracks.groupBy("track_fk").agg(
        (F.sum("sec_played") / 60.0).alias("track_minutes")
    )
    t = dim_track.join(
        playtime, dim_track.track_id == playtime.track_fk, "left"
    ).withColumn("track_minutes", F.coalesce("track_minutes", F.lit(0.0)))
    return (
        t.filter(~F.col("track_title").ilike("%Version)"))
        .groupBy("track_title", "artist_name")
        .agg(
            F.countDistinct("spotify_track_uri").cast("long").alias("n_variants"),
            F.array_sort(
                F.collect_list(
                    F.struct("track_id", "spotify_track_uri", "album_name")
                )
            ).alias("variants"),
            F.round(F.sum("track_minutes"), 1).alias("total_time_min"),
        )
        .filter((F.col("n_variants") > 1) & (F.col("total_time_min") > min_total_minutes))
        .orderBy(F.desc("total_time_min"), F.asc("track_title"))
    )


def unmapped_ts_versions(dim_track: DataFrame, parent_tracks: DataFrame | None) -> DataFrame:
    """J5: '(Taylor''s Version)' tracks with no parent mapping yet
    (ts_version_mapping.py:6-18) — left_anti replaces LEFT JOIN…IS NULL."""
    tsv = dim_track.filter(F.col("track_title").ilike("%(Taylor's Version)%"))
    if parent_tracks is not None:
        tsv = tsv.join(
            parent_tracks.select(F.col("child_id").alias("track_id")),
            "track_id",
            "left_anti",
        )
    return tsv.orderBy("artist_name", "track_title")


def suggest_parents(dim_track: DataFrame, unmapped: DataFrame) -> DataFrame:
    """Exact-match suggestion on the stripped title
    (ts_version_mapping.py:21-29): strip " (Taylor's Version)" and look
    for a non-TS track with that title by the same artist."""
    stripped = unmapped.select(
        F.col("track_id").alias("child_id"),
        F.col("track_title").alias("child_track_title"),
        F.col("artist_name").alias("artist"),
        F.col("album_name").alias("child_album_name"),
        F.col("spotify_track_uri").alias("child_track_uri"),
        F.replace(
            F.col("track_title"), F.lit(" (Taylor's Version)"), F.lit("")
        ).alias("stripped_title"),
    )
    candidates = dim_track.filter(~F.col("track_title").ilike("%Version)%")).select(
        F.col("track_title").alias("parent_track_title"),
        F.col("album_name").alias("parent_album_name"),
        F.col("artist_name").alias("artist"),
    )
    return stripped.join(
        candidates,
        (stripped.stripped_title == candidates.parent_track_title)
        & (stripped.artist == candidates.artist),
        "left",
    ).drop(candidates.artist)


def upsert_parent_mappings(
    incoming: DataFrame, parent_tracks: DataFrame | None
) -> DataFrame:
    """J11: ON CONFLICT (child_id) DO UPDATE (ts_version_mapping.py:32-47)
    — incoming rows win; mapped_at stamped at write."""
    stamped = incoming.withColumn("mapped_at", F.current_timestamp())
    if parent_tracks is not None and "mapped_at" not in parent_tracks.columns:
        parent_tracks = parent_tracks.withColumn("mapped_at", F.current_timestamp())
    return upsert(stamped, ["child_id"], parent_tracks)


def bulk_album_mappings(
    dim_track: DataFrame,
    parent_tracks: DataFrame | None,
    album_prefix: str,
    parent_album_name: str,
) -> DataFrame:
    """J6/A14: album_mapping.sql's LIKE-prefix bulk inserts with NOT IN
    anti-join — e.g. map every "1989%" variant album onto one parent."""
    cand = dim_track.filter(F.col("album_name").like(f"{album_prefix}%")).select(
        F.col("spotify_track_uri").alias("child_track_uri"),
        F.col("track_id").alias("child_id"),
        F.col("artist_name").alias("artist"),
        F.col("track_title").alias("child_track_title"),
        F.col("album_name").alias("child_album_name"),
        F.col("track_title").alias("parent_track_title"),
        F.lit(parent_album_name).alias("parent_album_name"),
    )
    if parent_tracks is not None:
        cand = cand.join(
            parent_tracks.select("child_id"), "child_id", "left_anti"
        )
    return cand
