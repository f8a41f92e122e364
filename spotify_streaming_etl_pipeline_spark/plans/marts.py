"""Data-mart layer: aggregate views + parameterized top-N functions +
dashboard wrappers (SURVEY §2.4 A1-A3, A8-A10; §2.2 P5; §3.2).

Reference: docs/sql/dm_ddl.sql:18-162 (views + PL/pgSQL table
functions) and dashboard/dashboard_queries.py:4-43. The PL/pgSQL
table functions become parameterized Python functions returning
DataFrames — the engine's public query API; optional params compile
to Catalyst-foldable predicates exactly like the reference's
``(filter_year IS NULL OR dd.year = filter_year)``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# measure bundle shared by all mart aggregates (dm_ddl.sql:22-26,70-76)
# ---------------------------------------------------------------------------


def _mart_measures() -> list[F.Column]:
    return [
        F.round(F.sum("sec_played") / 3600.0, 1).alias("hours_played"),
        F.count(F.lit(1)).alias("streams"),
        F.count(F.when(F.col("sec_played") > 10, F.lit(1)))
        .cast("long")
        .alias("non_skip_streams"),
        F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
    ]


def _year_col(fact: DataFrame) -> F.Column:
    # date_fk is the yyyymmdd smart key — year extraction is integer
    # arithmetic, no dim_date join needed (F19).
    return (F.col("date_fk") / 10000).cast("long")


# ---------------------------------------------------------------------------
# A1-A3: yearly / monthly / all-time aggregate views
# ---------------------------------------------------------------------------


def yearly_agg(fact_tracks: DataFrame) -> DataFrame:
    """dm.yearly_agg (dm_ddl.sql:18-31)."""
    return (
        fact_tracks.groupBy(_year_col(fact_tracks).alias("year"))
        .agg(
            *_mart_measures(),
            F.countDistinct("track_fk").cast("long").alias("unique_tracks"),
            F.countDistinct("artist_fk").cast("long").alias("unique_artists"),
        )
        .orderBy(F.desc("year"))
    )


def monthly_agg(fact_tracks: DataFrame) -> DataFrame:
    """dm.monthly_agg (dm_ddl.sql:34-48)."""
    month = ((F.col("date_fk") / 100).cast("long") % 100).alias("month_num")
    return (
        fact_tracks.groupBy(_year_col(fact_tracks).alias("year"), month)
        .agg(
            *_mart_measures(),
            F.countDistinct("track_fk").cast("long").alias("unique_tracks"),
            F.countDistinct("artist_fk").cast("long").alias("unique_artists"),
        )
        .withColumn(
            "month_start",
            F.make_date(F.col("year"), F.col("month_num"), F.lit(1)),
        )
        .orderBy(F.desc("year"), F.desc("month_num"))
    )


def all_time_agg(fact_tracks: DataFrame) -> DataFrame:
    """dm.all_time_agg (dm_ddl.sql:51-60) — days instead of hours."""
    return fact_tracks.agg(
        F.round(F.sum("sec_played") / 86400.0, 1).alias("days_played"),
        F.count(F.lit(1)).alias("streams"),
        F.count(F.when(F.col("sec_played") > 10, F.lit(1)))
        .cast("long")
        .alias("non_skip_streams"),
        F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
        F.countDistinct("track_fk").cast("long").alias("unique_tracks"),
        F.countDistinct("artist_fk").cast("long").alias("unique_artists"),
    )


# ---------------------------------------------------------------------------
# P5 dynamic filters + A8-A10 top-N table functions
# ---------------------------------------------------------------------------


def _dynamic_period_filter(df: DataFrame, year: int | None, month: int | None) -> DataFrame:
    """(filter_year IS NULL OR year = filter_year) AND month only valid
    with year (dm_ddl.sql:81-83); Catalyst folds the NULL arms."""
    y = _year_col(df)
    m = (F.col("date_fk") / 100).cast("long") % 100
    cond = F.lit(year).isNull() | (y == F.lit(year))
    if year is not None and month is not None:
        cond = cond & (m == F.lit(month))
    return df.filter(cond)


def top_tracks(
    fact_tracks: DataFrame,
    dim_track: DataFrame,
    parent_tracks: DataFrame | None = None,
    year: int | None = None,
    month: int | None = None,
    artist: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """dm.top_tracks (dm_ddl.sql:91-116): group by parent-coalesced
    track title; TakeOrderedAndProject top-N."""
    f = _dynamic_period_filter(fact_tracks, year, month)
    t = dim_track.select(
        "track_id", "track_title", "album_name", "artist_name", "cover_art_url"
    )
    if parent_tracks is not None:
        p = parent_tracks.select(
            F.col("child_id").alias("track_id"),
            F.col("parent_track_title"),
            F.col("parent_album_name"),
        )
        t = t.join(F.broadcast(p), "track_id", "left")
    else:
        t = t.withColumn("parent_track_title", F.lit(None).cast("string")).withColumn(
            "parent_album_name", F.lit(None).cast("string")
        )
    joined = f.join(F.broadcast(t), f.track_fk == t.track_id, "inner")
    if artist is not None:
        joined = joined.filter(F.col("artist_name") == artist)
    return (
        joined.groupBy(
            F.coalesce("parent_track_title", "track_title").alias("track_title"),
            F.col("artist_name"),
        )
        .agg(
            F.round(F.sum("sec_played") / 3600.0, 1).alias("hours_played"),
            F.count(F.lit(1)).alias("streams"),
            F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
            F.count(F.when(F.col("percent_played") == 100.0, F.lit(1)))
            .cast("long")
            .alias("full_real_streams"),
            F.max("cover_art_url").alias("cover_art_url"),
        )
        .orderBy(F.desc("hours_played"), F.asc("track_title"))
        .limit(limit)
    )


def top_albums(
    fact_tracks: DataFrame,
    dim_track: DataFrame,
    parent_tracks: DataFrame | None = None,
    year: int | None = None,
    month: int | None = None,
    artist: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """dm.top_albums (dm_ddl.sql:63-89)."""
    f = _dynamic_period_filter(fact_tracks, year, month)
    t = dim_track.select("track_id", "album_name", "artist_name", "cover_art_url")
    if parent_tracks is not None:
        p = parent_tracks.select(
            F.col("child_id").alias("track_id"), F.col("parent_album_name")
        )
        t = t.join(F.broadcast(p), "track_id", "left")
    else:
        t = t.withColumn("parent_album_name", F.lit(None).cast("string"))
    joined = f.join(F.broadcast(t), f.track_fk == t.track_id, "inner")
    if artist is not None:
        joined = joined.filter(F.col("artist_name") == artist)
    return (
        joined.groupBy(
            F.coalesce("parent_album_name", "album_name").alias("album_name"),
            F.col("artist_name"),
        )
        .agg(
            F.round(F.sum("sec_played") / 3600.0, 1).alias("hours_played"),
            F.count(F.lit(1)).alias("streams"),
            F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
            F.max("cover_art_url").alias("cover_art_url"),
        )
        .orderBy(F.desc("hours_played"), F.asc("album_name"))
        .limit(limit)
    )


def top_artists(
    fact_tracks: DataFrame,
    dim_artist: DataFrame,
    year: int | None = None,
    month: int | None = None,
    limit: int = 100,
) -> DataFrame:
    """dm.top_artists (dm_ddl.sql:119-141)."""
    f = _dynamic_period_filter(fact_tracks, year, month)
    a = dim_artist.select("artist_id", "artist_name", "cover_art_url")
    joined = f.join(F.broadcast(a), f.artist_fk == a.artist_id, "inner")
    return (
        joined.groupBy("artist_name")
        .agg(
            F.round(F.sum("sec_played") / 3600.0, 1).alias("hours_played"),
            F.count(F.lit(1)).alias("streams"),
            F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
            F.count(F.when(F.col("percent_played") == 100.0, F.lit(1)))
            .cast("long")
            .alias("full_real_streams"),
            F.max("cover_art_url").alias("cover_art_url"),
        )
        .orderBy(F.desc("hours_played"), F.asc("artist_name"))
        .limit(limit)
    )


def album_stats(
    fact_tracks: DataFrame,
    dim_track: DataFrame,
    album_name: str,
    artist_name: str,
) -> DataFrame:
    """dm.album_stats drill-down (dm_ddl.sql:144-162): per-track
    minutes + estimated streams within one (album, artist)."""
    t = dim_track.select("track_id", "track_title", "album_name", "artist_name")
    joined = fact_tracks.join(
        F.broadcast(t), fact_tracks.track_fk == t.track_id, "inner"
    ).filter((F.col("album_name") == album_name) & (F.col("artist_name") == artist_name))
    return (
        joined.groupBy("track_title")
        .agg(
            F.round(F.sum("sec_played") / 60.0, 1).alias("min_listened"),
            F.round(F.sum("percent_played") / 100.0, 0).alias("estimated_streams"),
        )
        .orderBy(F.desc("min_listened"), F.asc("track_title"))
    )


# ---------------------------------------------------------------------------
# §3.2 dashboard wrappers — pandas at the edge, validation like the
# reference (dashboard/dashboard_queries.py:4-43)
# ---------------------------------------------------------------------------

_CHART_BUILDERS = {"album": top_albums, "track": top_tracks, "artist": top_artists}


def get_chart_data(
    item_type: str,
    fact_tracks: DataFrame,
    dim_track: DataFrame | None = None,
    dim_artist: DataFrame | None = None,
    parent_tracks: DataFrame | None = None,
    year: int | None = None,
    month: int | None = None,
    limit: int = 100,
) -> pd.DataFrame:
    if item_type not in _CHART_BUILDERS:
        raise ValueError(f"item_type must be one of {sorted(_CHART_BUILDERS)}")
    if item_type == "artist":
        df = top_artists(fact_tracks, dim_artist, year=year, month=month, limit=limit)
    else:
        df = _CHART_BUILDERS[item_type](
            fact_tracks, dim_track, parent_tracks, year=year, month=month, limit=limit
        )
    return df.toPandas()


def get_aggregated_data(grain: str, fact_tracks: DataFrame) -> pd.DataFrame:
    if grain not in ("year", "month", "all_time"):
        raise ValueError("grain must be 'year', 'month' or 'all_time'")
    builder = {"year": yearly_agg, "month": monthly_agg, "all_time": all_time_agg}[grain]
    return builder(fact_tracks).toPandas()
