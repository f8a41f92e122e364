"""Declared schemas (never inferSchema — SURVEY §1.3).

The 19-column streaming-history contract mirrors the reference's
extractor projection (reference scripts/etl/extractor.py:41-64) typed
per docs/sql/staging_ddl.sql:1-22. The API envelope schemas declare
exactly the nested fields the reference's cleaning functions consume
(reference scripts/etl/transformer.py:13-130).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- raw streaming-history export (JSON array files) ----------------------

HISTORY_SCHEMA = StructType(
    [
        StructField("ts", StringType(), False),  # "%Y-%m-%dT%H:%M:%SZ"
        StructField("platform", StringType(), True),
        StructField("ms_played", IntegerType(), True),
        StructField("conn_country", StringType(), True),
        StructField("ip_addr", StringType(), True),
        StructField("master_metadata_track_name", StringType(), True),
        StructField("master_metadata_album_artist_name", StringType(), True),
        StructField("master_metadata_album_album_name", StringType(), True),
        StructField("spotify_track_uri", StringType(), True),
        StructField("episode_name", StringType(), True),
        StructField("episode_show_name", StringType(), True),
        StructField("spotify_episode_uri", StringType(), True),
        StructField("reason_start", StringType(), True),
        StructField("reason_end", StringType(), True),
        StructField("shuffle", BooleanType(), True),
        StructField("skipped", BooleanType(), True),
        StructField("offline", BooleanType(), True),
        StructField("offline_timestamp", LongType(), True),
        StructField("incognito_mode", BooleanType(), True),
    ]
)

HISTORY_COLS = [f.name for f in HISTORY_SCHEMA.fields]

# --- API enrichment envelopes (jsonb in the reference) ---------------------

_IMAGE = ArrayType(StructType([StructField("url", StringType(), True)]))

TRACK_SCHEMA = StructType(
    [
        StructField("uri", StringType(), True),
        StructField("name", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField(
            "album",
            StructType(
                [
                    StructField("name", StringType(), True),
                    StructField("id", StringType(), True),
                    StructField("album_type", StringType(), True),
                    StructField("release_date", StringType(), True),
                    StructField("release_date_precision", StringType(), True),
                    StructField("images", _IMAGE, True),
                ]
            ),
            True,
        ),
        StructField(
            "artists",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType(), True),
                        StructField("uri", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

ARTIST_SCHEMA = StructType(
    [
        StructField("uri", StringType(), True),
        StructField("name", StringType(), True),
        StructField("images", _IMAGE, True),
    ]
)

PODCAST_SCHEMA = StructType(
    [
        StructField("uri", StringType(), True),
        StructField("name", StringType(), True),
        StructField("description", StringType(), True),
        StructField("images", _IMAGE, True),
    ]
)

EPISODE_SCHEMA = StructType(
    [
        StructField("uri", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("release_date", StringType(), True),
        StructField("release_date_precision", StringType(), True),
        StructField(
            "show",
            StructType(
                [
                    StructField("name", StringType(), True),
                    StructField("uri", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

ENVELOPE_SCHEMAS = {
    "track": TRACK_SCHEMA,
    "artist": ARTIST_SCHEMA,
    "podcast": PODCAST_SCHEMA,
    "episode": EPISODE_SCHEMA,
}

# --- staging envelope table shape (S6) -------------------------------------

def envelope_schema(uri_col: str) -> StructType:
    return StructType(
        [
            StructField(uri_col, StringType(), False),
            StructField("raw_data", StringType(), False),  # JSON string
            StructField("fetched_at", TimestampType(), True),
            StructField("is_processed", BooleanType(), True),
        ]
    )


# --- dead-letter table (S7) -------------------------------------------------

FAILED_URIS_SCHEMA = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("entity_type", StringType(), True),
        StructField("error_reason", StringType(), True),
        StructField("failed_at", TimestampType(), True),
        StructField("retry_attempts", IntegerType(), True),
    ]
)
