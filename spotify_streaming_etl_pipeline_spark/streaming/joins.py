"""Watermarked stream-stream joins (SURVEY §2.9 additive posture).

The batch engine answers "which purchase followed a click within N
minutes" with one equi+range join (plans/behavior.py and
operators/asof.py cover those shapes). The streaming form is Spark's
watermarked stream-stream join: both sides buffer state, the
event-time range condition bounds how long a row can still find a
partner, and the watermark lets Spark evict state older than
(watermark + interval) — without it the join would buffer both
streams forever. That state bound is the whole design at 100 TB/day:
state size ≈ rate × (watermark + within), independent of stream
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Purchases joined to every SAME-USER click in the preceding
    ``within`` interval (click.ts <= purchase.ts <= click.ts + within).

    Works identically on batch frames (watermarks are a no-op there)
    and on streaming frames, where the time-bound condition plus both
    watermarks make the join state evictable. Returns one row per
    (click, purchase) match with both timestamps.

    Streaming event time must be TIMESTAMP, not TIMESTAMP_NTZ (Spark
    rejects NTZ watermarks) — callers with NTZ sources cast first so
    the zone interpretation is an explicit, visible decision.
    """
    c = clicks.withWatermark(ts_col, watermark).alias("c") if clicks.isStreaming else clicks.alias("c")
    p = (
        purchases.withWatermark(ts_col, watermark).alias("p")
        if purchases.isStreaming
        else purchases.alias("p")
    )
    cond = (
        (F.col(f"c.{key_col}") == F.col(f"p.{key_col}"))
        & (F.col(f"p.{ts_col}") >= F.col(f"c.{ts_col}"))
        & (F.col(f"p.{ts_col}") <= F.col(f"c.{ts_col}") + F.expr(f"INTERVAL {within}"))
    )
    return p.join(c, cond, "inner").select(
        F.col(f"p.{key_col}").alias(key_col),
        F.col(f"c.{id_col}").alias("click_id"),
        F.col(f"p.{id_col}").alias("purchase_id"),
        F.col(f"c.{ts_col}").alias("click_ts"),
        F.col(f"p.{ts_col}").alias("purchase_ts"),
    )
