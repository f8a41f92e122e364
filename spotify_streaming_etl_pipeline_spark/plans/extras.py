"""Parity promotions: operators previously covered only by unit tests,
now under the driver's DuckDB oracle gate (VERDICT r1 items 7-8).

- A14 grouped sum filtered by a key set  (reference
  scripts/parent_mapping/track_parent_select.py:60-67, `= ANY(%s)`)
- F13 release-date normalization         (reference
  scripts/etl/transformer.py:132-159)
- F23 deterministic surrogate keys       (reference serial columns,
  docs/sql/core_ddl.sql:5,111)
- F4/F5 ms->sec truncating + rounding    (reference transformer.py:283,45)
- J2  star left join with sentinel key 0 (reference transformer.py:315-316,
  docs/sql/dummy_values.sql)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    ms_to_sec_round,
    ms_to_sec_trunc,
    normalize_release_date,
)
from ..operators.surrogate import with_surrogate_key, with_surrogate_key_distributed
from ..sources.catalog import load_table
from .analytics import query

_KEYSET = [1, 3, 5, 7, 11, 13, 17, 19, 23, 29]


@query(
    "grouped_sum_keyset",
    f"""
    SELECT l_partkey,
           round(sum(l_quantity), 1) AS total_qty,
           cast(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_partkey IN ({", ".join(map(str, _KEYSET))})
    GROUP BY 1
    """,
)
def grouped_sum_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: `SUM(...) WHERE key = ANY(%s) GROUP BY key`. The isin
    literal set is pushed into the parquet scan as an IN filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_partkey").isin(_KEYSET))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_quantity"), 1).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "release_date_norm",
    """
    WITH t AS (
        SELECT o_orderkey,
               CASE o_orderkey % 3 WHEN 0 THEN 'day'
                                   WHEN 1 THEN 'month' ELSE 'year' END AS prec,
               CASE o_orderkey % 3
                   WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                   WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
                   ELSE strftime(o_orderdate, '%Y') END AS raw_release
        FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey, raw_release, prec,
           CASE WHEN raw_release LIKE '0000%' THEN '1900-01-01'
                WHEN prec = 'year' THEN raw_release || '-01-01'
                WHEN prec = 'month' THEN raw_release || '-01'
                ELSE raw_release END AS normalized
    FROM t
    """,
)
def release_date_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: precision-based release-date padding, exercised over
    synthesized (date-string, precision) pairs from orders."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    prec = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("day"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("month"))
        .otherwise(F.lit("year"))
    )
    raw = (
        F.when(prec == "day", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(prec == "month", F.date_format("o_orderdate", "yyyy-MM"))
        .otherwise(F.date_format("o_orderdate", "yyyy"))
    )
    out = o.select(
        "o_orderkey", raw.alias("raw_release"), prec.alias("prec")
    )
    return out.select(
        "o_orderkey",
        "raw_release",
        "prec",
        F.date_format(
            normalize_release_date(F.col("raw_release"), F.col("prec")), "yyyy-MM-dd"
        ).alias("normalized"),
    )


@query(
    "surrogate_keys",
    """
    SELECT c_custkey, c_name,
           cast(row_number() OVER (ORDER BY c_custkey) + 1000 AS BIGINT)
               AS customer_sk
    FROM customer
    """,
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23: dense deterministic surrogate keys continuing from an
    existing max (here 1000) — row_number parity with Postgres serial."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return with_surrogate_key(c, "customer_sk", ["c_custkey"], existing_max=1000)


@query(
    "surrogate_keys_distributed",
    """
    SELECT c_custkey, c_name,
           cast(row_number() OVER (ORDER BY c_custkey) + 1000 AS BIGINT)
               AS customer_sk
    FROM customer
    """,
)
def surrogate_keys_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23 at fact scale: the same dense numbering produced without a
    single-partition sort (range partition + per-partition rank +
    broadcast offset join) — the oracle proves output parity with the
    serial form."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return with_surrogate_key_distributed(
        c, "customer_sk", ["c_custkey"], existing_max=1000
    )


@query(
    "ms_rounding",
    """
    SELECT l_orderkey, l_linenumber,
           cast(round(l_extendedprice * 100, 0) AS BIGINT) AS ms,
           cast(floor(cast(round(l_extendedprice * 100, 0) AS BIGINT) / 1000)
               AS BIGINT) AS sec_trunc,
           cast(round(cast(round(l_extendedprice * 100, 0) AS BIGINT) / 1000.0)
               AS BIGINT) AS sec_round
    FROM lineitem WHERE l_orderkey < 300
    """,
)
def ms_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: Postgres truncating integer division vs Python-style
    rounding, ms -> sec (price cents standing in for milliseconds)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    ms = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ms.alias("ms"),
        ms_to_sec_trunc(ms).alias("sec_trunc"),
        ms_to_sec_round(ms).alias("sec_round"),
    )


@query(
    "user_sessions",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    s AS (
        SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM o
    )
    SELECT user_id,
           cast(epoch_ms(min(ts)) AS BIGINT) AS session_start_ms,
           cast(epoch_ms(max(ts)) + 1800000 AS BIGINT) AS session_end_ms,
           cast(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap over events —
    Spark's native session_window (stateful-streaming capable); the
    oracle reproduces it with gaps-and-islands SQL. Boundary semantics
    (verified empirically): an event exactly gap after the previous one
    MERGES into the session — Spark treats the window end as closed for
    merging — so only a strictly larger gap starts a new session."""
    from ..streaming.ingest import session_windows

    ev = load_table(spark, sf_dir, "events")
    return session_windows(ev, key_col="user_id", gap="30 minutes")


@query(
    "star_join_sentinel",
    """
    SELECT cast(coalesce(p_size, 0) AS BIGINT) AS part_size,
           cast(count(*) AS BIGINT) AS n_lines,
           round(sum(l_quantity), 1) AS total_qty
    FROM lineitem LEFT JOIN part
      ON l_partkey = p_partkey AND p_size > 25
    GROUP BY 1
    """,
)
def star_join_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left star join whose dim misses coalesce to the sentinel key
    0 (the reference's episode_id=0 'Unknown' row). The conditional
    join predicate forces real misses on TPC-H data."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    joined = li.join(
        p, (li.l_partkey == p.p_partkey) & (p.p_size > 25), "left"
    )
    return joined.groupBy(
        F.coalesce(F.col("p_size").cast("long"), F.lit(0)).alias("part_size")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 1).alias("total_qty"),
    )


@query(
    "asof_click_attribution",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id AS click_id, round(value, 2) AS click_value
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id,
           p.purchase_id,
           epoch_us(p.ts) AS purchase_ts_us,
           epoch_us(c.ts) AS click_ts_us,
           c.click_id,
           c.click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach the most recent prior click to each purchase,
    per user (operators/asof.py — one shuffle + window pass, no range
    explosion). The oracle is DuckDB's native ASOF LEFT JOIN, so the
    custom operator is hash-checked end to end. Timestamps compare at
    exact microsecond precision on both engines (events nanos are
    whole microseconds), emitted as epoch-micros BIGINT."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.round("value", 2).alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = asof_join(purchases, clicks, on=["user_id"])
    # events.ts reads as TIMESTAMP_NTZ; epoch_of emits wall-clock
    # epochs without touching the session timezone (the driver's
    # session is not ours to pin).
    from ..functions.scalar import epoch_of

    ts_type = joined.schema["ts"].dataType
    return joined.select(
        "user_id",
        "purchase_id",
        epoch_of(ts_type, F.col("ts"), "MICROSECOND").alias("purchase_ts_us"),
        epoch_of(ts_type, F.col("asof_ts"), "MICROSECOND").alias("click_ts_us"),
        "click_id",
        "click_value",
    )


# --- skew mitigation under the oracle gate -----------------------------------


@query(
    "skewed_agg_salted",
    """
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py:salted_agg)
    hash-checked against the plain GROUP BY it must equal: the hot
    key's rows spread over n_salts reducers in phase one, the merge
    phase sums the partials. The oracle proves the decomposition is
    exact, not approximately right."""
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"], sums=["value"], count_alias="n_events"
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


@query(
    "skewed_join_salted",
    """
    SELECT p_brand,
           cast(count(*) AS BIGINT) AS n_lines,
           round(sum(l_quantity), 1) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join (operators/skew.py:salted_join): the big
    side's hot key fans out over n_salts tasks, the small side is
    replicated once per salt. Result must equal the plain equi-join —
    proven by the grouped rollup hash."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "partkey"
    )
    p = load_table(spark, sf_dir, "part").withColumnRenamed(
        "p_partkey", "partkey"
    )
    joined = salted_join(li, p.select("partkey", "p_brand"), ["partkey"])
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 1).alias("total_qty"),
    )


# --- OLAP shapes: rollup & pivot ---------------------------------------------


@query(
    "rollup_agg",
    """
    SELECT cast(year(o_orderdate) AS BIGINT) AS year,
           cast(month(o_orderdate) AS BIGINT) AS month_num,
           cast(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 1) AS total_price
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in ONE pass: year/month, per-year, and
    grand total via `rollup` (Spark plans a single Expand + one
    shuffle — three grouping sets never rescan the fact)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup(
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month_num"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 1).alias("total_price"),
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "event_type_pivot",
    f"""
    SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
           {", ".join(
               f"cast(count(CASE WHEN event_type = '{t}' THEN 1 END) AS BIGINT)"
               f" AS {t}_events" for t in _EVENT_TYPES
           )}
    FROM events GROUP BY 1
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide daily activity matrix as conditional aggregates: ONE
    shuffle on the group key, columns map-side combined. (The
    `.pivot(col, values)` API plans a second aggregate+Exchange pair
    — groupBy(day, type) then pivotfirst — even with the value list
    given; for a fixed known list the conditional form is strictly
    better, and the plan pin enforces the single Exchange.)"""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1)))
            .cast("long")
            .alias(f"{t}_events")
            for t in _EVENT_TYPES
        ]
    )
