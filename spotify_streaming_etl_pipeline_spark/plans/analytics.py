"""Operator-coverage query suite over the driver's synthetic tables.

Each query here is the TPC-H-shaped incarnation of one operator class
from SURVEY.md §2 (the Spotify-domain incarnation lives in
plans/dims.py, facts.py, marts.py). Every query registers

  - a Spark builder  ``(spark, sf_dir) -> DataFrame``  (QUERIES)
  - an equivalent ANSI-SQL string DuckDB can run       (ORACLE)

and both sides alias every computed column identically, because the
driver's correctness gate hash-compares values column-by-name.

Scale notes (the plans are written for 100 TB, tested at sf0.1):
  - dims (region/nation/customer/supplier/part) are broadcast — star
    joins never shuffle the fact side on dim keys;
  - aggregations are expressed as single groupBy so Spark plans
    partial (map-side) aggregation automatically;
  - top-N is ``orderBy().limit()`` → TakeOrderedAndProject, no global
    sort;
  - multi-countDistinct in one groupBy uses Spark's expand-based plan
    (no per-distinct re-shuffle of the raw fact).

Determinism notes for the DuckDB oracle:
  - double aggregates are rounded (the sub-ULP sum-order drift between
    engines disappears at 1-2 decimals);
  - integer aggregates are cast to BIGINT on BOTH sides (DuckDB sums
    to HUGEINT, Spark to LONG);
  - every ORDER BY ... LIMIT carries a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import date_id, from_utc, is_weekend, part_of_day, safe_percent
from ..sources.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A1/A2/A3 — grouped multi-aggregates (yearly / monthly / all-time)
# Reference: dm.yearly_agg / monthly_agg / all_time_agg views
# (reference docs/sql/dm_ddl.sql:18-60). Same measure shapes: unit-scaled
# rounded sum, raw count, conditional count, estimated-count, two exact
# count-distincts (expand-based plan, single shuffle).
# ---------------------------------------------------------------------------

_AGG_MEASURES_SQL = """
    round(sum(l_quantity) / 3600.0, 1) AS qty_hours,
    count(*) AS n_items,
    cast(count(CASE WHEN l_quantity > 25 THEN 1 END) AS BIGINT) AS n_big_items,
    round(sum(l_extendedprice * (1 - l_discount)) / 100.0, 0) AS est_units,
    cast(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
    cast(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
"""


def _agg_measures() -> list[F.Column]:
    return [
        F.round(F.sum("l_quantity") / 3600.0, 1).alias("qty_hours"),
        F.count(F.lit(1)).alias("n_items"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1)))
        .cast("long")
        .alias("n_big_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) / 100.0, 0)
        .alias("est_units"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
    ]


@query(
    "yearly_agg",
    f"""
    SELECT cast(year(o_orderdate) AS BIGINT) AS year, {_AGG_MEASURES_SQL}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def yearly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("year")
    ).agg(*_agg_measures())


@query(
    "monthly_agg",
    f"""
    SELECT cast(year(o_orderdate) AS BIGINT) AS year,
           cast(month(o_orderdate) AS BIGINT) AS month_num,
           strftime(make_date(cast(year(o_orderdate) AS INT),
                    cast(month(o_orderdate) AS INT), 1), '%Y-%m-%d') AS month_start,
           {_AGG_MEASURES_SQL}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2, 3
    """,
)
def monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    # Group on the two integer keys only; month_start is functionally
    # dependent on (year, month) so it's derived AFTER the aggregate —
    # keeps the Expand + both shuffles keyed on 2 longs instead of
    # dragging a formatted string through every row.
    agg = joined.groupBy(
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("long").alias("month_num"),
    ).agg(*_agg_measures())
    return agg.select(
        "year",
        "month_num",
        F.date_format(
            F.make_date(
                F.col("year").cast("int"), F.col("month_num").cast("int"), F.lit(1)
            ),
            "yyyy-MM-dd",
        ).alias("month_start"),
        *[c for c in agg.columns if c not in ("year", "month_num")],
    )


@query(
    "all_time_agg",
    f"""
    SELECT {_AGG_MEASURES_SQL},
           round(sum(l_quantity) / 86400.0, 1) AS qty_days
    FROM lineitem
    """,
)
def all_time_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        *_agg_measures(),
        F.round(F.sum("l_quantity") / 86400.0, 1).alias("qty_days"),
    )


# ---------------------------------------------------------------------------
# J1/J2 — the 6-way star left join with sentinel coalesce.
# Reference: insert_core_facts (reference scripts/etl/transformer.py:272-333).
# All five dims broadcast; the fact side never shuffles for the joins —
# only the final small groupBy shuffles (a few dozen groups).
# ---------------------------------------------------------------------------


@query(
    "star_join",
    """
    SELECT coalesce(r_name, 'UNKNOWN') AS region_name,
           coalesce(o_orderpriority, 'UNKNOWN') AS priority,
           round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
           cast(count(*) AS BIGINT) AS n_rows,
           cast(count(DISTINCT c_custkey) AS BIGINT) AS n_custs,
           cast(count(DISTINCT s_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    LEFT JOIN orders   ON l_orderkey = o_orderkey
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    LEFT JOIN supplier ON l_suppkey = s_suppkey
    LEFT JOIN part     ON l_partkey = p_partkey
    GROUP BY 1, 2
    """,
)
def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    p = F.broadcast(_t(spark, sf_dir, "part"))
    star = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
        .join(s, li.l_suppkey == s.s_suppkey, "left")
        .join(p, li.l_partkey == p.p_partkey, "left")
    )
    return star.groupBy(
        F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
        F.coalesce("o_orderpriority", F.lit("UNKNOWN")).alias("priority"),
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").cast("long").alias("n_custs"),
        F.countDistinct("s_suppkey").cast("long").alias("n_supps"),
    )


# ---------------------------------------------------------------------------
# F3/F4 — row-level derived measures with NULLIF guard + truncating div.
# Reference: sec_played / percent_played (transformer.py:283-289).
# Pure projection — stays inside one WholeStageCodegen span, no shuffle.
# ---------------------------------------------------------------------------


@query(
    "derived_measures",
    """
    SELECT l_orderkey, l_linenumber,
           cast(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(l_quantity / nullif(l_tax, 0) * 100, 1) AS qty_tax_pct,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged
    FROM lineitem
    WHERE l_orderkey < 400
    """,
)
def derived_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k"),
        safe_percent(F.col("l_quantity"), F.col("l_tax")).alias("qty_tax_pct"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            2,
        ).alias("charged"),
    )


# ---------------------------------------------------------------------------
# A8/O2 — parameterized top-N grouped aggregate (TakeOrderedAndProject).
# Reference: dm.top_albums/top_tracks (docs/sql/dm_ddl.sql:63-116).
# ---------------------------------------------------------------------------


@query(
    "top_parts",
    """
    SELECT p_brand, p_name,
           round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue,
           cast(count(*) AS BIGINT) AS n_lines,
           cast(count(CASE WHEN l_discount = 0 THEN 1 END) AS BIGINT) AS full_price_lines,
           max(p_type) AS any_type
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
    ORDER BY revenue DESC, p_name, p_brand
    LIMIT 10
    """,
)
def top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_parts_param(spark, sf_dir, limit=10)


def top_parts_param(
    spark: SparkSession,
    sf_dir: str,
    limit: int = 10,
    brand: str | None = None,
) -> DataFrame:
    """P5-style dynamic filter: brand=None means no predicate, exactly
    like the reference's `(filter_year IS NULL OR ...)` PL/pgSQL params
    (docs/sql/dm_ddl.sql:81-83). Catalyst constant-folds the null arm."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    if brand is not None:
        joined = joined.filter(F.col("p_brand") == brand)
    return (
        joined.groupBy("p_brand", "p_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 1
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("l_discount") == 0, F.lit(1)))
            .cast("long")
            .alias("full_price_lines"),
            F.max("p_type").alias("any_type"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_name"), F.asc("p_brand"))
        .limit(limit)
    )


@query(
    "album_stats",
    """
    SELECT p_name AS track_title,
           round(sum(l_extendedprice) / 60.0, 1) AS min_listened,
           round(sum(l_extendedprice * (1 - l_discount) / 100.0) / 100.0, 0)
               AS estimated_streams
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
)
def album_stats_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 drill-down mart gated by oracle: the REAL ``marts.album_stats``
    (reference dm.album_stats, docs/sql/dm_ddl.sql:144-162) run through a
    TPC-H adapter — lineitem plays the fact (l_extendedprice as
    sec_played; the discounted price in percent units as percent_played;
    both continuous, so no dyadic 0.25-tie can split the engines'
    round()), part plays dim_track with (p_brand, p_type) as the
    (album, artist) drill-down key.  Ordering in the mart is cosmetic
    (no LIMIT), so the hash compare is order-insensitive."""
    from .marts import album_stats

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    fact = li.select(
        F.col("l_partkey").alias("track_fk"),
        F.col("l_extendedprice").alias("sec_played"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) / 100.0).alias(
            "percent_played"
        ),
    )
    dim = p.select(
        F.col("p_partkey").alias("track_id"),
        F.col("p_name").alias("track_title"),
        F.col("p_brand").alias("album_name"),
        F.col("p_type").alias("artist_name"),
    )
    return album_stats(fact, dim, "Brand#5", "ECONOMY")


@query(
    "top_customers_1996",
    """
    SELECT c_name, n_name,
           round(sum(o_totalprice), 1) AS total_spend,
           cast(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE (1996 IS NOT NULL AND year(o_orderdate) = 1996)
    GROUP BY 1, 2
    ORDER BY total_spend DESC, c_name
    LIMIT 15
    """,
)
def top_customers_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_customers(spark, sf_dir, year=1996, limit=15)


def top_customers(
    spark: SparkSession, sf_dir: str, year: int | None = None, limit: int = 15
) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    # Dynamic predicate exactly as the reference's optional params (P5):
    # a NULL param disables the filter; Catalyst folds the constant arm.
    cond = F.lit(year).isNull() | (F.year("o_orderdate") == F.lit(year))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .filter(cond)
        .groupBy("c_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 1).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_name"))
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# J5/J6 — anti join; semi join; U2/J7 — set difference.
# Reference: unmapped-tracks anti-join (ts_version_mapping.py:6-18),
# NOT IN (album_mapping.sql), Python set-difference dedup
# (extractor.py:227-252).
# ---------------------------------------------------------------------------


@query(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "customers_with_open_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "parts_never_ordered",
    """
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    # exceptAll-free EXCEPT: distinct + subtract == SQL EXCEPT semantics,
    # mirroring the reference's Python set difference (extractor.py:250).
    return p.distinct().subtract(li.distinct())


# ---------------------------------------------------------------------------
# U1/A7 — distinct-union dimension build (dim_reason).
# Reference: populate_dim_reason (transformer.py:351-376).
# ---------------------------------------------------------------------------


@query(
    "union_dims",
    """
    SELECT DISTINCT o_orderpriority AS reason_type, 'order' AS reason_group
    FROM orders
    UNION ALL
    SELECT DISTINCT l_returnflag AS reason_type, 'return' AS reason_group
    FROM lineitem
    """,
)
def union_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("reason_type"))
        .distinct()
        .withColumn("reason_group", F.lit("order"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("reason_type"))
        .distinct()
        .withColumn("reason_group", F.lit("return"))
    )
    return o.unionByName(li)


# ---------------------------------------------------------------------------
# J10 — conflict-ignore append (dedup + anti-join vs target).
# Reference: ON CONFLICT DO NOTHING (db_manager.py:72, core_ddl.sql:19-20).
# ---------------------------------------------------------------------------


@query(
    "conflict_ignore_append",
    """
    WITH incoming AS (
        SELECT user_id, event_type, cast(min(event_id) AS BIGINT) AS event_id
        FROM events WHERE event_id >= 800 GROUP BY 1, 2
    ),
    target AS (
        SELECT DISTINCT user_id, event_type FROM events WHERE event_id < 800
    )
    SELECT i.user_id, i.event_type, i.event_id
    FROM incoming i
    WHERE NOT EXISTS (
        SELECT 1 FROM target t
        WHERE t.user_id = i.user_id AND t.event_type = i.event_type
    )
    """,
)
def conflict_ignore_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    incoming = (
        ev.filter(F.col("event_id") >= 800)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("event_id"))
    )
    target = (
        ev.filter(F.col("event_id") < 800).select("user_id", "event_type").distinct()
    )
    return incoming.join(target, ["user_id", "event_type"], "left_anti").select(
        "user_id", "event_type", "event_id"
    )


# ---------------------------------------------------------------------------
# J11 — conflict-update upsert (ON CONFLICT DO UPDATE).
# Reference: ts_version_mapping.py:32-47 (EXCLUDED.* wins on collision).
# Exercises operators/writer.upsert: incoming replaces colliding target
# rows, unmatched target rows survive, brand-new keys append.
# ---------------------------------------------------------------------------


@query(
    "upsert_conflict_update",
    """
    WITH incoming AS (
        SELECT user_id, event_type, cast(max(event_id) AS BIGINT) AS last_event_id
        FROM events WHERE event_id >= 800 GROUP BY 1, 2
    ),
    target AS (
        SELECT user_id, event_type, cast(min(event_id) AS BIGINT) AS last_event_id
        FROM events WHERE event_id < 800 GROUP BY 1, 2
    )
    SELECT user_id, event_type, last_event_id FROM incoming
    UNION ALL
    SELECT t.user_id, t.event_type, t.last_event_id
    FROM target t
    WHERE NOT EXISTS (
        SELECT 1 FROM incoming i
        WHERE i.user_id = t.user_id AND i.event_type = t.event_type
    )
    """,
)
def upsert_conflict_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.writer import upsert

    ev = _t(spark, sf_dir, "events")
    incoming = (
        ev.filter(F.col("event_id") >= 800)
        .groupBy("user_id", "event_type")
        .agg(F.max("event_id").alias("last_event_id"))
    )
    target = (
        ev.filter(F.col("event_id") < 800)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("last_event_id"))
    )
    return upsert(incoming, ["user_id", "event_type"], target)


# ---------------------------------------------------------------------------
# P2/J9/A6/F7 — delta-load predicate via scalar subquery + GREATEST of maxes.
# Reference: get_max_history_ts (db_manager.py:139-153) + ts > max filter
# (extractor.py:65, transformer.py:302-305).
# ---------------------------------------------------------------------------

_DELTA_SQL = """
    SELECT event_type, cast(count(*) AS BIGINT) AS n_new,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE ts > (
        SELECT greatest(
            coalesce((SELECT max(ts) FROM events WHERE event_type = 'purchase'),
                     TIMESTAMP '1900-01-01'),
            coalesce((SELECT max(ts) FROM events WHERE event_type = 'signup'),
                     TIMESTAMP '1900-01-01')
        )
    )
    GROUP BY 1
"""


@query("delta_load", _DELTA_SQL)
def delta_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark SQL supports the scalar-subquery form verbatim (J9) — run it
    # as SQL to exercise that path, like the reference's INSERT..SELECT.
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_DELTA_SQL)


# ---------------------------------------------------------------------------
# §2.5 — windowed per-group top-N (the natural generalization the survey
# calls out; reference does ORDER BY..LIMIT only).
# ---------------------------------------------------------------------------


@query(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, cast(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# A12/A13/J8 — HAVING on count-distinct + CTE-join USING.
# Reference: variant-selection query (track_parent_select.py:11-46).
# ---------------------------------------------------------------------------


@query(
    "multi_supplier_parts",
    """
    WITH variants AS (
        SELECT l_partkey, cast(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        FROM lineitem GROUP BY 1
        HAVING count(DISTINCT l_suppkey) > 1
    ),
    totals AS (
        SELECT l_partkey, round(sum(l_quantity), 1) AS total_qty
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, n_supps, total_qty
    FROM variants JOIN totals USING (l_partkey)
    WHERE total_qty > 300
    """,
)
def multi_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    variants = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("n_supps"))
        .filter(F.col("n_supps") > 1)
    )
    totals = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_quantity"), 1).alias("total_qty")
    )
    return variants.join(totals, ["l_partkey"]).filter(F.col("total_qty") > 300)


# ---------------------------------------------------------------------------
# A11 — ordered array aggregation (deterministic form).
# Reference: ARRAY_AGG per group (track_parent_select.py:11-25); the survey
# notes order is unguaranteed — we pin it by sorting, and emit a string so
# the oracle hash is representation-stable.
# ---------------------------------------------------------------------------


@query(
    "order_line_numbers",
    """
    SELECT l_orderkey,
           string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
           cast(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_orderkey < 200
    GROUP BY 1
    """,
)
def order_line_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# A5/F12 — JSON traversal + aggregation over extracted field.
# Reference: jsonb '->' / jsonb_array_elements (db_manager.py:124-137).
# ---------------------------------------------------------------------------


@query(
    "json_props_histogram",
    """
    SELECT cast(json_extract_string(props, '$.k') AS BIGINT) AS k,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# F9/F10/F11/F15/F19 — generated date & time dimensions.
# Reference: docs/sql/dim_date_populate.sql / dim_time_populate.sql.
# ---------------------------------------------------------------------------


@query(
    "dim_date",
    """
    SELECT cast(year(d)*10000 + month(d)*100 + day(d) AS BIGINT) AS date_id,
           strftime(d, '%Y-%m-%d') AS date,
           cast(year(d) AS BIGINT) AS year,
           cast(month(d) AS BIGINT) AS month_num,
           strftime(d, '%b') AS month_abbr,
           monthname(d) AS month_name,
           cast(day(d) AS BIGINT) AS day,
           dayname(d) AS day_name,
           cast(weekofyear(d) AS BIGINT) AS week,
           isodow(d) IN (6, 7) AS is_weekend
    FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)
    """,
)
def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_dim_date(spark, "2024-01-01", "2024-12-31")


def build_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Generated calendar dim (reference docs/sql/dim_date_populate.sql).
    sequence+explode runs on the cluster; no driver loop."""
    d = F.col("date")
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit(start)),
                    F.to_date(F.lit(end)),
                    F.expr("interval 1 day"),
                )
            ).alias("date")
        )
        .select(
            date_id(d).alias("date_id"),
            F.date_format(d, "yyyy-MM-dd").alias("date"),
            F.year(d).cast("long").alias("year"),
            F.month(d).cast("long").alias("month_num"),
            F.date_format(d, "MMM").alias("month_abbr"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.dayofmonth(d).cast("long").alias("day"),
            F.date_format(d, "EEEE").alias("day_name"),
            F.weekofyear(d).cast("long").alias("week"),
            is_weekend(d).alias("is_weekend"),
        )
    )


@query(
    "dim_time",
    """
    SELECT cast(m AS BIGINT) AS time_id,
           cast(m // 60 AS BIGINT) AS hour,
           cast(m % 60 AS BIGINT) AS minute,
           CASE WHEN m // 60 >= 6 AND m // 60 < 12 THEN 'morning'
                WHEN m // 60 >= 12 AND m // 60 < 18 THEN 'afternoon'
                WHEN m // 60 >= 18 AND m // 60 < 23 THEN 'evening'
                ELSE 'night' END AS part_of_day
    FROM range(0, 1440) t(m)
    """,
)
def dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_dim_time(spark)


def build_dim_time(spark: SparkSession) -> DataFrame:
    """Minute-of-day dim 0..1439 (reference docs/sql/dim_time_populate.sql)."""
    hour = (F.col("id") / 60).cast("long")
    return spark.range(0, 1440).select(
        F.col("id").alias("time_id"),
        hour.alias("hour"),
        (F.col("id") % 60).alias("minute"),
        part_of_day(hour).alias("part_of_day"),
    )


# ---------------------------------------------------------------------------
# P6/F16/F17 — pattern predicates + string replace.
# Reference: ILIKE Taylor's-Version filters (ts_version_mapping.py:15,
# track_parent_select.py:21-22, album_mapping.sql).
# ---------------------------------------------------------------------------


@query(
    "pattern_filter",
    """
    SELECT p_partkey, replace(p_name, ' ', '_') AS slug, p_type, p_brand
    FROM part
    WHERE p_type ILIKE '%brass%' AND p_name NOT LIKE '%green%'
    """,
)
def pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").ilike("%brass%") & ~F.col("p_name").like("%green%")
    ).select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("slug"),
        "p_type",
        "p_brand",
    )


# ---------------------------------------------------------------------------
# F1/F2 — timezone conversion to Moscow wall-clock + date/hour grouping.
# Reference: AT TIME ZONE pairs (transformer.py:279,293-294).
# ---------------------------------------------------------------------------


@query(
    "msk_hourly",
    """
    SELECT strftime(timezone('Europe/Moscow', timezone('UTC', ts)), '%Y-%m-%d')
               AS msk_date,
           cast(hour(timezone('Europe/Moscow', timezone('UTC', ts))) AS BIGINT)
               AS msk_hour,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def msk_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    msk = from_utc(F.col("ts"))
    return ev.groupBy(
        F.date_format(msk, "yyyy-MM-dd").alias("msk_date"),
        F.hour(msk).cast("long").alias("msk_hour"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# §2.9 — tumbling-window aggregation (batch form of the streaming plan;
# streaming/ingest.py runs the same logic under readStream+watermark).
# ---------------------------------------------------------------------------


@query(
    "hourly_event_windows",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # F.window aligns tumbling windows to the epoch → identical to
    # date_trunc('hour') for 1-hour windows.
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
