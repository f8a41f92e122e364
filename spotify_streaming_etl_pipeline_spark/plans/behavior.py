"""Behavioral analytics over the event stream: funnel conversion and
cohort retention — the two queries every product-analytics deployment
of an event pipeline runs first (additive family, SURVEY §2.11; the
reference's dashboard marts are per-entity top-Ns, not behavioral).

Scale shapes (written for 100 TB of events, tested at sf0.1):

- ``funnel_conversion``: the sequential dependency (step k's timestamp
  must EXCEED step k-1's) is expressed as a chain of unbounded
  ``min(CASE ...) OVER (PARTITION BY user_id)`` windows. All three
  window passes share one partitioning, so the whole funnel costs ONE
  shuffle of the events table — no per-step self-joins (the naive
  formulation shuffles events once per step).
- ``cohort_retention``: the per-user first-activity month is an
  unbounded min window over the same user partitioning as the distinct
  (user, month) activity set — again one shuffle of events, then an
  aggregate over the (cohort, offset) grid, which is tiny (months²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .analytics import query

# The ordered funnel steps; events carry view/click/purchase (plus
# signup/error) event types.
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_times(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user strictly-increasing step timestamps: t1 = first step-1
    event; t_k = first step-k event AFTER t_{k-1} (NULL once any link
    breaks). One row per user with columns t1..tN.

    Each t_k is ``min(CASE WHEN type = step_k AND ts > t_{k-1})`` over
    an unbounded window partitioned by user — the chain nests, but all
    windows share the user partitioning so Catalyst plans a single
    Exchange followed by N Window operators (pinned in
    tests/test_behavior.py::test_funnel_single_shuffle_window_chain)."""
    w = Window.partitionBy(user_col)
    df = events
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(
            f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"t{i}"
    t_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    return df.groupBy(user_col).agg(
        *[F.first(t).alias(t) for t in t_cols]
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """One row per funnel step: users who reached it (in order) and
    conversion percent vs step 1. ``n_users`` counts users whose t_k is
    non-null — i.e. who performed every prior step first."""
    per_user = funnel_times(events, steps)
    counts = per_user.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # stack() unpivots the 1-row counts frame to one row per step in a
    # single plan subtree — a unionAll of per-step selects would embed
    # N copies of the window+aggregate chain in the logical plan.
    parts = ", ".join(
        f"cast({i} AS bigint), '{step}', n{i}"
        for i, step in enumerate(steps, start=1)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {parts}) AS (step_no, step, n_users)"
        ),
        F.col("n1").alias("_n1"),
    ).select(
        "step_no",
        "step",
        "n_users",
        F.round(F.col("n_users") * 100.0 / F.col("_n1"), 2).alias("pct_of_first"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_ym, month_offset, n_users): distinct users from the
    cohort (first-ever activity month, yyyymm int) active again
    ``month_offset`` months later. Month key is integer year*12+month
    arithmetic — no timestamp rendering, so it is identical on any
    session timezone and in the DuckDB oracle."""
    mkey = (F.year(ts_col) * 12 + F.month(ts_col) - 1).cast("long")
    w = Window.partitionBy(user_col)
    # No pre-distinct: the final countDistinct dedups (user) per grid
    # cell map-side anyway, so an explicit .distinct() would only add
    # a third shuffle for nothing.
    act = events.select(F.col(user_col), mkey.alias("mk")).withColumn(
        "cohort_mk", F.min("mk").over(w)
    )
    return (
        act.groupBy(
            (
                F.floor(F.col("cohort_mk") / 12) * 100
                + (F.pmod(F.col("cohort_mk"), 12) + 1)
            )
            .cast("long")
            .alias("cohort_ym"),
            (F.col("mk") - F.col("cohort_mk")).cast("long").alias("month_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )


@query(
    "funnel_conversion",
    """
    WITH t AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    t2s AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM t
    ),
    t3s AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM t2s
    ),
    u AS (
        SELECT user_id, any_value(t1) AS t1, any_value(t2) AS t2,
               any_value(t3) AS t3
        FROM t3s GROUP BY user_id
    ),
    c AS (
        SELECT cast(count(t1) AS BIGINT) AS n1,
               cast(count(t2) AS BIGINT) AS n2,
               cast(count(t3) AS BIGINT) AS n3
        FROM u
    )
    SELECT cast(1 AS BIGINT) AS step_no, 'view' AS step, n1 AS n_users,
           round(n1 * 100.0 / n1, 2) AS pct_of_first FROM c
    UNION ALL
    SELECT cast(2 AS BIGINT), 'click', n2, round(n2 * 100.0 / n1, 2) FROM c
    UNION ALL
    SELECT cast(3 AS BIGINT), 'purchase', n3, round(n3 * 100.0 / n1, 2) FROM c
    """,
)
def funnel_conversion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel. The strict-order semantics
    (a click only counts after the user's first view; a purchase only
    after that click) is what distinguishes a funnel from three
    independent counts."""
    return funnel_conversion(load_table(spark, sf_dir, "events"))


@query(
    "cohort_retention",
    """
    WITH a AS (
        SELECT DISTINCT user_id,
               (year(ts) * 12 + month(ts) - 1) AS mk,
               min(year(ts) * 12 + month(ts) - 1)
                   OVER (PARTITION BY user_id) AS cohort_mk
        FROM events
    )
    SELECT cast((cohort_mk // 12) * 100 + (cohort_mk % 12) + 1 AS BIGINT)
               AS cohort_ym,
           cast(mk - cohort_mk AS BIGINT) AS month_offset,
           cast(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM a GROUP BY 1, 2
    """,
)
def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort × month-offset retention grid over events."""
    return cohort_retention(load_table(spark, sf_dir, "events"))


@query(
    "scd2_history",
    """
    WITH o AS (
        SELECT user_id, ts, event_type, event_id,
               lag(event_type) OVER w AS prev,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chg AS (
        SELECT user_id, ts, event_type, event_id FROM o
        WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type AS attr,
           cast(epoch_ms(ts) AS BIGINT) AS valid_from_ms,
           cast(coalesce(epoch_ms(lead(ts) OVER w2), -1) AS BIGINT)
               AS valid_to_ms,
           cast(CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current,
           cast(row_number() OVER w2 AS BIGINT) AS version
    FROM chg
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_history_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 over the events feed, treating event_type as the
    tracked attribute per user: consecutive same-type events collapse,
    each type change opens a [valid_from, valid_to) interval. Epochs
    via zone-proof epoch_of; open intervals surface as -1."""
    from ..functions.scalar import epoch_of
    from ..operators.scd import scd2_collapse

    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    hist = scd2_collapse(
        ev, key_col="user_id", attr_col="event_type", tiebreak_col="event_id"
    )
    return hist.select(
        "user_id",
        F.col("event_type").alias("attr"),
        epoch_of(ts_type, F.col("valid_from"), "MILLISECOND").alias(
            "valid_from_ms"
        ),
        F.coalesce(
            epoch_of(ts_type, F.col("valid_to"), "MILLISECOND"), F.lit(-1)
        ).alias("valid_to_ms"),
        F.col("is_current").cast("long").alias("is_current"),
        "version",
    )


_HALF_WINDOW_MS = 30 * 60 * 1000  # error windows reach ±30 min


@query(
    "interval_join_binned",
    f"""
    SELECT p.event_id AS purchase_id,
           cast(count(*) AS BIGINT) AS n_windows,
           cast(min(e.event_id) AS BIGINT) AS first_error_id
    FROM events p JOIN events e
      ON p.event_type = 'purchase' AND e.event_type = 'error'
     AND epoch_ms(p.ts) >= epoch_ms(e.ts) - {_HALF_WINDOW_MS}
     AND epoch_ms(p.ts) <  epoch_ms(e.ts) + {_HALF_WINDOW_MS}
    GROUP BY 1
    """,
)
def interval_join_binned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases inside ±30-minute windows around ANY error event —
    a pure range join with no equi-key, which Spark would otherwise
    plan as a nested-loop pair stream. The binned operator
    (operators/rangejoin.py) turns it into one equi-join on 30-minute
    time buckets; the oracle states the naive inequality join."""
    from ..functions.scalar import epoch_of
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    ems = epoch_of(ts_type, F.col("ts"), "MILLISECOND")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        (ems - _HALF_WINDOW_MS).alias("start_ms"),
        (ems + _HALF_WINDOW_MS).alias("end_ms"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), ems.alias("pms")
    )
    joined = interval_join(
        purchases,
        errors,
        point_ms="pms",
        start_ms="start_ms",
        end_ms="end_ms",
        bucket_width_ms=_HALF_WINDOW_MS,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.min("error_id").alias("first_error_id"),
    )


@query(
    "rolling_revenue_7d",
    """
    SELECT o_orderkey,
           o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 2) AS rev_7d,
           cast(count(*) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_orders_7d
    FROM orders
    """,
)
def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per customer attached to every order —
    the time-RANGE window frame (value-based, not row-based: all
    orders within the last 6 days of *time* join the frame, however
    many rows that is, and same-day ties always agree). One shuffle on
    o_custkey; frame evaluation is a per-partition sliding scan, no
    self-join. At 100 TB this is the canonical replacement for the
    'join the table to itself on a date inequality' anti-pattern."""
    o = load_table(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_7d"),
    )


# --- one-pass table profiler -------------------------------------------------

_PROFILE_COLS = ['l_orderkey', 'l_quantity', 'l_discount', 'l_returnflag', 'l_shipdate']


@query(
    "table_profile",
    """
    WITH w AS (
        SELECT count(*) AS _rows,
               count(l_orderkey) AS nn1,
               count(DISTINCT l_orderkey) AS nd1,
               cast(min(l_orderkey) AS VARCHAR) AS mn1,
               cast(max(l_orderkey) AS VARCHAR) AS mx1,
               count(l_quantity) AS nn2,
               count(DISTINCT l_quantity) AS nd2,
               cast(min(l_quantity) AS VARCHAR) AS mn2,
               cast(max(l_quantity) AS VARCHAR) AS mx2,
               count(l_discount) AS nn3,
               count(DISTINCT l_discount) AS nd3,
               cast(min(l_discount) AS VARCHAR) AS mn3,
               cast(max(l_discount) AS VARCHAR) AS mx3,
               count(l_returnflag) AS nn4,
               count(DISTINCT l_returnflag) AS nd4,
               cast(min(l_returnflag) AS VARCHAR) AS mn4,
               cast(max(l_returnflag) AS VARCHAR) AS mx4,
               count(l_shipdate) AS nn5,
               count(DISTINCT l_shipdate) AS nd5,
               cast(min(l_shipdate) AS VARCHAR) AS mn5,
               cast(max(l_shipdate) AS VARCHAR) AS mx5
        FROM lineitem
    )
    SELECT 'l_orderkey' AS col_name, cast(_rows AS BIGINT) AS n_rows,
           cast(_rows - nn1 AS BIGINT) AS n_nulls,
           round((_rows - nn1) * 100.0 / _rows, 2) AS null_pct,
           cast(nd1 AS BIGINT) AS n_distinct,
           mn1 AS min_str, mx1 AS max_str FROM w
    UNION ALL
    SELECT 'l_quantity' AS col_name, cast(_rows AS BIGINT) AS n_rows,
           cast(_rows - nn2 AS BIGINT) AS n_nulls,
           round((_rows - nn2) * 100.0 / _rows, 2) AS null_pct,
           cast(nd2 AS BIGINT) AS n_distinct,
           mn2 AS min_str, mx2 AS max_str FROM w
    UNION ALL
    SELECT 'l_discount' AS col_name, cast(_rows AS BIGINT) AS n_rows,
           cast(_rows - nn3 AS BIGINT) AS n_nulls,
           round((_rows - nn3) * 100.0 / _rows, 2) AS null_pct,
           cast(nd3 AS BIGINT) AS n_distinct,
           mn3 AS min_str, mx3 AS max_str FROM w
    UNION ALL
    SELECT 'l_returnflag' AS col_name, cast(_rows AS BIGINT) AS n_rows,
           cast(_rows - nn4 AS BIGINT) AS n_nulls,
           round((_rows - nn4) * 100.0 / _rows, 2) AS null_pct,
           cast(nd4 AS BIGINT) AS n_distinct,
           mn4 AS min_str, mx4 AS max_str FROM w
    UNION ALL
    SELECT 'l_shipdate' AS col_name, cast(_rows AS BIGINT) AS n_rows,
           cast(_rows - nn5 AS BIGINT) AS n_nulls,
           round((_rows - nn5) * 100.0 / _rows, 2) AS null_pct,
           cast(nd5 AS BIGINT) AS n_distinct,
           mn5 AS min_str, mx5 AS max_str FROM w
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card stats for lineitem in ONE aggregate pass over the
    table (operators/profile.py): null counts, exact distincts via the
    multi-distinct expand, stringified min/max, unpivoted with stack.
    The naive formulation scans the table once per column."""
    from ..operators.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "lineitem"), _PROFILE_COLS)


@query(
    "scd2_pointintime",
    """
    WITH feed AS (SELECT * FROM events WHERE event_type <> 'purchase'),
    o AS (
        SELECT user_id, ts, event_type, event_id,
               lag(event_type) OVER w AS prev,
               row_number() OVER w AS rn
        FROM feed
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chg AS (
        SELECT user_id, ts, event_type, event_id FROM o
        WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    ),
    hist AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER w2 AS valid_to,
               row_number() OVER w2 AS version
        FROM chg
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p.event_id AS purchase_id,
           h.event_type AS status_at_purchase,
           cast(h.version AS BIGINT) AS status_version
    FROM events p JOIN hist h
      ON p.event_type = 'purchase' AND p.user_id = h.user_id
     AND h.valid_from <= p.ts AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    """,
)
def scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase gets the user's
    status (last non-purchase event type) valid AT its timestamp —
    scd2_collapse composed with the as-of join. Zero-length intervals
    (two changes at one instant) are dropped first, after which the
    SCD2 intervals tile each user's timeline and backward-as-of on
    valid_from is exactly interval membership — one shuffle + window
    instead of the oracle's inequality join."""
    from ..operators.asof import asof_join
    from ..operators.scd import scd2_collapse

    ev = load_table(spark, sf_dir, "events")
    feed = ev.filter(F.col("event_type") != "purchase")
    hist = scd2_collapse(
        feed, key_col="user_id", attr_col="event_type", tiebreak_col="event_id"
    )
    hist = hist.filter(
        F.col("valid_to").isNull() | (F.col("valid_from") != F.col("valid_to"))
    ).select(
        "user_id",
        F.col("valid_from"),
        F.col("event_type").alias("status_at_purchase"),
        F.col("version").alias("status_version"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases, hist, on=["user_id"], left_ts="ts", right_ts="valid_from"
    )
    return joined.filter(F.col("status_at_purchase").isNotNull()).select(
        "purchase_id", "status_at_purchase", "status_version"
    )


@query(
    "price_histogram_equidepth",
    """
    WITH t AS (
        SELECT cast(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    c AS (
        SELECT quantile_cont(cents, 0.25) AS c0,
               quantile_cont(cents, 0.5)  AS c1,
               quantile_cont(cents, 0.75) AS c2
        FROM t
    )
    SELECT cast((cents > c0)::INT + (cents > c1)::INT + (cents > c2)::INT
                AS BIGINT) AS bucket,
           cast(count(*) AS BIGINT) AS n,
           min(cents) AS min_val,
           max(cents) AS max_val
    FROM t, c
    GROUP BY 1
    """,
)
def price_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile-boundary) histogram of order prices in
    integer cents (operators/profile.py:equidepth_histogram): ~equal
    bucket populations under any skew, computed as one percentile
    aggregate + one narrow bucket groupBy — never a global ntile
    sort. Cents keep the interpolated cutoffs bit-identical between
    Spark and DuckDB."""
    from ..operators.profile import equidepth_histogram

    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents")
    )
    return equidepth_histogram(o, "cents", n_buckets=4)


@query(
    "cdc_apply",
    """
    WITH base AS (
        SELECT o_orderkey AS k, o_custkey,
               round(o_totalprice, 2) AS price, o_orderstatus AS status
        FROM orders
    ),
    ch AS (
        SELECT k, 'D' AS op, 1 AS seq, o_custkey, price, status
        FROM base WHERE k % 7 = 0
        UNION ALL
        SELECT k, 'U', 1, o_custkey, round(price + 50, 2), status
        FROM base WHERE k % 7 = 1
        UNION ALL
        SELECT k, 'U', 2, o_custkey, round(price + 100, 2), status
        FROM base WHERE k % 7 = 1
        UNION ALL
        SELECT k + 100000000, 'I', 1, o_custkey, price, status
        FROM base WHERE k % 7 = 2
    ),
    last AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC)
                       AS rn
            FROM ch
        ) WHERE rn = 1
    )
    SELECT coalesce(b.k, c.k) AS k,
           CASE WHEN c.op IS NOT NULL THEN c.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.price
                ELSE b.price END AS price,
           CASE WHEN c.op IS NOT NULL THEN c.status
                ELSE b.status END AS status
    FROM base b FULL OUTER JOIN last c ON b.k = c.k
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def cdc_apply_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as dataflow (operators/cdc.py): a synthetic
    insert/update/delete feed over orders — deletes for k%7=0, two
    competing updates for k%7=1 (the later sequence number must win),
    inserts under fresh keys for k%7=2 — applied with one per-key
    collapse of the feed plus one full-outer join against the base."""
    from ..operators.cdc import apply_cdc

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    m = F.col("k") % 7

    def feed(op, seq, key, price):
        return base.filter(m == {"D": 0, "U": 1, "I": 2}[op]).select(
            key.alias("k"),
            F.lit(op).alias("op"),
            F.lit(seq).cast("int").alias("seq"),
            "o_custkey",
            price.alias("price"),
            "status",
        )

    changes = (
        feed("D", 1, F.col("k"), F.col("price"))
        .unionAll(feed("U", 1, F.col("k"), F.round(F.col("price") + 50, 2)))
        .unionAll(feed("U", 2, F.col("k"), F.round(F.col("price") + 100, 2)))
        .unionAll(feed("I", 1, F.col("k") + 100000000, F.col("price")))
    )
    return apply_cdc(base, changes, key_cols=["k"], seq_col="seq")


@query(
    "revenue_mom_growth",
    """
    WITH m AS (
        SELECT (year(o_orderdate) * 100 + month(o_orderdate)) AS ym,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT cast(ym AS BIGINT) AS ym,
           revenue,
           round(
               CASE WHEN lag(revenue) OVER (ORDER BY ym) IS NULL THEN NULL
                    ELSE (revenue - lag(revenue) OVER (ORDER BY ym))
                         * 100.0 / lag(revenue) OVER (ORDER BY ym)
               END, 2) AS mom_pct
    FROM m
    """,
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the lag window runs over the
    ALREADY-AGGREGATED monthly table (tens of rows), so the global
    (unpartitioned) ordering that would be a scale-killer on raw rows
    is a no-op here — aggregate first, window the aggregate, never
    window the fact."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return m.select(
        "ym",
        "revenue",
        F.round((F.col("revenue") - prev) * 100.0 / prev, 2).alias("mom_pct"),
    )


@query(
    "fuzzy_name_pairs",
    """
    WITH names AS (
        SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
    ),
    blocked AS (
        SELECT name, (string_split(name, ' '))[-1] AS blk FROM names
    )
    SELECT a.name AS name_a, b.name AS name_b,
           cast(levenshtein(a.name, b.name) AS BIGINT) AS distance
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by edit distance <= 2, candidates
    blocked on the final name token (operators/fuzzy.py) — the
    entity-resolution primitive, with levenshtein evaluated JVM-side
    only inside blocks, never across the full n^2."""
    from ..operators.fuzzy import fuzzy_pairs

    return fuzzy_pairs(load_table(spark, sf_dir, "part"), "p_name")


@query(
    "fuzzy_pairs_capped",
    """
    WITH names AS (
        SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
    ),
    blocked AS (
        SELECT name, length(name) AS blk FROM names
    ),
    kept AS (
        SELECT name, blk FROM blocked
        QUALIFY count(*) OVER (PARTITION BY blk) <= 10
    )
    SELECT a.name AS name_a, b.name AS name_b,
           cast(levenshtein(a.name, b.name) AS BIGINT) AS distance
    FROM kept a JOIN kept b
      ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def fuzzy_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-block exclusion guard on blocked fuzzy matching
    (operators/fuzzy.py:fuzzy_pairs(max_block_size=...)) with
    length-band blocking and a cap the sf0.01 distribution STRADDLES
    (distinct-name length blocks are sized 20/16/14/8/4/2; cap 10
    keeps three and excludes three, so both paths execute): the
    capped path folds each surviving block to one bucket row
    (exact-count size filter, within-row pair explode — ONE shuffle,
    no join) and DuckDB mirrors the exclusion with a windowed block
    count. Entity-resolution exclusion semantics: an oversized block
    means the blocking key isn't discriminative there; its members
    leave the comparison space rather than paying block² inside it."""
    from ..operators.fuzzy import fuzzy_pairs

    return fuzzy_pairs(
        load_table(spark, sf_dir, "part"),
        "p_name",
        block_fn=F.length,
        max_block_size=10,
    )


@query(
    "incremental_monthly_agg",
    """
    SELECT cast(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
           cast(count(o_totalprice) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def incremental_monthly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-maintenance equivalence gate: the monthly aggregate
    built by MERGING a pre-1997 snapshot state with the post-1997
    delta's state (operators/incremental.py) must hash-equal the
    oracle's from-scratch aggregate over all orders. Rounding happens
    only at presentation — partials merge raw."""
    from ..operators.incremental import agg_state, merge_states

    o = load_table(spark, sf_dir, "orders").withColumn(
        "ym",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long"),
    )
    prev = agg_state(o.filter(F.col("ym") < 199701), ["ym"], "o_totalprice")
    delta = agg_state(o.filter(F.col("ym") >= 199701), ["ym"], "o_totalprice")
    merged = merge_states(prev, delta, ["ym"])
    return merged.select(
        "ym",
        F.col("n_rows").alias("n_orders"),
        F.round("sum_v", 2).alias("revenue"),
        F.round("min_v", 2).alias("min_price"),
        F.round("max_v", 2).alias("max_price"),
    )


@query(
    "funnel_time_to_convert",
    """
    WITH t AS (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    t2s AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM t
    ),
    t3s AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM t2s
    ),
    u AS (
        SELECT user_id, any_value(t1) AS t1, any_value(t3) AS t3
        FROM t3s GROUP BY user_id
    ),
    d AS (
        SELECT epoch_ms(t3) - epoch_ms(t1) AS ms FROM u
        WHERE t3 IS NOT NULL
    )
    SELECT cast(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(ms, 0.5), 1) AS p50_ms,
           round(quantile_cont(ms, 0.9), 1) AS p90_ms,
           cast(max(ms) AS BIGINT) AS max_ms
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency distribution of the full view->purchase funnel:
    p50/p90/max seconds from first view to ordered purchase, over
    converted users only. Epoch-MILLISECOND diffs (via zone-proof
    epoch_of) sidestep the engines' differing sub-second truncation
    in second-granularity diffs, and integer ms keep quantile_cont /
    percentile interpolation bit-identical; the per-user table
    (funnel_times) is the single-shuffle window chain."""
    from ..functions.scalar import epoch_of

    ev = load_table(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    per_user = funnel_times(ev)
    ms = (
        epoch_of(ts_type, F.col("t3"), "MILLISECOND")
        - epoch_of(ts_type, F.col("t1"), "MILLISECOND")
    ).cast("double")
    d = per_user.filter(F.col("t3").isNotNull()).select(ms.alias("ms"))
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("ms", F.lit(0.5)), 1).alias("p50_ms"),
        F.round(F.percentile("ms", F.lit(0.9)), 1).alias("p90_ms"),
        F.max("ms").cast("long").alias("max_ms"),
    )


@query(
    "purchases_outside_error_windows",
    f"""
    SELECT p.event_id AS purchase_id, cast(epoch_ms(p.ts) AS BIGINT) AS pms
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
          SELECT 1 FROM events e
          WHERE e.event_type = 'error'
            AND epoch_ms(p.ts) >= epoch_ms(e.ts) - {_HALF_WINDOW_MS}
            AND epoch_ms(p.ts) <  epoch_ms(e.ts) + {_HALF_WINDOW_MS}
      )
    """,
)
def purchases_outside_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANTI form of the binned interval join: purchases matching
    NO error window — same bucket-explode equi-join shape, planned as
    left_anti, versus the oracle's NOT EXISTS inequality subquery."""
    from ..functions.scalar import epoch_of
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    ems = epoch_of(ev.schema["ts"].dataType, F.col("ts"), "MILLISECOND")
    errors = ev.filter(F.col("event_type") == "error").select(
        (ems - _HALF_WINDOW_MS).alias("start_ms"),
        (ems + _HALF_WINDOW_MS).alias("end_ms"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), ems.alias("pms")
    )
    return interval_join(
        purchases,
        errors,
        point_ms="pms",
        start_ms="start_ms",
        end_ms="end_ms",
        bucket_width_ms=_HALF_WINDOW_MS,
        how="left_missing",
    )


@query(
    "hourly_anomalies",
    """
    WITH h AS (
        SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
               count(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, hr, n,
               avg(n) OVER w AS mu, stddev_samp(n) OVER w AS sd
        FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr
                            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, cast(hr AS BIGINT) AS hr, cast(n AS BIGINT) AS n,
           round((n - mu) / sd, 2) AS z
    FROM s WHERE sd > 0 AND abs((n - mu) / sd) > 3
    """,
)
def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed z-score anomaly detection: each (event_type, hour)
    count scored against the TRAILING 24 hourly buckets' mean/stddev
    (current bucket excluded — scoring a point against a baseline that
    contains it dilutes the signal), |z| > 3 flagged. Two shuffles
    total (hourly agg, per-type window); the window state is 24 rows
    per type regardless of corpus size — the monitoring query an event
    pipeline runs on itself."""
    from ..functions.scalar import epoch_of

    ev = load_table(spark, sf_dir, "events")
    hr = F.floor(
        epoch_of(ev.schema["ts"].dataType, F.col("ts"), "MILLISECOND")
        / F.lit(3600000)
    ).cast("long")
    h = ev.groupBy(F.col("event_type"), hr.alias("hr")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    s = h.select(
        "event_type",
        "hr",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        s.filter((F.col("sd") > 0) & (F.abs(z) > 3))
        .select(
            "event_type",
            "hr",
            F.col("n").cast("long").alias("n"),
            F.round(z, 2).alias("z"),
        )
    )


@query(
    "session_funnel",
    """
    WITH o AS (
        SELECT user_id, ts, event_type, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM o
    ),
    t AS (
        SELECT user_id, session_no, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER ws AS t1
        FROM s WINDOW ws AS (PARTITION BY user_id, session_no)
    ),
    t2s AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                   OVER (PARTITION BY user_id, session_no) AS t2
        FROM t
    ),
    t3s AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                   OVER (PARTITION BY user_id, session_no) AS t3
        FROM t2s
    ),
    u AS (
        SELECT user_id, session_no, any_value(t1) AS t1, any_value(t2) AS t2,
               any_value(t3) AS t3
        FROM t3s GROUP BY user_id, session_no
    )
    SELECT cast(count(*) AS BIGINT) AS n_sessions,
           cast(count(t1) AS BIGINT) AS n_view,
           cast(count(t2) AS BIGINT) AS n_click,
           cast(count(t3) AS BIGINT) AS n_purchase
    FROM u
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-SESSION funnel: the ordered view->click->purchase chain
    must complete inside one 30-minute-gap session — the strict intent
    metric (the cross-session funnel_conversion counts a purchase days
    after the view). Session assignment is gaps-and-islands (lag +
    running sum) on the same user partitioning the funnel windows then
    extend with session_no; counts are per session, not per user."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w_user)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "ts", "event_type", "event_id").withColumn(
        "session_no",
        F.sum(new_session).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_no")
    s = s.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(ws),
    )
    s = s.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(ws),
    )
    s = s.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(ws),
    )
    per_session = s.groupBy("user_id", "session_no").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count("t1").cast("long").alias("n_view"),
        F.count("t2").cast("long").alias("n_click"),
        F.count("t3").cast("long").alias("n_purchase"),
    )


@query(
    "price_quantity_stats",
    """
    SELECT l_returnflag,
           cast(count(*) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov,
           round(stddev_samp(l_extendedprice), 2) AS price_sd
    FROM lineitem
    GROUP BY 1
    """,
)
def price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per return flag: Pearson correlation,
    sample covariance, and stddev in ONE grouped aggregate — the
    corr/covar family runs map-side-partial like any sum (Spark keeps
    the (n, mean_x, mean_y, co-moment) state per group), so this
    costs exactly one shuffle of 3 small groups, not a join of
    per-measure passes."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_cov"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_sd"),
    )


@query(
    "revenue_trend_slope",
    """
    WITH m AS (
        SELECT (year(o_orderdate) * 12 + month(o_orderdate))::DOUBLE AS mi,
               sum(o_totalprice) AS revenue
        FROM orders GROUP BY 1
    )
    SELECT cast(count(*) AS BIGINT) AS n_months,
           round(regr_slope(revenue, mi), 2) AS slope_per_month,
           round(regr_intercept(revenue, mi), 2) AS intercept,
           round(regr_r2(revenue, mi), 4) AS r2
    FROM m
    """,
)
def revenue_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares revenue trend over month index: slope, intercept
    and R² from the regr_* aggregate family — fitted on the
    pre-aggregated monthly table (tens of rows), never the fact."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("double")
        .alias("mi")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.round(F.regr_slope("revenue", "mi"), 2).alias("slope_per_month"),
        F.round(F.regr_intercept("revenue", "mi"), 2).alias("intercept"),
        F.round(F.regr_r2("revenue", "mi"), 4).alias("r2"),
    )


@query(
    "hopping_event_windows",
    """
    WITH e AS (
        SELECT event_type, epoch_ms(ts) AS ems FROM events
    ),
    w AS (
        SELECT event_type,
               (ems // 900000 - off) * 900000 AS win_start_ms
        FROM e, unnest([0, 1, 2, 3]) AS t(off)
        WHERE (ems // 900000 - off) * 900000 + 3600000 > ems
    )
    SELECT cast(win_start_ms AS BIGINT) AS win_start_ms, event_type,
           cast(count(*) AS BIGINT) AS n
    FROM w GROUP BY 1, 2
    """,
)
def hopping_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) 1-hour windows every 15 minutes: each event
    lands in 4 overlapping windows — Spark's native F.window with a
    slideDuration, the streaming-capable form (same call under
    readStream + watermark). The oracle reconstructs the window set
    with an explicit 4-offset unnest. Window starts surface as epoch
    ms via zone-proof arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.scalar import epoch_of

    ts_type = ev.schema["ts"].dataType
    w = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return w.select(
        epoch_of(ts_type, F.col("w.start"), "MILLISECOND").alias("win_start_ms"),
        "event_type",
        "n",
    )


@query(
    "revenue_cumshare",
    """
    WITH m AS (
        SELECT (year(o_orderdate) * 100 + month(o_orderdate)) AS ym,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    t AS (SELECT sum(rev) AS total FROM m)
    SELECT cast(ym AS BIGINT) AS ym,
           round(rev, 2) AS revenue,
           round(sum(rev) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING)
                 * 100.0 / total, 2) AS cum_share_pct
    FROM m, t
    """,
)
def revenue_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share by month: running sum over the
    pre-aggregated monthly table divided by the broadcast grand total
    — the Pareto/'when did we cross 80%' curve. The global ordering
    touches months, never the fact table."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(F.sum("o_totalprice").alias("rev"))
    total = m.agg(F.sum("rev").alias("total"))
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return m.crossJoin(F.broadcast(total)).select(
        "ym",
        F.round("rev", 2).alias("revenue"),
        F.round(F.sum("rev").over(w) * 100.0 / F.col("total"), 2).alias(
            "cum_share_pct"
        ),
    )


@query(
    "grouping_sets_agg",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           cast(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of rollup/cube
    (already gated): status margins, priority margins, and the grand
    total in ONE aggregate over a single Expand, no self-union of
    three scans. Sentinel 'ALL' stands in for the NULL grouping ids so
    the hash compare is unambiguous."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               cast(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "top_orders_with_ties",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               cast(rank() OVER (
                   PARTITION BY o_custkey
                   ORDER BY round(o_totalprice, 0) DESC) AS BIGINT) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
)
def top_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 orders WITH ties: rank() (gapped) versus the
    already-gated row_number() form — equal rounded prices share a
    rank, so a tie at the boundary returns more than 3 rows. Prices
    round to whole units first so the tie set is engine-independent."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.round("o_totalprice", 0).desc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "priority_order_lists",
    """
    SELECT o_orderpriority,
           cast(count(*) AS BIGINT) AS n,
           string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey)
               AS first_keys
    FROM (
        SELECT o_orderpriority, o_orderkey FROM orders
        WHERE o_orderkey % 997 = 0
    )
    GROUP BY 1
    """,
)
def priority_order_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG): per priority, the sampled order
    keys concatenated in key order — Spark has no ordered string_agg,
    so the deterministic form is array_sort(collect_list(...)) then
    array_join; collect order never leaks into the result."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 997 == 0
    )
    # Sort the LONGS, then stringify — sorting the strings would order
    # "1994" before "997" lexicographically while the oracle orders by
    # the numeric key.
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("first_keys"),
    )
