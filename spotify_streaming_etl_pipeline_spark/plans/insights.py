"""Sketch-based corpus insights and event/fulfillment analytics
(additive family): Count-Min heavy hitters, k-min-hash source
similarity, Markov event transitions, new-vs-returning user splits,
and fulfillment-latency percentiles.

Scale shapes (written for 100 TB, tested at sf0.1):

- ``heavy_hitters_cms``: the Count-Min sketch is built from the
  word-frequency table, not the raw token stream — the (depth × width)
  bucket aggregate is vocabulary-sized, and the sketch itself is a
  fixed ``d·w`` rows no matter the corpus.  Hashes are the portable
  48-bit md5 prefix (`llm/text.py:portable_hash48`) so the DuckDB
  oracle reproduces every bucket exactly.  The exact counts appear in
  the output because that is how you *validate* a sketch (the unit
  test asserts the one-sided error: estimate ≥ truth, always); the
  production path queries the ``d·w``-row sketch alone.
- ``source_similarity_minhash``: per-source k-min-hash signatures
  (k=32) reduce each source's word SET to 32 longs; pairwise Jaccard
  is then estimated on the 20×32 signature table — the corpus is read
  once, and the quadratic part runs on signatures, never documents.
- ``event_transition_matrix``: consecutive-event pairs come from ONE
  ``lag`` window partitioned by user (single shuffle of events),
  totally ordered by (ts, event_id) so the successor is deterministic
  under timestamp ties; the matrix aggregate is |event_types|² rows.
- ``monthly_new_vs_returning``: the per-user first-activity month is
  a min-window over the same user partitioning the activity dedup
  needs — month keys are integer year·12+month arithmetic (no
  timestamp rendering → session-timezone-proof, same discipline as
  behavior.py:cohort_retention).
- ``ship_latency_percentiles``: one fact-fact equi-join on orderkey,
  then per-priority interpolated percentiles of integer day diffs
  (exact binary fractions → reproducible across engines; at 100 TB
  swap ``percentile`` → ``approx_percentile``, same plumbing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llm.text import portable_hash48
from ..sources.catalog import load_table
from .analytics import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_DEPTH = 3
_CMS_WIDTH = 256
# a word is a "heavy hitter" above 1/200 of total token mass
_CMS_FRACTION = 200

_H48_SQL = "('0x' || substring(md5({x}), 1, 12))::BIGINT"


@query(
    "heavy_hitters_cms",
    f"""
    WITH words AS (
      SELECT word, cast(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY 1),
    buckets AS (
      SELECT d,
             {_H48_SQL.format(x="word || '#' || d")} % {_CMS_WIDTH} AS bucket,
             cast(sum(cnt) AS BIGINT) AS bucket_count
      FROM words CROSS JOIN (SELECT unnest([0, 1, 2]) AS d)
      GROUP BY 1, 2),
    total AS (SELECT sum(cnt) AS n_tokens FROM words),
    heavy AS (SELECT word, cnt FROM words CROSS JOIN total
              WHERE cnt * {_CMS_FRACTION} >= n_tokens)
    SELECT word, cnt AS true_count,
           cast(min(bucket_count) AS BIGINT) AS est_count
    FROM (SELECT heavy.word, heavy.cnt, d,
                 {_H48_SQL.format(x="word || '#' || d")} % {_CMS_WIDTH}
                     AS bucket
          FROM heavy CROSS JOIN (SELECT unnest([0, 1, 2]) AS d)) probe
    JOIN buckets USING (d, bucket)
    GROUP BY 1, 2
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Words above 1/{frac} of total token mass with their exact count
    and their Count-Min estimate (min over {d} md5-seeded bucket rows
    of width {w}).  One-sided by construction: est ≥ true."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ds = F.explode(F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])).alias("d")

    def bucket(word_col, d_col):
        return F.pmod(
            portable_hash48(F.concat(word_col, F.lit("#"), d_col.cast("string"))),
            F.lit(_CMS_WIDTH),
        )

    sketch = (
        words.select("word", "cnt", ds)
        .select(F.col("d"), bucket(F.col("word"), F.col("d")).alias("bucket"), "cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("bucket_count"))
    )
    total = words.agg(F.sum("cnt").alias("n_tokens"))
    heavy = words.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * _CMS_FRACTION >= F.col("n_tokens")
    )
    probes = heavy.select("word", "cnt", ds).select(
        "word",
        "cnt",
        F.col("d"),
        bucket(F.col("word"), F.col("d")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("word", F.col("cnt").alias("true_count"))
        .agg(F.min("bucket_count").cast("long").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# k-min-hash source-level Jaccard similarity
# ---------------------------------------------------------------------------

_KMH_K = 32


@query(
    "source_similarity_minhash",
    f"""
    WITH sw AS (
      SELECT DISTINCT source, word
      FROM (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> ''),
    sig AS (
      SELECT source, seed,
             min({_H48_SQL.format(x="word || '@' || seed")}) AS mh
      FROM sw CROSS JOIN
           (SELECT unnest(generate_series(0, {_KMH_K - 1})) AS seed)
      GROUP BY 1, 2)
    SELECT a.source AS source_a, b.source AS source_b,
           round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
                 / {_KMH_K}.0, 4) AS est_jaccard
    FROM sig a JOIN sig b ON a.seed = b.seed AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def source_similarity_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard similarity of the word SETS of every source
    pair, estimated from k=32 min-hash slots per source.  The
    signature table is |sources|·k rows — the pairwise stage never
    touches documents."""
    docs = _t(spark, sf_dir, "documents")
    sw = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(_KMH_K)])
    ).alias("seed")
    sig = (
        sw.select("source", "word", seeds)
        .select(
            "source",
            "seed",
            portable_hash48(
                F.concat("word", F.lit("@"), F.col("seed").cast("string"))
            ).alias("h"),
        )
        .groupBy("source", "seed")
        .agg(F.min("h").alias("mh"))
    )
    a = sig.select(
        F.col("source").alias("source_a"), "seed", F.col("mh").alias("mha")
    )
    b = sig.select(
        F.col("source").alias("source_b"), "seed", F.col("mh").alias("mhb")
    )
    return (
        a.join(b, "seed")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("mha") == F.col("mhb"), 1).otherwise(0)
                )
                / float(_KMH_K),
                4,
            ).alias("est_jaccard")
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events)
    SELECT from_type, to_type,
           cast(count(*) AS BIGINT) AS n,
           round(count(*) / sum(count(*))
                 OVER (PARTITION BY from_type), 4) AS prob
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, count, row-normalized probability) over
    consecutive events per user.  One shuffle (the user-partitioned
    lead window, totally ordered by (ts, event_id) so ties are
    deterministic); the matrix itself is |event_types|² rows, and the
    row normalization windows over that tiny aggregate, not events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 4).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Monthly new-vs-returning user split
# ---------------------------------------------------------------------------


@query(
    "monthly_new_vs_returning",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             cast(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS mk
      FROM events),
    firsts AS (
      SELECT user_id, mk, min(mk) OVER (PARTITION BY user_id) AS first_mk
      FROM act)
    SELECT cast(mk // 12 * 100 + (mk % 12) + 1 AS BIGINT) AS ym,
           cast(count(*) AS BIGINT) AS n_users,
           cast(count(CASE WHEN mk = first_mk THEN 1 END) AS BIGINT)
               AS n_new,
           cast(count(CASE WHEN mk > first_mk THEN 1 END) AS BIGINT)
               AS n_returning
    FROM firsts GROUP BY 1
    """,
)
def monthly_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per month: active users split into first-ever-active (new) vs
    seen-before (returning).  Month keys are integer year·12+month
    arithmetic (timezone-proof); the first-activity month rides the
    same user-partitioned window the activity dedup shuffles for, so
    events shuffle once."""
    ev = _t(spark, sf_dir, "events")
    mk = (F.year("ts") * 12 + F.month("ts") - 1).cast("long")
    act = ev.select(F.col("user_id"), mk.alias("mk")).distinct()
    act = act.withColumn(
        "first_mk", F.min("mk").over(Window.partitionBy("user_id"))
    )
    return act.groupBy(
        (F.floor(F.col("mk") / 12) * 100 + F.pmod(F.col("mk"), 12) + 1)
        .cast("long")
        .alias("ym")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count(F.when(F.col("mk") == F.col("first_mk"), 1))
        .cast("long")
        .alias("n_new"),
        F.count(F.when(F.col("mk") > F.col("first_mk"), 1))
        .cast("long")
        .alias("n_returning"),
    )


# ---------------------------------------------------------------------------
# Fulfillment-latency percentiles per order priority
# ---------------------------------------------------------------------------


@query(
    "ship_latency_percentiles",
    """
    WITH lat AS (
      SELECT o_orderpriority,
             date_diff('day', o_orderdate, l_shipdate) AS days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority,
           cast(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(days, 0.25), 2) AS p25,
           round(quantile_cont(days, 0.50), 2) AS p50,
           round(quantile_cont(days, 0.75), 2) AS p75,
           round(quantile_cont(days, 0.90), 2) AS p90
    FROM lat GROUP BY 1
    """,
)
def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class: one
    orderkey equi-join, one grouped interpolated-percentile aggregate
    over integer day diffs (exact binary fractions, reproducible).
    At 100 TB the exact percentile swaps for ``approx_percentile``."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("days"),
    )
    agg = lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.expr(
            "percentile(days, array(0.25, 0.5, 0.75, 0.9))"
        ).alias("q"),
    )
    return agg.select(
        "o_orderpriority",
        "n_lines",
        *[
            F.round(F.col("q").getItem(i), 2).alias(p)
            for i, p in enumerate(("p25", "p50", "p75", "p90"))
        ],
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-grain time rollup (one Expand)
# ---------------------------------------------------------------------------


@query(
    "multi_grain_rollup",
    """
    WITH t AS (
      SELECT cast(year(ts) AS BIGINT) AS y,
             cast(month(ts) AS BIGINT) AS m,
             cast(day(ts) AS BIGINT) AS d,
             value
      FROM events)
    SELECT y, coalesce(m, -1) AS m, coalesce(d, -1) AS d,
           cast(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM t GROUP BY GROUPING SETS ((y), (y, m), (y, m, d))
    """,
)
def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day, month, and year rollups of the event stream in ONE
    aggregate — the continuous-aggregate ladder a hypertable keeps
    (TimescaleDB's caggs, Druid's rollup), expressed as GROUPING SETS
    over extracted date parts: a single Expand feeds one shuffle, not
    three scans unioned.  Sentinel -1 stands in for the coarser
    grains' NULLs so the hash compare is unambiguous.  At scale the
    day grain is what you materialize incrementally
    (`operators/incremental.py`); month/year derive from it by the
    same mergeable-state algebra."""
    ev = _t(spark, sf_dir, "events")
    ev.select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    ).createOrReplaceTempView("_mgr_events")
    return spark.sql(
        """
        SELECT y, coalesce(m, -1) AS m, coalesce(d, -1) AS d,
               cast(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS sum_value
        FROM _mgr_events GROUP BY GROUPING SETS ((y), (y, m), (y, m, d))
        """
    )


# ---------------------------------------------------------------------------
# VARIANT-typed semi-structured extraction (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "props_variant_stats",
    """
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n,
           cast(sum((props::JSON ->> 'k')::BIGINT) AS BIGINT) AS sum_k,
           cast(min((props::JSON ->> 'k')::BIGINT) AS BIGINT) AS min_k,
           cast(max((props::JSON ->> 'k')::BIGINT) AS BIGINT) AS max_k,
           cast(count(CASE WHEN (props::JSON ->> 'k')::BIGINT >= 50
                           THEN 1 END) AS BIGINT) AS n_k_ge_50
    FROM events GROUP BY 1
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``props`` payload via
    Spark 4's VARIANT type (``parse_json`` once, then binary-encoded
    ``variant_get`` paths) — the modern replacement for repeated
    ``get_json_object`` string re-parsing (which re-tokenizes the JSON
    text per extraction; VARIANT parses once per row and each path is
    an O(log fields) binary lookup).  The aggregate itself is an
    ordinary map-side-combined groupBy; at 100 TB you'd persist the
    VARIANT column in the table (Parquet shredding) so the parse cost
    disappears from the query entirely."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count(F.when(F.col("k") >= 50, 1)).cast("long").alias("n_k_ge_50"),
    )


# ---------------------------------------------------------------------------
# Official melt/unpivot API (long-form measure table)
# ---------------------------------------------------------------------------


@query(
    "yearly_measures_long",
    """
    WITH y AS (
      SELECT cast(year(o_orderdate) AS BIGINT) AS year,
             round(sum(o_totalprice), 2) AS revenue,
             cast(count(*) AS BIGINT)::DOUBLE AS n_orders,
             cast(count(DISTINCT o_custkey) AS BIGINT)::DOUBLE AS n_customers
      FROM orders GROUP BY 1)
    SELECT year, measure, value FROM y
    UNPIVOT (value FOR measure IN (revenue, n_orders, n_customers))
    """,
)
def yearly_measures_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide yearly KPI table melted to (year, measure, value) long
    form — what every BI/metrics-store export wants — via the official
    ``DataFrame.unpivot`` (one Expand over the already-tiny aggregate,
    not a UNION of three re-aggregations; counts cast to double since
    long form forces one value type).  The DuckDB oracle uses its
    native UNPIVOT, so both engines' melt semantics are certified
    against each other."""
    o = _t(spark, sf_dir, "orders")
    y = o.groupBy(
        F.year("o_orderdate").cast("long").alias("year")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return y.unpivot(
        ["year"],
        ["revenue", "n_orders", "n_customers"],
        "measure",
        "value",
    )


# ---------------------------------------------------------------------------
# Seasonality index (month-of-year profile)
# ---------------------------------------------------------------------------


@query(
    "seasonality_profile",
    """
    WITH m AS (
      SELECT cast(year(o_orderdate) AS BIGINT) AS y,
             cast(month(o_orderdate) AS BIGINT) AS moy,
             sum(cast(round(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1, 2),
    prof AS (
      SELECT moy, sum(rev_c) AS sum_c, cast(count(*) AS BIGINT) AS n_years
      FROM m GROUP BY 1),
    base AS (SELECT sum(sum_c) AS total_c,
                    sum(n_years) AS total_rows FROM prof)
    SELECT moy AS month_of_year, n_years,
           cast(sum_c // n_years AS BIGINT) AS avg_revenue_cents,
           round((sum_c::DOUBLE / n_years)
                 / (total_c::DOUBLE / total_rows), 4) AS seasonal_index
    FROM prof CROSS JOIN base
    """,
)
def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index: each calendar month's average
    monthly revenue over the years it appears in, normalized by the
    across-months mean (index > 1 = seasonally strong month).  Two
    tiny aggregates stacked on the monthly rollup — the classic
    decomposition input, and the broadcastable denominator pattern
    (one-row cross join) yet again instead of a second scan."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("moy"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "rev_c"
        )
    )
    prof = m.groupBy("moy").agg(
        F.sum("rev_c").alias("sum_c"),
        F.count(F.lit(1)).cast("long").alias("n_years"),
    )
    base = prof.agg(
        F.sum("sum_c").alias("total_c"),
        F.sum("n_years").alias("total_rows"),
    )
    return prof.crossJoin(F.broadcast(base)).select(
        F.col("moy").alias("month_of_year"),
        "n_years",
        F.expr("sum_c div n_years").cast("long").alias(
            "avg_revenue_cents"
        ),
        F.round(
            (F.col("sum_c").cast("double") / F.col("n_years"))
            / (F.col("total_c").cast("double") / F.col("total_rows")),
            4,
        ).alias("seasonal_index"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensics
# ---------------------------------------------------------------------------


@query(
    "benford_digit_profile",
    """
    WITH d AS (
      SELECT cast(substring(cast(cast(floor(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, cast(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, n,
           round(n * 100.0 / total, 2) AS observed_pct,
           round(log10(1.0 + 1.0 / digit) * 100, 2) AS benford_pct
    FROM c CROSS JOIN t
    """,
)
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    Benford's law — the standard forensic screen for fabricated
    monetary data.  Digit extraction is string-head-of-integer (exact,
    no float log tricks in the grouping key); only the EXPECTED curve
    uses log10, identically computed by both engines.  One scan, a
    9-row aggregate, a one-row total cross join."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") * 100.0 / F.col("total"), 2).alias(
            "observed_pct"
        ),
        F.round(
            F.log10(1.0 + 1.0 / F.col("digit")) * 100, 2
        ).alias("benford_pct"),
    )


# ---------------------------------------------------------------------------
# Revenue-concentration Gini coefficient (exact integer arithmetic)
# ---------------------------------------------------------------------------


@query(
    "gini_customer_revenue",
    """
    WITH c AS (
      SELECT o_custkey,
             sum(cast(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    r AS (
      SELECT cents,
             cast(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT)
                 AS i
      FROM c),
    s AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(cents) AS BIGINT) AS total,
                 cast(sum(i * cents) AS BIGINT) AS weighted
          FROM r)
    SELECT n AS n_customers, total AS total_cents,
           round(2.0 * weighted / (n * 1.0 * total)
                 - (n + 1.0) / n, 4) AS gini
    FROM s
    """,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    one-number answer to "how head-heavy is this customer base", via
    the rank-weighted closed form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
    ascending-sorted integer cents.  Every sum is exact integer
    arithmetic (rank ties broken by custkey, so the rank assignment is
    cross-engine deterministic even for equal revenues); only the
    final closed-form division touches floats.  The global sort ranks
    the CUSTOMER aggregate, not orders — at 100 TB that table is
    shuffle-sized, and `approx_percentile`-based Lorenz binning is the
    documented swap if even that sort ever hurts."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("cents")
    )
    r = c.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("i"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("weighted"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        F.round(
            2.0 * F.col("weighted") / (F.col("n") * 1.0 * F.col("total"))
            - (F.col("n") + 1.0) / F.col("n"),
            4,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (tokenizer / corpus naturalness check)
# ---------------------------------------------------------------------------


@query(
    "zipf_slope",
    """
    WITH words AS (
      SELECT word, cast(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY 1),
    ranked AS (
      SELECT freq,
             cast(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT)
                 AS rnk
      FROM words)
    SELECT cast(count(*) AS BIGINT) AS n_words,
           round(regr_slope(ln(freq), ln(rnk)), 3) AS slope,
           round(regr_r2(ln(freq), ln(rnk)), 3) AS r2
    FROM ranked
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of the log-log rank-frequency curve — a
    natural-language corpus sits near −1 (Zipf's law); synthetic or
    templated text drifts toward 0, making this a cheap corpus
    naturalness screen.  Ranks order by (freq desc, word) so the
    regression inputs are cross-engine deterministic; `regr_slope`/
    `regr_r2` aggregate map-side over the vocabulary-sized table
    (ln determinism precedent: `lm_quality_scores`)."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    ranked = words.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), F.col("word")))
        .cast("long")
        .alias("rnk"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.round(
            F.expr("regr_slope(ln(freq), ln(rnk))"), 3
        ).alias("slope"),
        F.round(F.expr("regr_r2(ln(freq), ln(rnk))"), 3).alias("r2"),
    )
