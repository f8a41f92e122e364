"""One-pass table profiler: per-column null rate, distinct count,
min/max — the data-card / quality-report stats a training-data
pipeline publishes next to every snapshot (additive family, SURVEY
§2.11).

Scale shape: ALL columns profile in ONE aggregate pass over the table
(a single global agg with partial/map-side combine), then the 1-row
wide result is unpivoted driver-free with ``stack`` — versus the naive
per-column loop that scans the table once per column. countDistinct
per column plans through Spark's expand (rows × profiled-columns
before partial aggregation), which is the standard price of exact
multi-distinct; swap in approx_count_distinct per column for the
sketch-based one at lake scale (same plan minus the expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, null_pct, n_distinct, min_str,
    max_str): one metric row per profiled column.

    min/max surface as strings so heterogeneous column types fit one
    output schema (the profile is a report, not an input to further
    math). ``exact_distinct=False`` switches to HLL sketches
    (approx_count_distinct), the 100 TB default."""
    cols = columns or df.columns
    distinct_of = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    # TWO aggregates, crossJoined as 1-row frames, NOT one combined
    # agg: mixing the multi-countDistinct expand with string-buffered
    # min/max forces SortAggregate over the (rows × n_cols)-expanded
    # stream — measured 8.2 s at sf0.1. Split, both sides stay
    # HashAggregate and the pair runs in ~1 s; the extra column-pruned
    # scan is bandwidth-cheap at any scale, a sort of expanded data is
    # not.
    # Backtick-quoted resolution gets the EXACT column name — a bare
    # string through F.count("a.b") parses the dot as a struct access.
    def xc(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(xc(c)).alias(f"_nn_{c}"),  # count(col) skips nulls
            F.min(xc(c)).cast("string").alias(f"_mn_{c}"),
            F.max(xc(c)).cast("string").alias(f"_mx_{c}"),
        ]
    dist = df.agg(*[distinct_of(xc(c)).alias(f"_nd_{c}") for c in cols])
    wide = df.agg(*aggs).crossJoin(F.broadcast(dist))
    # stack(n, lit(name), metrics..., ...) unpivots the 1-row frame.
    # Generated identifiers are backtick-quoted (and the name literal
    # quote-escaped): columns with spaces/dots/hyphens/quotes must
    # profile, not crash the expr parser.
    def bq(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    parts = []
    for c in cols:
        lit_name = c.replace("\\", "\\\\").replace("'", "\\'")
        parts += [
            f"'{lit_name}'",
            bq(f"_nn_{c}"),
            bq(f"_nd_{c}"),
            bq(f"_mn_{c}"),
            bq(f"_mx_{c}"),
        ]
    stacked = wide.select(
        F.col("_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "AS (col_name, _nn, n_distinct, min_str, max_str)"
        ),
    )
    return stacked.select(
        F.col("col_name"),
        F.col("_rows").cast("long").alias("n_rows"),
        (F.col("_rows") - F.col("_nn")).cast("long").alias("n_nulls"),
        F.round((F.col("_rows") - F.col("_nn")) * 100.0 / F.col("_rows"), 2).alias(
            "null_pct"
        ),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str",
        "max_str",
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    exact: bool = True,
) -> DataFrame:
    """(bucket, n, min_val, max_val): equi-depth histogram — bucket
    boundaries at the value's own quantiles, so every bucket holds
    ~equal row counts however skewed the distribution (the histogram
    a cost optimizer or data card wants; equi-WIDTH buckets collapse
    under skew).

    Two passes, no global sort: one aggregate computes the n-1
    interior cutoffs (exact interpolated percentile, or t-digest
    ``approx_percentile`` when ``exact=False`` — the 100 TB default),
    then a narrow CASE assigns buckets and a groupBy counts them.
    The naive ``ntile`` formulation globally sorts the table through
    ONE task; this shape never does.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # NULLs are excluded: percentile ignores them for the cutoffs, so
    # counting them in a bucket (they'd land in a spurious bucket=NULL
    # row via three-valued comparisons) would break depth accounting.
    df = df.filter(F.col(value_col).isNotNull())
    if n_buckets == 1:
        return df.groupBy(F.lit(0).cast("long").alias("bucket")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    pfn = F.percentile if exact else F.approx_percentile
    cuts_row = df.agg(
        *[
            pfn(F.col(value_col), F.lit(q)).alias(f"c{i}")
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    cuts = [cuts_row[f"c{i}"] for i in range(len(qs))]
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col(value_col) > F.lit(c)).cast("int")
    return (
        df.groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
    )
