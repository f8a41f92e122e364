"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-way star join
    with grouped measures (SURVEY §2.3 J1 / §2.4 A1)."""
    from spotify_streaming_etl_pipeline_spark.plans import analytics

    return analytics.star_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    LLM-data-pipeline operators (dedup / similarity / text analysis /
    multimodal) and parity promotions. Importing the plan modules
    registers them into the shared QUERIES/ORACLE dicts."""
    from spotify_streaming_etl_pipeline_spark.plans import (  # noqa: F401
        analytics,
        extras,
        llm_queries,
    )

    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (same column aliases)."""
    from spotify_streaming_etl_pipeline_spark.plans import (  # noqa: F401
        analytics,
        extras,
        llm_queries,
    )

    return dict(analytics.ORACLE)
