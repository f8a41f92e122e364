"""SparkSession factory.

Defaults are chosen for correctness parity with the reference engine
(PostgreSQL) and for scale-out behavior:

- ``spark.sql.session.timeZone=UTC``: the reference stores UTC instants
  and converts to Europe/Moscow wall-clock explicitly
  (reference scripts/etl/transformer.py:279); pinning the session zone
  makes ``from_utc_timestamp`` the only tz authority.
- ANSI mode off: the reference relies on Postgres NULL-on-missing /
  ``NULLIF`` guards rather than hard errors; non-ANSI Spark gives the
  same null-propagating semantics (we still guard divisions).
- AQE on (coalesce partitions + skew join): the runtime re-planner is
  what makes a fixed shuffle-partition count survive 100x data growth.
- Auto-broadcast threshold raised: every dimension in this engine is
  tiny relative to facts; broadcast-hash-join is the intended physical
  plan for all star joins (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spotify-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster the master/memory come from spark-submit; locally
    we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Whole-stage codegen emits one Janino class per stage; a
        # many-query workload (48-query bench, long-lived warehouse
        # session) churns hundreds of them and fills HotSpot's default
        # 240 MB code cache, after which the JIT stops compiling and
        # every operator drops to the interpreter (~2-4x suite-wide
        # slowdown, measured: 66s -> 46s at sf0.1). Applied at JVM
        # launch; inert via getOrCreate on an already-running session.
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.executor.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        # ContextCleaner frees shuffle files / broadcasts / map-output
        # state only when the driver JVM garbage-collects the Python-side
        # dropped references; the default periodic-GC interval (30min)
        # never fires inside a shorter many-query session, so state from
        # every past query accumulates and each new shuffle pays for it
        # (measured ~+0.25s/query by query 50 of a bench run). A
        # long-lived warehouse session is exactly the 100 TB posture.
        # 5min, not 1min: each full GC also unloads generated codegen
        # classes, so too-frequent GC makes long iterative queries
        # (connected-components loop) recompile mid-run.
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.ui.enabled", "false")
    )
    if not os.environ.get("SPARK_MASTER"):  # cluster submit sets its own master
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
