"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The driver caps each run at ~50 query pairs and walks the dict in
insertion order, so ordering here controls which pairs get a
correctness row each round.  ``_verification_order`` sorts the
registry by driver-verification history (never-green first, then
stalest-green ascending), so every declared pair cycles through the
cap within ceil(registry/50) rounds (~4 at the current size) without
manual curation; between driver visits, the full registry is
execution-verified locally every round by
``tests/test_oracle_parity.py`` — see COVERAGE.md.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-way star join
    with grouped measures (SURVEY §2.3 J1 / §2.4 A1)."""
    from spotify_streaming_etl_pipeline_spark.plans import analytics

    return analytics.star_join(spark, "/root/testdata/sf0.001")


def _last_green_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r{N}.json has all three
    match flags true.  Missing/empty files degrade to {} (registration
    order then wins)."""
    out: dict[str, int] = {}
    here = Path(__file__).resolve().parent
    for path in sorted(here.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _verification_order(d: dict) -> dict:
    """Reorder so never-driver-verified pairs come first, then pairs
    whose last green round is oldest (their substrate may have changed
    since), then the long-green tail.  Ties keep registration order."""
    last_green = _last_green_round()
    reg_index = {name: i for i, name in enumerate(d)}
    names = sorted(d, key=lambda n: (last_green.get(n, -1), reg_index[n]))
    return {n: d[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    LLM-data-pipeline operators (dedup / similarity / text analysis /
    multimodal) and parity promotions. Importing the plan modules
    registers them into the shared QUERIES/ORACLE dicts."""
    from spotify_streaming_etl_pipeline_spark.plans import (  # noqa: F401
        analytics,
        behavior,
        extras,
        insights,
        llm_ann_gates,
        llm_corpus_gates,
        llm_dedup_gates,
        llm_evals,
        llm_line_gates,
        llm_media_gates,
        llm_text_gates,
        quality,
        vectors_qa,
    )

    return _verification_order(dict(analytics.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (same column aliases)."""
    from spotify_streaming_etl_pipeline_spark.plans import (  # noqa: F401
        analytics,
        behavior,
        extras,
        insights,
        llm_ann_gates,
        llm_corpus_gates,
        llm_dedup_gates,
        llm_evals,
        llm_line_gates,
        llm_media_gates,
        llm_text_gates,
        quality,
        vectors_qa,
    )

    return _verification_order(dict(analytics.ORACLE))
