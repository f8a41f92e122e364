"""Corpus curation: quality-threshold filtering and deterministic
source mixing — the selection stage of a training-data pipeline.

- ``quality_filter``: drop the bottom quantile by a quality score.
  The cutoff is one exact interpolated percentile (a single
  aggregate); the filter is then a plain pushdown-able predicate. At
  100 TB swap ``percentile`` for ``approx_percentile`` (t-digest,
  one pass, no sort) — same plan shape, noted below.
- ``mix_sources``: down/up-weight sources to target proportions
  WITHOUT randomness: a document is kept iff the portable hash of its
  id lands under the source's keep-rate in [0,100). Deterministic =>
  reproducible mixes, stable across retries, and oracle-checkable;
  statistically equivalent to seeded Bernoulli sampling because the
  48-bit hash is uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash48


def quality_cutoff(
    scored: DataFrame, score_col: str = "quality_score", quantile: float = 0.25
) -> float:
    """Exact interpolated percentile of the score distribution.
    (Scale path: F.approx_percentile — one pass, mergeable sketch.)"""
    row = scored.agg(
        F.percentile(F.col(score_col), F.lit(quantile)).alias("q")
    ).collect()[0]
    return float(row["q"])


def quality_filter(
    scored: DataFrame,
    score_col: str = "quality_score",
    quantile: float = 0.25,
) -> DataFrame:
    """Keep documents at or above the ``quantile`` cutoff of the score
    distribution (ties at the cutoff are kept on both engines)."""
    cut = quality_cutoff(scored, score_col, quantile)
    return scored.filter(F.col(score_col) >= F.lit(cut))


def keep_expr(id_col: Column, rate_pct: Column) -> Column:
    """Deterministic keep/drop: hash48(id) mod 100 < rate_pct."""
    return F.pmod(portable_hash48(id_col.cast("string")), F.lit(100)) < rate_pct


def mix_sources(
    df: DataFrame,
    rates_pct: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    default_pct: int = 100,
) -> DataFrame:
    """Subsample each source to ~rate_pct% deterministically by id
    hash. A source absent from ``rates_pct`` keeps ``default_pct``%."""
    rate = F.lit(default_pct)
    for src, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(source_col) == src, F.lit(pct)).otherwise(rate)
    return df.filter(keep_expr(F.col(id_col), rate))
