"""Blocked fuzzy matching: near-identical string pairs by edit
distance WITHOUT the all-pairs cross join — the entity-resolution /
dimension-conformance primitive (dedup "Acme Corp" vs "Acme Corp.",
additive family, SURVEY §2.11).

Scale shape: candidates come from an equi-join on a BLOCKING key (a
cheap canonical projection of the string — last token, soundex-ish
prefix, length band…), so comparison work is Σ block² with blocks
chosen small, never n². The expensive levenshtein() runs only inside
blocks, JVM-side (whole-stage codegen), no UDF. The classic trade:
recall is bounded by the blocking function (a typo IN the blocking
token moves the string to another block) — layer multiple blocking
passes (union of candidates from 2-3 cheap keys) when that matters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(c: Column) -> Column:
    """Default blocking key: the final whitespace token (for
    'modifier noun' style names, the noun)."""
    return F.element_at(F.split(c, " "), -1)


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    max_distance: int = 2,
    block_fn: Callable[[Column], Column] = last_token,
    max_block_size: int | None = None,
) -> DataFrame:
    """(name_a, name_b, distance): distinct values of ``text_col``
    whose edit distance is <= max_distance, candidates blocked by
    ``block_fn``. name_a < name_b canonicalizes the pair.

    ``max_block_size`` is the hot-block guard, with the standard
    entity-resolution EXCLUSION semantics (same contract as
    ``llm.dedup.cap_doc_freq`` / ``plans.quality.cap_basket_size``):
    a block bigger than the cap means the blocking key carries no
    discriminative signal there — comparing everything to everything
    inside it is exactly the n² the blocking exists to avoid — so
    oversized blocks leave the comparison space entirely; re-block
    them with a more discriminative key (prefix, multiple passes)
    when their pairs matter. Plan forms mirror
    ``llm.dedup.ngram_jaccard_pairs``: capped, blocks fold to one
    ``collect_set`` row with the cap as a free ``size() <= cap``
    filter on the exact count and pairs from a within-row double
    explode (ONE shuffle, arrays bounded by the cap); uncapped, the
    classic blocked self-join remains — an unbounded collect would
    trade graceful skew degradation for an OOM-able array."""
    names = (
        df.select(F.col(text_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .withColumn("blk", block_fn(F.col("name")))
        # A null blocking key means "no block": the equi-join form
        # drops such rows implicitly (null never equi-matches), so the
        # capped form must drop them explicitly too — otherwise a
        # custom block_fn returning null would pair all null-keyed
        # rows in one bucket under the cap and none without it.
        .filter(F.col("blk").isNotNull())
    )
    if max_block_size is not None:
        buckets = (
            names.groupBy("blk")
            .agg(F.collect_set("name").alias("ns"))
            .filter(
                (F.size("ns") >= 2) & (F.size("ns") <= max_block_size)
            )
        )
        pairs = (
            buckets.select(F.explode("ns").alias("name_a"), "ns")
            .select("name_a", F.explode("ns").alias("name_b"))
            .filter(F.col("name_a") < F.col("name_b"))
        )
    else:
        a = names.select(F.col("name").alias("name_a"), "blk")
        b = names.select(F.col("name").alias("name_b"), "blk")
        pairs = (
            a.join(b, "blk")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
        )
    return (
        # bounded levenshtein (Spark 3.5+): the DP early-terminates
        # once the distance exceeds the threshold (returns -1), so
        # in-block compares don't pay full O(len_a x len_b) on pairs
        # that blow past the bound in the first rows.
        pairs.withColumn(
            "distance",
            F.levenshtein(
                F.col("name_a"), F.col("name_b"), max_distance
            ).cast("long"),
        )
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select("name_a", "name_b", "distance")
    )
