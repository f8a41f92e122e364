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
) -> float | None:
    """Exact interpolated percentile of the score distribution, or
    None when the distribution is empty (no rows, or all scores NULL)
    — an empty partition/day must not crash the caller.
    (Scale path: F.approx_percentile — one pass, mergeable sketch.)"""
    row = scored.agg(
        F.percentile(F.col(score_col), F.lit(quantile)).alias("q")
    ).collect()[0]
    return float(row["q"]) if row["q"] is not None else None


def quality_filter(
    scored: DataFrame,
    score_col: str = "quality_score",
    quantile: float = 0.25,
) -> DataFrame:
    """Keep documents at or above the ``quantile`` cutoff of the score
    distribution (ties at the cutoff are kept on both engines).  An
    empty/all-NULL score distribution certifies nothing: the result is
    empty, not a crash."""
    cut = quality_cutoff(scored, score_col, quantile)
    if cut is None:
        return scored.filter(F.lit(False))
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


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    target_total: int | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-scaled source mixing — the standard multilingual /
    multi-domain LLM recipe: sampling weight w_i ∝ n_i^alpha, so
    alpha=1 preserves natural proportions and alpha→0 approaches
    uniform-over-sources, boosting small sources without hand-tuning
    a rate per source (`mix_sources` is the manual-rates sibling).

    Take rate per source (in basis points, deterministic by id hash):
    r_i = min(10000, floor(T * w_i / n_i * 10000)) with T =
    ``target_total`` (default: the current total, pure reallocation).
    A filter can only DOWN-sample — small sources whose temperature
    share exceeds their size cap at 100% (rate 10000); training-time
    epoch repetition handles genuine upsampling, not row duplication
    here (duplicated rows would re-enter dedup and skew token counts).

    Plan shape: per-source counts are one map-side-combined
    aggregation; the weight normalization runs as a window over the
    TINY stats table (one row per source — single-partition by
    construction, never over data rows); rates broadcast-join back;
    the keep decision is a narrow hash filter. No data-row shuffle
    anywhere."""
    from pyspark.sql import Window

    stats = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    total = (
        F.lit(target_total)
        if target_total is not None
        else F.sum("n").over(wall)
    )
    rates = (
        stats.withColumn("pw", F.pow(F.col("n"), F.lit(alpha)))
        .withColumn(
            "rate_bp",
            F.least(
                F.lit(10000),
                F.floor(
                    total
                    * (F.col("pw") / F.sum("pw").over(wall))
                    / F.col("n")
                    * 10000
                ),
            ),
        )
        .select(source_col, "rate_bp")
    )
    keep = (
        F.pmod(
            portable_hash48(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ),
            F.lit(10000),
        )
        < F.col("rate_bp")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(keep)
        .drop("rate_bp")
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split",
    cuts: tuple[tuple[str, int], ...] = (("train", 90), ("val", 95), ("test", 100)),
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash48(seed:id)
    mod 100, split by cumulative percentage cutoffs (cuts must ascend
    and end at 100).

    Properties a random split lacks, and the reasons every large corpus
    splits this way: a document's split never changes as the corpus
    grows (membership depends only on its own id), re-runs and task
    retries agree, and no shuffle happens — the assignment is a narrow
    projection, so it pushes down past scans and costs nothing at
    100 TB. Changing ``seed`` re-deals the split without touching data."""
    bucket = F.pmod(
        portable_hash48(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        ),
        F.lit(100),
    )
    expr = None
    for name, cut in cuts:
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def cluster_aware_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    seed: str = "split",
    cuts: tuple[tuple[str, int], ...] = (("train", 90), ("val", 95), ("test", 100)),
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every member of a
    near-dup cluster follows its CLUSTER representative's split, so
    near-duplicates can never straddle train and test — the standard
    eval-contamination guard a per-document split silently violates
    (a verbatim copy of a test document lands in train with
    probability train_pct). ``clusters`` is a (doc_id, cluster_id)
    table from ``dedup.dup_clusters`` (any detector); documents
    outside every cluster are their own singleton group, preserving
    ``dataset_split``'s growth-stability and split fractions.

    Plan: one left join against the cluster table — hinted
    shuffle_hash, because the clustered-doc set grows with the corpus
    and an auto-broadcast of a corpus-fraction table is the exact
    failure PLANS.md documents from the sf10 funnel — then the same
    narrow hash-bucket projection as ``dataset_split``.  Only
    (doc_id, cluster_id) is taken from ``clusters``, so extra columns
    on the cluster table can neither leak into nor collide with the
    output schema, and a pre-existing ``cluster_id`` column on ``df``
    passes through untouched."""
    cl = clusters.select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("_cl_gid")
    )
    joined = df.join(cl.hint("shuffle_hash"), id_col, "left").withColumn(
        "_gid", F.coalesce(F.col("_cl_gid"), F.col(id_col))
    )
    return dataset_split(joined, id_col="_gid", seed=seed, cuts=cuts).drop(
        "_gid", "_cl_gid"
    )


def source_quota_sample(
    df: DataFrame,
    quota: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "quota",
) -> DataFrame:
    """Cap every source at ``quota`` documents, chosen deterministically:
    rank docs within each source by the portable hash of their id (a
    reproducible stand-in for a uniform draw) and keep the first
    ``quota``. The balancing stage that stops one crawl dump from
    dominating a mix.

    Scale shape: one shuffle on source + per-group window. A source's
    group must fit a task's window state; for planet-hot sources
    (single source >> one task) pre-filter with ``keep_expr`` at an
    estimated rate, then apply the exact window on the survivors."""
    from pyspark.sql import Window

    h = portable_hash48(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff for dataset versioning: which documents were
    added, removed, or changed between two corpus snapshots — the audit
    table every reproducible training run records next to its data.

    Shape for 100 TB: each side reduces to (id, content-hash48) BEFORE
    the full-outer join, so document text never enters the shuffle —
    the join moves 16-byte rows. Unchanged docs are dropped from the
    output (churn-sized, not corpus-sized). Output: (id, status in
    added|removed|changed, old_hash, new_hash)."""
    # Presence is tracked by explicit flags, NOT by hash nullity: a doc
    # whose text is NULL hashes to NULL, and inferring presence from
    # the hash would misreport it as added/removed while it exists on
    # both sides.  "changed" uses null-safe inequality for the same
    # reason (NULL -> 'x' IS a change; NULL -> NULL is not).
    oh = old.select(
        F.col(id_col),
        portable_hash48(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("_in_old"),
    )
    nh = new.select(
        F.col(id_col),
        portable_hash48(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("_in_new"),
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed")
        )
    )
    return (
        oh.join(nh, id_col, "full_outer")
        .withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .drop("_in_old", "_in_new")
    )


def weighted_sample(
    df: DataFrame,
    rate_pct: Column,
    id_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability ``rate_pct``/100 where the rate is a per-row COLUMN
    (typically a quality score mapped to [0, 100]) — high-quality
    documents survive at higher rates, junk is thinned, nothing is
    random. Same hash-threshold mechanism as ``mix_sources`` (uniform
    48-bit hash of seed:id), so the decision is reproducible across
    runs, retries, and engines, and composes with the other
    deterministic samplers: seeds namespace the hash, so applying
    quota sampling and weighted sampling to the same corpus draws
    independent "randomness"."""
    h = F.pmod(
        portable_hash48(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        ),
        F.lit(100),
    )
    return df.filter(h < rate_pct)


def curriculum_order(
    df: DataFrame,
    score_col: str = "quality_score",
    n_buckets: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic curriculum ordering for training: input columns
    plus (bucket, position) — ``bucket`` the score band (scores in
    [0, 1] threshold-bucketed, highest-quality band first: bucket 0 =
    easiest/cleanest, the curriculum-learning convention), ``position``
    the document's 0-based rank WITHIN its bucket under the portable
    hash of its id (a deterministic shuffle — training order must not
    correlate with ingest order, and reruns must produce the same
    epoch).  Global training order = (bucket, position).

    Threshold bucketing, not quantile bucketing, on purpose: quantile
    edges are a whole-corpus action (and drift as the corpus grows),
    where thresholds are narrow arithmetic both engines replay
    exactly; feed pre-normalized scores.  The rank window partitions
    by BUCKET — n_buckets-way parallel, each partition sorting only
    its band's (hash, id) pairs — never a single global sort.  At
    shard scale, compose with ``shard_assignments`` downstream."""
    from pyspark.sql import Window

    score = F.coalesce(F.col(score_col), F.lit(0.0))
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0), F.floor((1.0 - score) * n_buckets).cast("int")
        ),
    )
    salt = portable_hash48(F.col(id_col).cast("string"))
    w = Window.partitionBy("bucket").orderBy("_salt", id_col)
    return (
        df.withColumn("bucket", bucket)
        .withColumn("_salt", salt)
        .withColumn(
            "position", (F.row_number().over(w) - 1).cast("long")
        )
        .drop("_salt")
    )
