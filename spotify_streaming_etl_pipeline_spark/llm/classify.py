"""Model-based document scoring at corpus scale: hashed linear
(fastText-style) classifier inference and DSIR-style importance
weights — the two model-in-the-loop curation passes every pretraining
pipeline runs over its full corpus (quality classification à la
GPT-3/LLaMA WebText filters; Data Selection via Importance Resampling,
Xie et al. 2023, arXiv:2302.03169).

Both are pure relational plans: explode tokens -> 48-bit portable
hash -> bucket -> join a model-sized table -> per-doc aggregate.  The
model table (classifier weights / per-bucket log-ratios) is
n_buckets rows — BROADCAST-sized by construction (a 2^20-bucket model
is ~16 MB), so inference over 100 TB of text is one narrow pass plus
one map-side aggregate: no shuffle of the corpus, no Python anywhere.

Determinism discipline (the oracle contract shared by every gate):
tokens are the single-space split (``text.tokens``), the hash is the
md5-prefix ``portable_hash48``, and every floating aggregate rounds
to 4dp — per-bucket log-ratios round BEFORE the per-doc sum (the
``bigram_pmi`` single-ln discipline), so the doc aggregate sums
identical decimal-rounded doubles on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash48, tokens


def _doc_buckets(df: DataFrame, n_buckets: int, text_col: str) -> DataFrame:
    """(doc_id, bucket): one row per TOKEN (not per distinct token —
    bag-of-words semantics, repeats count)."""
    return df.select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("word")
    ).select(
        "doc_id", (portable_hash48(F.col("word")) % n_buckets).alias("bucket")
    )


def hashed_linear_scores(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    n_buckets: int = 4096,
    text_col: str = "text",
    weight_scale: int = 1000,
) -> DataFrame:
    """fastText-style linear classifier INFERENCE: logit(doc) = bias +
    mean over tokens of w[hash(token) % n_buckets].  ``weights`` is a
    (bucket, wt_m) table — the trained model quantized to INTEGER
    units of 1/weight_scale (model quantization is standard serving
    practice, and here it buys bit-exact cross-engine determinism:
    the per-doc sum is exact integer arithmetic, so the mean is ONE
    double division instead of an accumulation-order-dependent double
    sum — a float avg() provably drifts across engines at the 4dp
    rounding boundary).  Model-sized, broadcast.  Returns (doc_id,
    n_tokens, logit, label) for EVERY input doc (token-less docs
    score the bare bias).

    The mean (not sum) matches fastText's bag-of-features averaging —
    scores are length-invariant, so a long document cannot saturate
    the filter by repetition alone.  A SPARSE weight table is fine:
    tokens hashing to uncovered buckets carry weight 0 but STAY in
    the denominator (fastText's unseen-feature rule) — hence the left
    join, not an inner join that would silently drop them from
    n_tokens too.  Scale shape: one corpus pass (explode + broadcast
    join), one map-side-combined per-doc aggregate; the corpus never
    shuffles on anything but doc_id."""
    per_tok = _doc_buckets(df, n_buckets, text_col).join(
        F.broadcast(weights.select("bucket", "wt_m")), "bucket", "left"
    ).withColumn("wt_m", F.coalesce("wt_m", F.lit(0)))
    # Rounding happens in integer 1e-4 units: the mean's 1e-4 value is
    # 104 * s / (scale * n); when that quotient is a true decimal tie
    # it is k.5 EXACTLY (a power-of-two fraction, bit-identical on
    # both engines, both round away from zero) — where rounding the
    # raw mean at 4dp hits .00005 boundaries whose double
    # representations the engines tie-break differently (observed:
    # sum=-2276, n=16 -> -0.14225).
    bias_e4 = round(bias * 10_000)
    logit_e4 = F.round(
        F.lit(10_000.0 / weight_scale)
        * F.sum("wt_m")
        / F.count(F.lit(1)),
        0,
    ).cast("long") + F.lit(bias_e4)
    scored = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (logit_e4 / 10_000.0).alias("logit"),
    )
    bare_bias = F.lit(bias_e4 / 10_000.0)
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("logit", bare_bias).alias("logit"),
            (F.coalesce("logit", bare_bias) > 0).alias("label"),
        )
    )


def dsir_bucket_log_ratios(
    source: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, lr_e4): add-1-smoothed per-bucket log importance ratio
    ln((ct+1)/(Nt+B)) - ln((cs+1)/(Ns+B)) over hashed unigram counts,
    QUANTIZED to integer 1e-4 units — the DSIR feature model, built
    ONCE from two corpus passes.  Every bucket in [0, n_buckets) gets
    a row (absent n-grams carry the smoothing mass).  Integer units
    make every downstream per-doc sum exact integer arithmetic (the
    same determinism discipline as ``hashed_linear_scores``'s
    quantized weights — a float sum drifts with accumulation order
    across engines)."""

    def counts(d: DataFrame) -> DataFrame:
        return (
            _doc_buckets(d, n_buckets, text_col)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    spark = source.sparkSession
    # One tokenize pass per corpus: the totals are the SUMS of the
    # bucket counts already computed (persisted so the sum action and
    # the ratio join share one execution), never a second explode.
    ct = counts(target).persist()
    cs = counts(source).persist()
    nt = int(ct.agg(F.sum("n")).collect()[0][0] or 0)
    ns = int(cs.agg(F.sum("n")).collect()[0][0] or 0)
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    lr = F.log(
        (F.coalesce("ct", F.lit(0)) + 1.0) / F.lit(float(nt + n_buckets))
    ) - F.log(
        (F.coalesce("cs", F.lit(0)) + 1.0) / F.lit(float(ns + n_buckets))
    )
    out = (
        buckets.join(ct.withColumnRenamed("n", "ct"), "bucket", "left")
        .join(cs.withColumnRenamed("n", "cs"), "bucket", "left")
        .select(
            "bucket",
            F.round(lr * 10000.0, 0).cast("long").alias("lr_e4"),
        )
        # model-sized (n_buckets rows): materialize, then release the
        # corpus-count persists so nothing leaks past the model build
        .localCheckpoint(eager=True)
    )
    ct.unpersist()
    cs.unpersist()
    return out


def dsir_log_weights(
    df: DataFrame,
    ratios: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, log_weight): per-document DSIR log
    importance weight — the sum over tokens of the quantized
    per-bucket log-ratio (exact integer sum, ONE double division back
    to log units).  Documents resembling the TARGET corpus score
    high; pair with ``curation.weighted_sample`` (Gumbel top-k on
    exp(log_weight) is the paper's sampler; the deterministic
    hash-rank sampler is this repo's reproducible stand-in) to select
    a target-like subset from a raw crawl.  Token-less docs weigh 0.
    Same one-pass scale shape as ``hashed_linear_scores`` — ``ratios``
    is model-sized and broadcast.  ``dsir_bucket_log_ratios`` covers
    every bucket by construction; should a caller pass a sparse ratio
    table, uncovered buckets count as neutral evidence (0) and still
    count in n_tokens — left join, not a token-dropping inner join."""
    per_tok = _doc_buckets(df, n_buckets, text_col).join(
        F.broadcast(ratios.select("bucket", "lr_e4")), "bucket", "left"
    ).withColumn("lr_e4", F.coalesce("lr_e4", F.lit(0)))
    scored = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum("lr_e4") / 10000.0, 4).alias("log_weight"),
    )
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
