"""TF-IDF document vectors and sparse cosine similarity — lexical
near-dup/similarity without embeddings (additive family, SURVEY
§2.11). Complements the set-based Jaccard family (llm/dedup.py):
tf-idf weighs repeated and rare terms, so it separates "shares
boilerplate" from "shares content".

Scale shape — identical to the inverted-index Jaccard plan: the
weighted posting table (doc_id, token, w) is the only large
intermediate (≈ corpus token count rows); pairs come from ONE
equi-join of the posting with itself on the token, so work is
O(Σ df_t²) with every term bounded by the document-frequency cap —
never all-pairs. Norms are a map-side-combined groupBy on doc_id.

Cross-engine determinism: idf is rounded to 4dp BEFORE weighting
(exactly like llm/text.vocab_stats), making every weight bit-identical
between Spark and the DuckDB oracle; only the dot-product sum order
can then drift, which the final 4dp cosine rounding absorbs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def tfidf_posting(
    df: DataFrame,
    text_col: str = "text",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(doc_id, token, w) with w = tf × round(ln(n_docs/doc_freq), 4).

    ``max_doc_freq`` drops tokens appearing in more than that many
    documents — the same skew guard as dedup.cap_doc_freq: the pair
    join's worst key is bounded at cap², and ubiquitous tokens carry
    near-zero idf anyway."""
    tok = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    n_docs = df.select(F.countDistinct("doc_id").alias("n"))
    voc = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("dfreq"))
    if max_doc_freq is not None:
        voc = voc.filter(F.col("dfreq") <= max_doc_freq)
    voc = voc.crossJoin(F.broadcast(n_docs)).select(
        "token", F.round(F.log(F.col("n") / F.col("dfreq")), 4).alias("idf")
    )
    return tf.join(voc, "token").select(
        "doc_id", "token", (F.col("tf") * F.col("idf")).alias("w")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, cosine): pairs with tf-idf cosine ≥ threshold,
    doc_a < doc_b, cosine rounded to 4dp. Exact recall over the
    retained (df-capped) token space: cosine > 0 requires a shared
    token, so the posting self-join misses nothing a positive
    threshold can accept.

    Capped, the posting folds to one (token, [struct(doc_id, w)])
    bucket row per token (arrays bounded at cap entries by the df
    filter) and dot products come join-free from a within-row double
    explode — the weighted form of ``dedup.posting_buckets``; only
    the partial-sum order can differ from the join form, which the
    4dp cosine rounding absorbs (same contract as the idf rounding
    above). Uncapped keeps the classic self-join."""
    posting = tfidf_posting(df, text_col, max_doc_freq).persist()  # released by bench's per-query clearCache; long-lived callers unpersist
    norms = posting.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    if max_doc_freq is not None:
        buckets = posting.groupBy("token").agg(
            F.collect_list(F.struct("doc_id", "w")).alias("docs")
        )
        dots = (
            buckets.select(F.explode("docs").alias("a"), "docs")
            .select("a", F.explode("docs").alias("b"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
        )
    else:
        a = posting.select(
            F.col("doc_id").alias("doc_a"), "token", F.col("w").alias("wa")
        )
        b = posting.select(
            F.col("doc_id").alias("doc_b"), "token", F.col("w").alias("wb")
        )
        dots = (
            a.join(b, "token")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
        )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        # shuffle_hash, not broadcast: per-doc norms grow with the
        # corpus (same class as dedup.pair_jaccard's sizes joins —
        # the planner would broadcast a corpus-sized build)
        dots.join(na.hint("shuffle_hash"), "doc_a")
        .join(nb.hint("shuffle_hash"), "doc_b")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
