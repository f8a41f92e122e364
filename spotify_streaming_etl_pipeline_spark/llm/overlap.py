"""Character-level substring-overlap detection, MOSS-style: documents
sharing verbatim 16-char substrings, found through mod-p fingerprint
selection (Broder's "0 mod p" scheme — the deterministic cousin of
winnowing). Catches copied passages that word-level Jaccard dilutes
away (a long doc quoting one paragraph) and that embedding similarity
never localizes (additive family, SURVEY §2.11).

Scale shape: every sliding-window hash is computed JVM-side (same
posting discipline as llm/text.fingerprint_table), then immediately
thinned to the ~1/p that are ≡ 0 (mod p) — the posting that shuffles
is 1/p of the character stream, and selection is position-independent
so two documents sharing a substring ALWAYS share its selected
hashes (no winnowing window-alignment miss). Pairs come from one
equi-join of the thinned posting with itself; a document-frequency
cap on the hash bounds the hottest key exactly like the n-gram
dedup's cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import window_hashes

WINDOW = 16  # substring length, matches fingerprint_table
MOD = 64  # keep hashes ≡ 0 (mod 64): ~1.6% of the stream


def selected_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    window: int = WINDOW,
    mod: int = MOD,
) -> DataFrame:
    """(doc_id, h): distinct selected substring hashes per document —
    every 48-bit hash of a ``window``-char substring with h % mod == 0
    (the sliding-hash substrate is text.window_hashes, shared with the
    min-hash fingerprint). Deterministic, alignment-free, and shared
    verbatim text of length >= window + mod·E[gap] almost surely
    contributes a selection."""
    return (
        window_hashes(df, text_col, window)
        .filter(F.pmod(F.col("h"), F.lit(mod)) == 0)
        .distinct()
    )


def substring_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    window: int = WINDOW,
    mod: int = MOD,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing at least
    ``min_shared`` selected substring fingerprints, doc_a < doc_b.
    ``max_doc_freq`` drops boilerplate substrings present in more than
    that many documents before pairing (skew guard, cap² worst key).

    Capped, the thinned posting folds to ``dedup.posting_buckets``
    (one shuffle, cap-bounded arrays) and pairs come join-free from
    the within-row double explode — the same rewrite as
    ``ngram_jaccard_pairs``; uncapped keeps the classic self-join
    whose skew degradation is graceful where an unbounded
    ``collect_list`` would OOM."""
    from .dedup import bucket_shared_counts, posting_buckets

    sel = selected_fingerprints(df, text_col, window, mod)
    if max_doc_freq is not None:
        buckets = posting_buckets(
            sel.withColumnRenamed("h", "h1"), max_doc_freq
        )
        shared = bucket_shared_counts(buckets)
    else:
        a = sel.select(F.col("doc_id").alias("doc_a"), "h")
        b = sel.select(F.col("doc_id").alias("doc_b"), "h")
        shared = (
            a.join(b, "h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        )
    return shared.filter(F.col("n_shared") >= min_shared)


WINNOW_W = 8  # winnowing window: hashes per selection window


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    window: int = WINDOW,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, h) distinct: WINNOWING fingerprint selection
    (Schleimer-Wilkerson-Aiken) — the minimum hash of every run of
    ``w`` consecutive substring hashes. Unlike mod-p selection
    (density ~1/p but no worst case: an adversarial/unlucky stretch
    can select nothing), winnowing GUARANTEES every shared substring
    of length >= window + w - 1 chars contributes a shared
    fingerprint, at density ~2/(w+1).

    Relational form: position-keeping ``window_hashes`` -> one
    sliding-window min per position (ROWS CURRENT..w-1 FOLLOWING; the
    trailing partial windows add only hashes already in the doc, so
    the guarantee and the distinct set semantics are unaffected) ->
    distinct. One window shuffle partitioned by doc_id — scales with
    docs, not corpus size; the DuckDB oracle runs the identical frame."""
    from pyspark.sql import Window as W

    wh = window_hashes(df, text_col, window, with_pos=True)
    frame = (
        W.partitionBy("doc_id").orderBy("i").rowsBetween(W.currentRow, w - 1)
    )
    return (
        wh.select("doc_id", F.min("h").over(frame).alias("h")).distinct()
    )


def winnowed_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    window: int = WINDOW,
    w: int = WINNOW_W,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing at least
    ``min_shared`` winnowed fingerprints — the guaranteed-recall
    sibling of ``substring_overlap_pairs``, same df-capped bucket-fold
    pairing (``dedup.posting_buckets`` + ``bucket_shared_counts``)."""
    from .dedup import bucket_shared_counts, posting_buckets

    sel = winnowed_fingerprints(df, text_col, window, w)
    if max_doc_freq is not None:
        buckets = posting_buckets(
            sel.withColumnRenamed("h", "h1"), max_doc_freq
        )
        shared = bucket_shared_counts(buckets)
    else:
        a = sel.select(F.col("doc_id").alias("doc_a"), "h")
        b = sel.select(F.col("doc_id").alias("doc_b"), "h")
        shared = (
            a.join(b, "h")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        )
    return shared.filter(F.col("n_shared") >= min_shared)
