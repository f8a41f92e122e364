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

from pyspark.sql import DataFrame, Window
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


def duplicate_spans(
    df: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
    window: int = WINDOW,
    max_postings: int | None = 100,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact verbatim duplicate SPANS between document pairs — the
    Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better") surgical-removal primitive that doc-level and
    line-level dedup both miss: (doc_a, doc_b, a_start, b_start,
    span_len) with doc_a < doc_b, ``a_start``/``b_start`` the 1-based
    character offsets of a MAXIMAL shared substring of length
    ``span_len`` >= ``min_len``.

    Relational suffix-array stand-in: position-keeping
    ``window_hashes`` -> hot-hash star guard (a COUNT aggregate finds
    hashes with more than ``max_postings`` positions — corpus
    boilerplate — and an anti-join drops them BEFORE any posting
    array is materialized) -> posting grouped by hash -> within-row
    double explode pairs matched positions join-free -> matched
    positions sharing a DIAGONAL (ia - ib) merge into runs by the
    gaps-and-islands rewrite (ia - row_number), each island one span
    of length max(ia) - min(ia) + window.

    Scale posture: the one corpus-sized shuffle carries (h, doc_id,
    i) ~ 22 B per CHARACTER of corpus — inherently heavier than the
    thinned fingerprint families, exactly as the suffix-array
    original is.  At 100 TB run it funneled: ``candidates`` (any
    (doc_a, doc_b) table, e.g. ``winnowed_overlap_pairs`` output)
    semi-joins the posting down to documents already known to
    overlap before the position join.  The island window partitions
    by (doc_a, doc_b, diag) — pair-sized state, never corpus-sized.

    ``max_postings`` is the ONLY bound on pair work — the matched
    -position explode emits sum(n²) rows over per-hash posting
    counts n, so the cap bounds output at max_postings × postings:
    LINEAR in corpus size with constant ``max_postings``.  The
    default of 100 is deliberately scale-safe: the repo's own 10×
    measurement (PLANS.md round 11) showed mid-frequency windows
    (100 < n <= 1000 — phrases genuinely shared by hundreds of
    docs) alone emit 2.4e9 pairs from 22M postings, an executor
    OOM, and the ``candidates`` doc-level semi-join CANNOT bound
    that case (the exploding docs all genuinely overlap something,
    so every one survives the funnel).  Windows above the cap are
    treated as corpus boilerplate in this PAIR diagnostic; when the
    g² pair rows for a widely-shared passage are genuinely wanted,
    raise ``max_postings`` explicitly and budget sum(n²) output —
    for REMOVAL use ``occurrence_removal_intervals``, which charges
    each duplicated occurrence once (linear, no cap semantics).

    Caveat (documented, inherent to hash-position matching):
    self-PERIODIC shared text (e.g. "abab...") also matches on
    shifted diagonals, reporting sub-spans of the maximal span;
    downstream removal is interval-UNION per doc
    (``removal_intervals``), which collapses them."""
    wh = window_hashes(df, text_col, window, with_pos=True)
    if candidates is not None:
        docs = (
            candidates.select(F.col("doc_a").alias("doc_id"))
            .unionByName(candidates.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        wh = wh.join(docs, "doc_id", "left_semi")
    if max_postings is not None:
        # Hot-hash guard BEFORE materialization: a plain count aggregate
        # (map-side partial combine, constant per-group state) finds the
        # boilerplate hashes, and an anti-join drops their positions
        # before any posting array exists.  Filtering size() AFTER the
        # collect_list would build the full posting array for every
        # corpus-boilerplate window (license headers, whitespace runs —
        # 1e8+ positions at 100 TB) in one aggregation buffer just to
        # throw it away: an executor-OOM, not a slowdown.  The hot set
        # (count > cap) is small but has no static bound a broadcast
        # could rely on, so the anti-join is shuffle-hash hinted: no
        # sort, per-partition build side bounded by the hot-hash count,
        # and its h-partitioning is exactly what the posting fold needs
        # next, so the fold reuses the exchange.
        hot = (
            wh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_postings)
            .select("h")
        )
        wh = wh.join(hot.hint("shuffle_hash"), "h", "left_anti")
    posting = wh.groupBy("h").agg(
        F.collect_list(F.struct("doc_id", "i")).alias("ps")
    )
    matched = (
        posting.select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("c"))
        .filter(F.col("a.doc_id") < F.col("c.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("a.i").alias("ia"),
            (F.col("a.i") - F.col("c.i")).alias("diag"),
        )
        .dropDuplicates(["doc_a", "doc_b", "diag", "ia"])
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("ia")
    runs = matched.withColumn(
        "island", F.col("ia") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("ia").alias("a_start"),
            (F.max("ia") - F.min("ia") + window).alias("span_len"),
        )
        .filter(F.col("span_len") >= min_len)
        .select(
            "doc_a",
            "doc_b",
            F.col("a_start").cast("long").alias("a_start"),
            (F.col("a_start") - F.col("diag")).cast("long").alias("b_start"),
            F.col("span_len").cast("long").alias("span_len"),
        )
    )


def removal_intervals(spans: DataFrame) -> DataFrame:
    """Per-document character intervals to DELETE for surgical
    verbatim dedup: (doc_id, start, length), 1-based, overlapping
    intervals merged.  Keeper policy: min doc_id keeps its text —
    every span charges its interval to ``doc_b`` only (deterministic,
    oracle-replayable; the doc-level ``cluster_keepers`` uses the
    same min-id convention).  Interval union is the running-max
    gaps-and-islands rewrite — one window partitioned by doc_id,
    doc-sized state."""
    iv = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("b_start").alias("start"),
        (F.col("b_start") + F.col("span_len")).alias("end"),
    )
    w = Window.partitionBy("doc_id").orderBy("start", "end")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    runs = iv.withColumn(
        "new_island",
        (prev_max.isNull() | (F.col("start") > prev_max)).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy("doc_id", "island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            (F.col("end") - F.col("start")).cast("long").alias("length"),
        )
    )


def apply_removal(
    df: DataFrame,
    intervals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute the surgical dedup: delete each document's
    ``removal_intervals`` from its text.  Returns (doc_id, n_removed
    chars, clean_text) for EVERY input document — uncharged docs pass
    through with n_removed = 0 (the repetition_stats discipline:
    nothing vanishes silently).

    Relational form: intervals collapse to one sorted array per doc
    (doc-sized state), and the text is rebuilt with one native fold
    over the KEPT gaps — substring slices between interval ends, all
    codegen, no explode of characters, no UDF.  Intervals are
    expected non-overlapping and 1-based (what ``removal_intervals``
    emits); the fold tolerates out-of-range ends by clamping to the
    document length."""
    iv = intervals.groupBy(F.col("doc_id")).agg(
        F.array_sort(
            F.collect_list(F.struct("start", "length"))
        ).alias("ivs")
    )
    joined = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).join(iv, "doc_id", "left")
    n = F.length("_t")
    # fold state: (pos = 1-based cursor, acc = kept text so far);
    # each interval appends the gap before it and jumps the cursor
    state = F.aggregate(
        F.coalesce(
            F.col("ivs"),
            F.array().cast("array<struct<start:long,length:long>>"),
        ),
        F.struct(
            F.lit(1).cast("long").alias("pos"), F.lit("").alias("acc")
        ),
        lambda st, i: F.struct(
            F.greatest(
                st["pos"], F.least(i["start"] + i["length"], n + 1)
            ).alias("pos"),
            F.concat(
                st["acc"],
                F.substring(
                    F.col("_t"),
                    st["pos"],
                    F.greatest(i["start"] - st["pos"], F.lit(0)),
                ),
            ).alias("acc"),
        ),
    )
    clean = F.concat(
        state["acc"], F.substring(F.col("_t"), state["pos"], n)
    )
    return joined.select(
        "doc_id",
        (n - F.length(clean)).cast("long").alias("n_removed"),
        clean.alias("clean_text"),
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


def occurrence_removal_intervals(
    df: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
    window: int = WINDOW,
    max_postings: int | None = 1000,
) -> DataFrame:
    """(doc_id, start, length): character intervals whose windows
    verbatim-duplicate an EARLIER occurrence anywhere in the corpus —
    the Lee et al. 2022 "keep one occurrence of every duplicated
    substring" removal in LINEAR occurrence space.

    ``duplicate_spans`` enumerates (doc_a, doc_b) PAIRS, which is the
    right shape for pair diagnostics but inherently costs the sum of
    group-size SQUARED when g documents share a passage (measured:
    2.4e9 pair rows from 2.2e7 posting rows at 10x sf0.1 — an 8 GB
    heap OOM).  Removal does not need pairs: per window hash the
    canonical occurrence is min (doc_id, position) and every OTHER
    occurrence is a duplicated window — one row per occurrence, never
    per occurrence pair.  Consecutive duplicated positions in one doc
    merge by gaps-and-islands (an L-char shared passage yields exactly
    an (start, L) interval in each non-canonical doc); islands
    shorter than ``min_len`` drop.  Within-document repetitions are
    charged too (all but the first occurrence), matching the paper's
    self-duplicate semantics.

    Scale shape: the hot-hash count guard (same pre-fold anti-join as
    ``duplicate_spans``), the canonical-occurrence window, and the
    guard's count aggregate ALL partition by h, so the posting
    shuffles once and the exchange is reused; per-group window state
    is bounded by ``max_postings``.  The island merge partitions by
    doc_id — document-sized state.  Output feeds ``apply_removal``
    directly."""
    wh = window_hashes(df, text_col, window, with_pos=True)
    if max_postings is not None:
        hot = (
            wh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_postings)
            .select("h")
        )
        wh = wh.join(hot.hint("shuffle_hash"), "h", "left_anti")
    canon = F.min(F.struct("doc_id", "i")).over(Window.partitionBy("h"))
    dup = (
        wh.withColumn("c", canon)
        .filter(
            (F.col("doc_id") != F.col("c.doc_id"))
            | (F.col("i") != F.col("c.i"))
        )
        .select("doc_id", "i")
    )
    wd = Window.partitionBy("doc_id").orderBy("i")
    runs = dup.withColumn("island", F.col("i") - F.row_number().over(wd))
    return (
        runs.groupBy("doc_id", "island")
        .agg(
            F.min("i").alias("start"),
            (F.max("i") - F.min("i") + window).alias("length"),
        )
        .filter(F.col("length") >= min_len)
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            F.col("length").cast("long").alias("length"),
        )
    )
