"""Benchmark decontamination and repetition quality signals.

Curation stages a training-data pipeline runs at scale:

- ``contamination_check``: flag corpus documents sharing >= ``min_hits``
  word n-grams with ANY document of a benchmark/eval set.  The corpus
  TEXT never shuffles: grams assemble array-natively per row (narrow),
  the tiny benchmark posting broadcasts, and the only corpus-sized
  shuffle is the per-(doc, bench) reduction of MATCHED postings — rows
  that survived the broadcast join, typically a sliver of the corpus.
- ``bloom_decontam``: the same question through a BLOOM FILTER — the
  form you reach for when the benchmark suite itself is large (every
  held-out eval ever published): the probe side is a table of at most
  ``m_bits`` DISTINCT set-bit positions, bounded by the filter size
  regardless of benchmark size, so the broadcast never grows with the
  eval suite.  Double hashing bit_i = (h1 + i*h2) mod m (Kirsch &
  Mitzenmacher 2006) over the two 48-bit md5 halves the dedup family
  already standardizes on; false positives are genuine bloom false
  positives and the oracle reproduces them exactly.
- ``repetition_stats``: Gopher-style intra-document repetition — the
  fraction of duplicated n-grams within each document
  (1 - distinct/total).  Entirely NARROW: grams, counts, and the ratio
  are per-row array expressions, no explode, no shuffle, no window —
  the shape you want for a 100 TB per-document quality column.

Gram identity is shared with the dedup family: words joined by '|',
hashed with the portable 48-bit md5 — the exact construction
``dedup._posting`` uses, so contamination/dedup/repetition agree on
what an n-gram is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash48


def _gram_hash_array(text_col: str, n: int) -> Column:
    """Per-row array of 48-bit n-gram hashes (every occurrence, not
    distinct — repetition needs multiplicity).  Array-native: no
    explode/window, so gram assembly is narrow.  Docs with fewer than
    ``n`` tokens yield an empty array (sequence() would otherwise
    count backward — the word_ngrams guard)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: portable_hash48(F.concat_ws("|", F.slice(toks, i, n)))
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Per-doc (n_grams, n_distinct, dup_ratio rounded to 4): the
    duplicated-n-gram fraction quality signal.  EVERY input doc gets a
    row — documents too short to have any n-gram report n_grams=0 with
    a NULL ratio (undefined), instead of silently vanishing from the
    stats (which would corrupt joins and coverage counts downstream)."""
    grams = _gram_hash_array(text_col, n)
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    return df.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.when(
            n_grams > 0, F.round(1 - n_distinct / n_grams, 4)
        ).alias("dup_ratio"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 10,
) -> DataFrame:
    """Corpus docs overlapping a benchmark set: (doc_id, bench_id,
    n_hits) for pairs sharing >= min_hits DISTINCT n-grams.

    The corpus posting is NOT pre-deduplicated (that would shuffle the
    whole corpus posting before the join); instead the broadcast join
    runs on every occurrence and the per-pair aggregate counts
    DISTINCT shared hashes — same result, and the only shuffle carries
    matched rows."""
    c = corpus.select(
        "doc_id", F.explode(_gram_hash_array(text_col, n)).alias("h")
    )
    b = (
        benchmark.select(
            F.col("doc_id").alias("bench_id"),
            F.explode(_gram_hash_array(text_col, n)).alias("h"),
        )
        .dropDuplicates(["bench_id", "h"])
    )
    return (
        c.join(F.broadcast(b), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("h").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def _gram_pair_array(text_col: str, n: int):
    """Per-row array of DISTINCT n-gram hash pairs struct<h1, h2> —
    both 48-bit halves of ONE md5 per gram (the md5 is materialized
    in its own transform so the interpreted HOF evaluates it once,
    not once per half).  Entirely narrow: the bloom family's gram
    assembly never shuffles, where the ``dedup._posting`` form costs
    a per-doc window exchange plus a dedup exchange — right for
    building a reusable posting table, wrong for a probe that only
    ever needs the grams row-locally."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    md5s = F.transform(
        idx, lambda i: F.md5(F.concat_ws("|", F.slice(toks, i, n)))
    )
    pairs = F.transform(
        md5s,
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 12), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 13, 12), 16, 10).cast("long").alias("h2"),
        ),
    )
    return F.array_distinct(pairs)


def bloom_bits(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 4096,
    k: int = 2,
) -> DataFrame:
    """(bit): the DISTINCT bloom bit positions set by the benchmark's
    word n-grams — at most ``m_bits`` rows no matter how many grams
    went in (THE bloom property: probe-side memory is bounded by the
    filter size, not the benchmark suite).  Each gram sets k
    positions (h1 + i*h2) mod m over the shared 48-bit md5 halves;
    gram assembly is narrow (``_gram_pair_array``), so the only
    shuffle is the <= m-row distinct."""
    g = benchmark.select(
        F.explode(_gram_pair_array(text_col, n)).alias("g")
    )
    return (
        g.select(
            "g.h1",
            "g.h2",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        )
        .select(
            ((F.col("h1") + F.col("i") * F.col("h2")) % m_bits).alias("bit")
        )
        .distinct()
    )


def bloom_decontam(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    m_bits: int = 4096,
    k: int = 2,
    flag_ratio: float = 0.5,
) -> DataFrame:
    """Bloom-filter decontamination: per corpus doc (doc_id, n_grams,
    n_hits, hit_ratio, flagged) where n_hits counts the doc's DISTINCT
    n-grams whose every bloom position is set by the benchmark —
    membership up to the filter's false-positive rate, which this
    operator REPORTS rather than hides (hit_ratio saturates toward the
    FP floor (bits_set/m)^k on clean docs; size m accordingly).

    Plan shape: gram assembly is NARROW on both sides
    (``_gram_pair_array`` — no posting window, no dedup exchange);
    the k bit probes per gram join the broadcast ``bloom_bits`` table
    (<= m rows), and a gram is a hit iff all k probe rows survive the
    inner join, so only MATCHED probes ever shuffle (per-(doc, gram)
    count, then per-doc count) — on a clean corpus that is a sliver.
    The per-doc gram totals come from a second narrow pass
    (column-pruned scan + array expression), trading one cheap
    re-scan for zero corpus-sized exchanges.  Every input doc gets a
    row; docs too short for any n-gram report n_grams = 0 with a
    NULL ratio (the repetition_stats discipline)."""
    bits = bloom_bits(benchmark, text_col, n, m_bits, k)
    grams = _gram_pair_array(text_col, n)
    totals = corpus.select(
        "doc_id", F.size(grams).cast("long").alias("n_grams")
    )
    probes = corpus.select(
        "doc_id", F.explode(grams).alias("g")
    ).select(
        "doc_id",
        "g.h1",
        "g.h2",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    ).select(
        "doc_id",
        "h1",
        "h2",
        ((F.col("h1") + F.col("i") * F.col("h2")) % m_bits).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("doc_id", "h1", "h2")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") == k)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_grams = F.col("n_grams")
    n_hits = F.coalesce("n_hits", F.lit(0))
    ratio = F.when(n_grams > 0, F.round(n_hits / n_grams, 4))
    # totals already carries one row per corpus doc, so it IS the
    # left side — no join back to the corpus needed.
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_hits.alias("n_hits"),
        ratio.alias("hit_ratio"),
        F.coalesce(ratio >= flag_ratio, F.lit(False)).alias("flagged"),
    )
