"""Document deduplication: exact, canonical, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale posture (the point of each design):

- **exact / canonical**: one hash projection + one groupBy on the
  48-bit hash — the shuffle carries hashes, never document text.
- **n-gram Jaccard** (`ngram_jaccard_pairs`): exact-recall blocking via
  an inverted index (explode shingle hashes, equi-join on shingle) —
  any pair with Jaccard > 0 shares a shingle, so no candidate is ever
  missed. Pairwise work is proportional to shared-shingle co-occurrence,
  not |docs|²; this is the *baseline* — at extreme scale you cap
  shingle document-frequency or move to MinHash below.
- **MinHash+LSH** (`minhash_lsh_candidates`): k-hash signature per doc,
  banded into b band-keys; candidates = equi-join on (band, key). The
  only pairwise computation happens inside LSH buckets. Fully
  deterministic here (portable hash), so the oracle reproduces it
  exactly.
- **SimHash** (`simhash_near_dup`): 48-bit fingerprint; banding into
  (t+1) chunks guarantees *exact recall* for hamming distance <= t by
  pigeonhole, so the banded plan provably equals the brute-force
  oracle.

Reference parity note: the reference's only dedup is exact-key
set-difference for entity discovery (reference
scripts/etl/extractor.py:227-252) — covered by operators/writer.py.
This module is the additive LLM-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash48, word_ngrams

NGRAM_N = 3


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct
    content with the keeper (min doc_id) and duplicate count."""
    return (
        df.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def canonical_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonicalized exact dedup: hash of the sorted distinct token
    set, catching reordered/bag-of-words duplicates exactly."""
    canon = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.col(text_col), " ")))
    )
    return (
        df.select("doc_id", F.md5(canon).alias("canon_hash"))
        .groupBy("canon_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _doc_ngrams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    return df.select(
        "doc_id", word_ngrams(F.col(text_col), n).alias("ngrams")
    ).filter(F.size("ngrams") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = NGRAM_N,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (doc_a < doc_b, j >= t).

    Inverted-index plan: explode 48-bit shingle hashes (shuffle carries
    8-byte hashes, not text), count co-occurrences per pair, then
    jaccard = shared / (|A| + |B| - shared). Exact recall: j >= t > 0
    implies at least one shared shingle.
    """
    grams = _doc_ngrams(df, text_col, n)
    sizes = grams.select("doc_id", F.size("ngrams").alias("n_grams"))
    posting = grams.select(
        "doc_id",
        F.explode(F.transform("ngrams", portable_hash48)).alias("gram_hash"),
    )
    a = posting.select(
        F.col("doc_id").alias("doc_a"), F.col("gram_hash")
    )
    b = posting.select(
        F.col("doc_id").alias("doc_b"), F.col("gram_hash")
    )
    shared = (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------

MINHASH_K = 16  # signature length
LSH_ROWS = 4  # rows per band -> bands = K / ROWS = 4


def _seeded_hash(seed: int):
    # Closure factory, NOT `lambda g, i=i: ...`: PySpark counts
    # defaulted params toward higher-order-function arity, so a
    # defaulted seed would be shadowed by the array-index Column.
    def fn(g):
        return portable_hash48(F.concat(F.lit(f"{seed}#"), g))

    return fn


def minhash_signature_cols(ngrams_col, k: int = MINHASH_K) -> list:
    """k minhash values: min over shingles of hash48(i || '#' || g).
    Seeded-by-concat keeps the hash portable (oracle: same md5)."""
    return [
        F.array_min(F.transform(ngrams_col, _seeded_hash(i))).alias(f"mh_{i}")
        for i in range(k)
    ]


def minhash_lsh_candidates(
    df: DataFrame,
    k: int = MINHASH_K,
    rows_per_band: int = LSH_ROWS,
    n: int = NGRAM_N,
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= 1 LSH band.

    Plan: signature projection (no shuffle) -> explode b band keys ->
    self equi-join on (band, key) -> distinct pairs. The join is the
    only shuffle and carries (doc_id, band, 4 longs) — independent of
    document size. Deterministic given the portable hash.
    """
    grams = _doc_ngrams(df, text_col, n)
    sig = grams.select("doc_id", *minhash_signature_cols(F.col("ngrams"), k))
    n_bands = k // rows_per_band
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh_{band * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_dup(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidates verified with exact n-gram Jaccard:
    the production near-dup query (bucketed candidate generation, exact
    pairwise verification only inside buckets)."""
    cands = minhash_lsh_candidates(df, text_col=text_col)
    grams = _doc_ngrams(df, text_col, NGRAM_N).select(
        "doc_id", F.transform("ngrams", portable_hash48).alias("gh")
    )
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("gh_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("gh").alias("gh_b"))
    inter = F.size(F.array_intersect("gh_a", "gh_b"))
    union = F.size("gh_a") + F.size("gh_b") - inter
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------

SIMHASH_BITS = 48


def simhash_col(features_col) -> F.Column:
    """48-bit SimHash over an array of *pre-hashed* features (longs):
    bit j is the sign of the sum over features of (+1 / -1) by bit j.
    Takes hashes, not raw features, so the md5 runs once per feature
    (a prior projection), not once per (feature, bit). The bit loop
    unrolls in Python so each shift amount is a literal."""
    def bit_vote(j: int):
        # Closure factory (see _seeded_hash: defaulted params would be
        # shadowed by HOF lambda variables).
        def fn(a, h):
            bit = F.shiftright(h, j).bitwiseAND(F.lit(1))
            return a + F.when(bit == 1, 1).otherwise(-1)

        return fn

    fingerprint = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        bit_sum = F.aggregate(features_col, F.lit(0).cast("long"), bit_vote(j))
        fingerprint = fingerprint + F.when(
            bit_sum > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return fingerprint


def simhash_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fingerprints over word-3-gram features (unigram features would
    collide for any docs sharing a vocabulary; shingles encode order)."""
    grams = _doc_ngrams(df, text_col, NGRAM_N)
    hashed = grams.select(
        "doc_id", F.transform("ngrams", portable_hash48).alias("gram_hashes")
    )
    return hashed.select("doc_id", simhash_col(F.col("gram_hashes")).alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    max_distance: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_distance.

    Banded exact-recall plan: split the 48-bit fingerprint into
    (max_distance + 1) chunks; by pigeonhole, any pair within distance
    t agrees on >= 1 chunk, so an equi-join on (chunk_idx, chunk_value)
    finds every qualifying pair — brute-force-equivalent results at
    equi-join cost.
    """
    n_chunks = max_distance + 1
    width = SIMHASH_BITS // n_chunks
    mask = (1 << width) - 1
    fp = simhash_fingerprints(df, text_col)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "val"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "val"
    )
    return (
        a.join(b, ["chunk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
