"""Oracle-gated queries for corpus curation and layout
(llm/curation.py, llm/decontam.py, llm/packing.py, llm/text.py):
repetition / contamination / normalization / PII passes, quality
filtering, source mixing and quotas, splits, snapshot diffs, corpus
composition stats, weighted sampling, sequence packing, sharding, and
length percentiles.

Shared DuckDB fragments live in ``llm_shared``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import packing
from ..llm.text import token_count_ws
from .analytics import query
from .llm_shared import _H48, _docs


@query(
    "repetition_stats",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(w)), i -> w[i] || '|' || w[i+1]) AS gs
        FROM toks
    )
    SELECT doc_id,
           cast(len(gs) AS BIGINT) AS n_grams,
           cast(len(list_distinct(gs)) AS BIGINT) AS n_distinct,
           CASE WHEN len(gs) > 0
                THEN round(1 - len(list_distinct(gs))::DOUBLE / len(gs), 4)
           END AS dup_ratio
    FROM g
    """,
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicated-bigram fraction per document."""
    from ..llm.decontam import repetition_stats

    return repetition_stats(_docs(spark, sf_dir), n=2)


@query(
    "contamination_check",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || '|' || w[i+1] || '|' || w[i+2])) AS ng
        FROM toks WHERE len(w) >= 3
    ),
    c AS (SELECT doc_id, unnest(ng) AS gram FROM g WHERE doc_id >= 25),
    b AS (SELECT doc_id AS bench_id, unnest(ng) AS gram FROM g WHERE doc_id < 25)
    SELECT c.doc_id, b.bench_id, cast(count(*) AS BIGINT) AS n_hits
    FROM c JOIN b USING (gram)
    GROUP BY 1, 2
    HAVING count(*) >= 5
    """,
)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: corpus docs (id >= 25) sharing >= 5
    distinct trigrams with a 'benchmark' slice (id < 25)."""
    from ..llm.decontam import contamination_check

    d = _docs(spark, sf_dir)
    return contamination_check(
        d.filter(F.col("doc_id") >= 25),
        d.filter(F.col("doc_id") < 25),
        min_hits=5,
    )


@query(
    "bloom_decontam",
    """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || '|' || w[i+1] || '|' || w[i+2])) AS ng
        FROM toks WHERE len(w) >= 3
    ),
    bh AS (
        SELECT DISTINCT (('0x' || substring(md5(gr), 1, 12))::BIGINT
               + s.i * ('0x' || substring(md5(gr), 13, 12))::BIGINT)
               % 16384 AS bit
        FROM (SELECT unnest(ng) AS gr FROM g WHERE source = 'src0'),
             (SELECT unnest(range(0, 3)) AS i) s
    ),
    ch AS (
        SELECT doc_id, gr,
               ('0x' || substring(md5(gr), 1, 12))::BIGINT AS h1,
               ('0x' || substring(md5(gr), 13, 12))::BIGINT AS h2
        FROM (SELECT doc_id, unnest(ng) AS gr FROM g)
    ),
    pr AS (
        SELECT doc_id, gr, (h1 + s.i * h2) % 16384 AS bit
        FROM ch, (SELECT unnest(range(0, 3)) AS i) s
    ),
    hit AS (
        SELECT doc_id, gr FROM pr JOIN bh USING (bit)
        GROUP BY doc_id, gr HAVING count(*) = 3
    ),
    hd AS (SELECT doc_id, count(*)::BIGINT AS n_hits FROM hit GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(len(g.ng), 0)::BIGINT AS n_grams,
           coalesce(hd.n_hits, 0)::BIGINT AS n_hits,
           CASE WHEN coalesce(len(g.ng), 0) > 0
                THEN round(coalesce(hd.n_hits, 0) / len(g.ng), 4) END
               AS hit_ratio,
           coalesce(
               CASE WHEN coalesce(len(g.ng), 0) > 0
                    THEN round(coalesce(hd.n_hits, 0) / len(g.ng), 4) >= 0.5
                    END,
               false) AS flagged
    FROM documents d
    LEFT JOIN g ON g.doc_id = d.doc_id
    LEFT JOIN hd ON hd.doc_id = d.doc_id
    """,
)
def bloom_decontam_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (llm/decontam.py:bloom_decontam):
    the 'src0' slice plays the benchmark suite; every corpus doc's
    distinct-trigram bloom hit ratio is computed against the m=16384,
    k=3 double-hashed filter (Kirsch-Mitzenmacher positions over the
    shared 48-bit md5 halves).  The oracle replays the EXACT bloom —
    set-bit table, k probe rows per gram, all-k-matched rule — so
    genuine false positives are part of the certified answer (the
    sf0.01 hit-ratio median is 0.061 against a ~0.011 FP floor, and
    the src0 docs themselves saturate at 1.0, so flagged fires both
    ways at the 0.5 threshold).  Full per-doc decision table hashed."""
    from ..llm.decontam import bloom_decontam

    d = _docs(spark, sf_dir)
    return bloom_decontam(
        d,
        d.filter(F.col("source") == "src0"),
        m_bits=16384,
        k=3,
        flag_ratio=0.5,
    )


@query(
    "normalized_hashes",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
    FROM documents
    """,
)
def normalized_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization fingerprint per doc (dedup key for
    case/punctuation-insensitive exact matching)."""
    from ..llm.text import normalize_text

    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("norm_hash")
    )


@query(
    "pii_masking",
    r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               'https?://[^\s]+', '<URL>', 'g'),
               '\d{6,}', '<NUM>', 'g')) AS masked_hash
    FROM documents
    """,
)
def pii_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass fingerprint: hash of the PII-masked text (the
    corpus here contains no PII, so masked == original — the operator
    and oracle still execute the full pattern chain)."""
    from ..llm.text import mask_pii

    return _docs(spark, sf_dir).select(
        "doc_id", F.md5(mask_pii(F.col("text"))).alias("masked_hash")
    )


@query(
    "quality_filter",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.25) FROM documents)
    """,
)
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the bottom quartile by length score (curation.quality_filter
    with n_chars standing in as the score so the oracle stays one
    line; the full quality_score pipeline is gated via text_quality)."""
    from ..llm.curation import quality_filter

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return quality_filter(d, score_col="n_chars", quantile=0.25)


@query(
    "source_mixture",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE ({_H48.format(x="doc_id::VARCHAR")}) % 100 <
          CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 10 ELSE 100 END
    """,
)
def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based source down-sampling (50% of src0,
    10% of src1, everything else kept)."""
    from ..llm.curation import mix_sources

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return mix_sources(d, {"src0": 50, "src1": 10})


@query(
    "temperature_mixture",
    f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 < 7 THEN 'A'
                    WHEN doc_id % 10 < 9 THEN 'B'
                    ELSE 'C' END AS source
        FROM documents
    ),
    stats AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
    rates AS (
        SELECT source,
               least(10000, floor(
                   (SELECT sum(n) FROM stats)
                   * (power(n, 0.5)
                      / (SELECT sum(power(n, 0.5)) FROM stats))
                   / n * 10000)) AS rate_bp
        FROM stats
    )
    SELECT d.doc_id, d.source
    FROM d JOIN rates USING (source)
    WHERE ({_H48.format(x="'tmix:' || doc_id::VARCHAR")}) % 10000 < rate_bp
    """,
)
def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixing (llm/curation.py:temperature_mix,
    alpha = 0.5) over a deliberately skewed 70/20/10 source recoding:
    weights ∝ sqrt(n) flatten the distribution — the big source
    down-samples hardest, the smallest caps at 100% — and DuckDB
    reproduces the whole chain (per-source counts, power-law
    normalization, basis-point floor, hash keep-filter) exactly."""
    from ..llm.curation import temperature_mix

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, "A")
        .when(F.col("doc_id") % 10 < 9, "B")
        .otherwise("C")
        .alias("source"),
    )
    return temperature_mix(d, alpha=0.5).select("doc_id", "source")


@query(
    "dataset_split",
    f"""
    SELECT doc_id, source,
           CASE WHEN h < 90 THEN 'train'
                WHEN h < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               ({_H48.format(x="'split:' || doc_id::VARCHAR")}) % 100 AS h
        FROM documents
    )
    """,
)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by salted id hash —
    growth-stable (a doc's split never changes as the corpus grows),
    shuffle-free (narrow projection)."""
    from ..llm.curation import dataset_split

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return dataset_split(d)


@query(
    "source_quota_sample",
    f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ({_H48.format(x="'quota:' || doc_id::VARCHAR")}), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 100
    """,
)
def source_quota_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (100 docs/source), selected by deterministic
    hash rank — the balancing stage that stops one crawl dump from
    dominating the mix."""
    from ..llm.curation import source_quota_sample

    d = _docs(spark, sf_dir).select("doc_id", "source")
    return source_quota_sample(d, quota=100)


@query(
    "document_chunks",
    """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id, w, len(w) AS n,
               CASE WHEN len(w) <= 16 THEN 1
                    ELSE cast(floor((len(w) - 16 + 11) / 12.0) AS BIGINT) + 1
               END AS n_chunks
        FROM toks WHERE len(w) > 0
    )
    SELECT doc_id,
           i AS chunk_id,
           cast(len(w[i * 12 + 1 : i * 12 + 16]) AS BIGINT) AS n_tokens,
           array_to_string(w[i * 12 + 1 : i * 12 + 16], ' ') AS chunk_text
    FROM c, unnest(range(n_chunks)) AS t(i)
    """,
)
def document_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (16-token windows, stride 12 -> 4-token
    overlap) — narrow-only plan, no shuffle (llm/text.py:chunk_documents)."""
    from ..llm.text import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_size=16, stride=12)


@query(
    "corpus_diff",
    f"""
    WITH old AS (
        SELECT doc_id, ({_H48.format(x="text")}) AS old_hash
        FROM documents WHERE doc_id % 13 != 0
    ),
    new AS (
        SELECT doc_id,
               ({_H48.format(x="CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END")}) AS new_hash
        FROM documents WHERE doc_id % 11 != 0
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.old_hash, n.new_hash
    FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL
       OR o.old_hash IS DISTINCT FROM n.new_hash
    """,
)
def corpus_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning snapshot diff (llm/curation.py:corpus_diff):
    two snapshots derived deterministically from documents (docs with
    id % 13 = 0 are 'late additions' absent from old; id % 11 = 0 were
    removed; id % 7 = 0 had text edited), classified added / removed /
    changed by content hash — text never shuffles, only 16-byte hash
    rows enter the full-outer join."""
    from ..llm.curation import corpus_diff

    d = _docs(spark, sf_dir)
    old = d.filter(F.col("doc_id") % 13 != 0).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus_diff(old, new)


@query(
    "corpus_stats_cube",
    """
    SELECT source, lang,
           cast(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(len(list_filter(string_split(text, ' '), t -> t != ''))) AS BIGINT)
               AS total_tokens
    FROM documents
    GROUP BY CUBE (source, lang)
    """,
)
def corpus_stats_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition across every (source x lang) margin in ONE
    pass: cube() plans a single Expand + one shuffle for all four
    grouping sets — per-pair, per-source, per-lang, and grand total —
    instead of four scans. The explicit grouping-flag arithmetic keeps
    the set id engine-portable."""
    d = _docs(spark, sf_dir)
    return (
        d.cube("source", "lang")
        .agg(
            (F.grouping("source") * 2 + F.grouping("lang"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_ws(F.col("text"))).alias("total_tokens"),
        )
        .select("source", "lang", "gid", "n_docs", "total_tokens")
    )


@query(
    "weighted_sample",
    f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE ({_H48.format(x="'wsample:' || doc_id::VARCHAR")}) % 100
          < least(100, n_chars // 10)
    """,
)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep probability
    scales with document length (least(100, n_chars/10)%), decided by
    the portable id hash — longer/higher-quality docs survive at
    higher rates, reproducibly (llm/curation.py:weighted_sample)."""
    from ..llm.curation import weighted_sample

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    rate = F.least(F.lit(100), F.floor(F.col("n_chars") / 10))
    return weighted_sample(d, rate)


# Deterministic stream order + two-level prefix sum, mirrored with
# explicit ROWS frames. h is the portable 48-bit hash of doc_id.
_STREAM_SQL = """
tq AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
               AS n_tokens,
           ('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS h
    FROM documents
),
b AS (SELECT doc_id, n_tokens, h, h % 8 AS bucket FROM tq),
cum AS (
    SELECT doc_id, n_tokens, bucket,
           sum(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_in_bucket
    FROM b
),
bt AS (SELECT bucket, sum(n_tokens) AS tot FROM b GROUP BY 1),
boff AS (
    SELECT bucket,
           (sum(tot) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tot)
               AS bucket_offset
    FROM bt
),
pos AS (
    SELECT c.doc_id, c.n_tokens,
           (o.bucket_offset + c.cum_in_bucket - c.n_tokens)::BIGINT
               AS start_offset
    FROM cum c JOIN boff o USING (bucket)
)
"""


@query(
    "sequence_packing",
    f"""
    WITH {_STREAM_SQL}
    SELECT doc_id, n_tokens, start_offset,
           (start_offset // 512)::BIGINT AS first_chunk,
           ((start_offset + greatest(n_tokens, 1) - 1) // 512)::BIGINT
               AS last_chunk
    FROM pos
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing (llm/packing.py): each doc's
    span of 512-token context windows in the deterministic global
    token stream, via the scalable two-level prefix sum (no global
    single-partition window)."""
    return packing.pack_concat_chunks(_docs(spark, sf_dir), ctx_tokens=512)


@query(
    "shard_assignments",
    """
    WITH h AS (
        SELECT doc_id,
               ('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT AS h
        FROM documents
    )
    SELECT doc_id, (h % 16)::BIGINT AS shard,
           cast(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
)
def shard_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-parallel loader layout: pseudorandom shard + deterministic
    within-shard position (llm/packing.py:shard_assignments)."""
    return packing.shard_assignments(_docs(spark, sf_dir), n_shards=16)


@query(
    "length_percentiles",
    """
    WITH t AS (
        SELECT source,
               len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
                   AS n_tokens
        FROM documents
    )
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_tokens, 0.5), 4) AS p50,
           round(quantile_cont(n_tokens, 0.9), 4) AS p90,
           round(quantile_cont(n_tokens, 0.99), 4) AS p99
    FROM t GROUP BY source
    """,
)
def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution (exact interpolated
    percentiles — the curation dashboard's length histogram). Scale
    path: swap F.percentile for approx_percentile (t-digest sketch,
    mergeable map-side) with the same output shape."""
    d = _docs(spark, sf_dir)
    tok = token_count_ws(F.col("text"))
    return d.select("source", tok.alias("n_tokens")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_tokens", F.lit(0.99)), 4).alias("p99"),
    )


def _leakage_safe_split_sql() -> str:
    """Oracle for ``curation.cluster_aware_split`` over the standard
    0.8-Jaccard near-dup clusters: composes the registered
    ``near_dup_clusters`` closure (llm_evals.py pattern) with the
    ``dataset_split`` hash-bucket rule, keyed on the GROUP id.
    Written and parity-tested in round 8
    (tests/test_llm_ops.py::test_cluster_aware_split_matches_oracle);
    registered as the ``cluster_aware_split`` driver pair in round 9."""
    from . import llm_dedup_gates  # noqa: F401 — registers the closure
    from .analytics import ORACLE

    h = _H48.format(x="'split:' || gid::VARCHAR")
    return f"""
    WITH nc AS (SELECT * FROM ({ORACLE["near_dup_clusters"]})),
    g AS (
        SELECT d.doc_id, coalesce(nc.cluster_id, d.doc_id) AS gid
        FROM documents d LEFT JOIN nc ON nc.doc_id = d.doc_id
    )
    SELECT doc_id,
           CASE WHEN h < 90 THEN 'train'
                WHEN h < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, ({h}) % 100 AS h FROM g)
    """


@query(
    "quality_classifier_scores",
    f"""
    WITH w AS (
        SELECT b::BIGINT AS bucket, ((b % 1001) - 500)::BIGINT AS wt_m
        FROM range(4096) t(b)
    ),
    tk AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          t -> t != '')) AS word
        FROM documents
    ),
    h AS (SELECT doc_id, ({_H48.format(x='word')}) % 4096 AS bucket FROM tk),
    s AS (
        SELECT h.doc_id, count(*)::BIGINT AS n_tokens,
               round(10.0 * sum(w.wt_m) / count(*), 0)::BIGINT / 10000.0
                   AS logit
        FROM h JOIN w USING (bucket) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(s.logit, 0.0) AS logit,
           coalesce(s.logit, 0.0) > 0 AS label
    FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    """,
)
def quality_classifier_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear classifier INFERENCE over the full
    corpus (llm/classify.py:hashed_linear_scores) — the GPT-3/LLaMA-
    lineage quality-filter pass, as one narrow pass + broadcast join +
    map-side mean.  The gate synthesizes a deterministic 4096-bucket
    weight table (integer milli-weights (b % 1001) - 500) on BOTH
    engines, so every logit is a pure function of the md5 token hashes
    — exact integer sums, one double division — and the full per-doc
    score table is hashed (token-less docs score the bias)."""
    from ..llm.classify import hashed_linear_scores

    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 1001) - 500).cast("long").alias("wt_m"),
    )
    return hashed_linear_scores(
        _docs(spark, sf_dir), weights, bias=0.0, n_buckets=4096
    )


@query(
    "dsir_importance_weights",
    f"""
    WITH tk AS (
        SELECT doc_id, source,
               unnest(list_filter(string_split(text, ' '),
                                  t -> t != '')) AS word
        FROM documents
    ),
    h AS (
        SELECT doc_id, source, ({_H48.format(x='word')}) % 4096 AS bucket
        FROM tk
    ),
    ct AS (SELECT bucket, count(*)::BIGINT AS n FROM h
           WHERE source = 'src0' GROUP BY 1),
    cs AS (SELECT bucket, count(*)::BIGINT AS n FROM h GROUP BY 1),
    nt AS (SELECT count(*)::DOUBLE AS n FROM h WHERE source = 'src0'),
    ns AS (SELECT count(*)::DOUBLE AS n FROM h),
    r AS (
        SELECT b.b::BIGINT AS bucket,
               round((ln((coalesce(ct.n, 0) + 1.0) / (nt.n + 4096))
                      - ln((coalesce(cs.n, 0) + 1.0) / (ns.n + 4096)))
                     * 10000.0, 0)::BIGINT AS lr_e4
        FROM range(4096) b(b)
        LEFT JOIN ct ON ct.bucket = b.b
        LEFT JOIN cs ON cs.bucket = b.b, nt, ns
    ),
    s AS (
        SELECT h.doc_id, count(*)::BIGINT AS n_tokens,
               round(sum(r.lr_e4) / 10000.0, 4) AS log_weight
        FROM h JOIN r USING (bucket) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(s.log_weight, 0.0) AS log_weight
    FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
    """,
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (llm/classify.py:dsir_log_weights,
    arXiv:2302.03169): per-doc sum of add-1-smoothed hashed-unigram
    log-ratios between a TARGET corpus (source = 'src0' — the
    "domain I want more of") and the raw corpus.  Per-bucket ratios
    quantize to integer 1e-4 units (one ln difference each, the
    bigram_pmi single-ln discipline), so the doc sum is exact integer
    arithmetic on both engines; the full per-doc weight table is
    hashed."""
    from ..llm.classify import dsir_bucket_log_ratios, dsir_log_weights

    d = _docs(spark, sf_dir)
    ratios = dsir_bucket_log_ratios(
        d, d.filter(F.col("source") == "src0"), n_buckets=4096
    )
    return dsir_log_weights(d, ratios, n_buckets=4096)


@query("cluster_aware_split", _leakage_safe_split_sql())
def cluster_aware_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (llm/curation.py:
    cluster_aware_split): every member of a 0.8-Jaccard near-dup
    cluster follows its CLUSTER representative's hash bucket, so
    near-duplicates can never straddle train and test — the
    eval-contamination guard a per-document split silently violates.
    The oracle composes the registered ``near_dup_clusters`` closure
    with the ``dataset_split`` hash-bucket rule keyed on the group
    id, so a regression in the clusterer, the group coalesce, or the
    bucketing breaks the hash on the full assignment table."""
    from ..llm import dedup
    from ..llm.curation import cluster_aware_split

    d = _docs(spark, sf_dir).select("doc_id", "text")
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.8)
    clusters = dedup.dup_clusters(pairs)
    return cluster_aware_split(d, clusters).select("doc_id", "split")


@query(
    "curriculum_order",
    """
    WITH s AS (
        SELECT doc_id, round((doc_id % 97) / 96.0, 4) AS quality_score
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               least(3, greatest(0,
                   cast(floor((1.0 - quality_score) * 4) AS INT))) AS bucket,
               ('0x' || substring(md5(doc_id::VARCHAR), 1, 12))::BIGINT
                   AS salt
        FROM s
    )
    SELECT doc_id, bucket,
           cast(row_number() OVER (PARTITION BY bucket
                                   ORDER BY salt, doc_id) - 1 AS BIGINT)
               AS position
    FROM b
    """,
)
def curriculum_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering (llm/curation.py:
    curriculum_order): threshold-bucket a [0,1] quality score into 4
    bands (cleanest first) and rank each document within its band by
    the portable hash of its id — a reproducible shuffled epoch
    order.  The substrate attaches an arithmetic score
    ((doc_id % 97) / 96, 4dp) so DuckDB replays the banding, the
    hash salt, and the full per-band rank; the rank window partitions
    by band (parallel), never a global sort."""
    from ..llm.curation import curriculum_order

    d = _docs(spark, sf_dir).withColumn(
        "quality_score", F.round((F.col("doc_id") % 97) / 96.0, 4)
    )
    return curriculum_order(d).select("doc_id", "bucket", "position")
