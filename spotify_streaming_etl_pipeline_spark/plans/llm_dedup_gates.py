"""Oracle-gated queries for the dedup family (llm/dedup.py): exact /
canonical hash dedup, n-gram Jaccard (plain, capped, containment),
MinHash-LSH, SimHash, connected-component clustering, quality-aware
keeper selection, and incremental batch-vs-corpus admission.

Shared DuckDB fragments live in ``llm_shared``; scale notes live in
the llm/ modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup
from ..llm.text import STOPWORDS, fingerprint_table
from .analytics import query
from .llm_shared import (
    _H48,
    _JACCARD_PAIRS,
    _MINHASH_BANDS,
    _NG_CTE,
    _docs,
    _sql_list,
)


@query(
    "exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           cast(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(_docs(spark, sf_dir))


@query(
    "canonical_dedup",
    """
    WITH c AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS canon_hash
        FROM documents
    )
    SELECT canon_hash, min(doc_id) AS keeper_doc_id,
           cast(count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY 1 HAVING count(*) > 1
    """,
)
def canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.canonical_dedup_groups(_docs(spark, sf_dir))


@query(
    "ngram_jaccard_dedup",
    f"""
    WITH {_NG_CTE}, {_JACCARD_PAIRS}
    SELECT doc_a, doc_b, jaccard FROM jacc WHERE jaccard >= 0.8
    """,
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default cap (1000) cannot bite at gate scale (500 docs at
    sf0.01 caps df at 500), so the uncapped oracle is exact here; the
    cap path itself is oracle-proven by ngram_jaccard_capped."""
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


@query(
    "containment_pairs",
    f"""
    WITH {_NG_CTE},
    cont AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.ng, b.ng))::DOUBLE
                     / least(len(a.ng), len(b.ng)), 4) AS containment
        FROM g a JOIN g b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, containment FROM cont WHERE containment >= 0.6
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection (llm/dedup.py:containment_pairs):
    overlap coefficient |A∩B|/min(|A|,|B|) over the same shingle
    space as the Jaccard gate — catches the short-doc-quoted-in-long
    dup class a symmetric threshold misses. 0.6 keeps the gate
    non-vacuous at sf0.01 (strictly more pairs than jaccard >= 0.6
    would admit, because min() <= the union size)."""
    return dedup.containment_pairs(_docs(spark, sf_dir), threshold=0.6)


# Hash-keyed posting-table form of the capped similarity family: df
# computed on the same 48-bit md5-prefix key Spark uses, so
# hot-shingle membership is bit-identical across engines even under
# (vanishing) collisions. Shared by the Jaccard and containment gates
# — only the final scalar formula differs, exactly like the Spark
# side (dedup.posting_buckets / bucket_shared_counts feed both).
_CAPPED_POSTING = """
posting AS (
    SELECT doc_id, ('0x' || substring(md5(gram), 1, 12))::BIGINT AS h1
    FROM (SELECT doc_id, unnest(ng) AS gram FROM g)
),
freq AS (SELECT h1, count(*) AS df FROM posting GROUP BY 1),
capped AS (
    SELECT p.doc_id, p.h1
    FROM posting p JOIN freq f USING (h1) WHERE f.df <= {cap}
),
sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(count(*) AS BIGINT) AS n_shared
    FROM capped a JOIN capped b ON a.h1 = b.h1 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)"""

_CAPPED_JACCARD = (
    _CAPPED_POSTING
    + """,
cj AS (
    SELECT s.doc_a, s.doc_b,
           round(s.n_shared::DOUBLE / (sa.n + sb.n - s.n_shared), 4) AS jaccard
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc_id
    JOIN sizes sb ON s.doc_b = sb.doc_id
)
"""
)

_CAPPED_CONTAINMENT = (
    _CAPPED_POSTING
    + """,
cc AS (
    SELECT s.doc_a, s.doc_b,
           round(s.n_shared::DOUBLE / least(sa.n, sb.n), 4) AS containment
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc_id
    JOIN sizes sb ON s.doc_b = sb.doc_id
)
"""
)

# Aggressive on purpose: at sf0.01 max shingle df is 7, so this cap
# drops ~2.3k hot shingles and shifts the pair set (25 -> 22) — the
# gate exercises the cap, it isn't a vacuous pass-through.
_NG_CAP = 2


@query(
    "ngram_jaccard_capped",
    f"""
    WITH {_NG_CTE}, {_CAPPED_JACCARD.format(cap=_NG_CAP)}
    SELECT doc_a, doc_b, jaccard FROM cj WHERE jaccard >= 0.8
    """,
)
def ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shingle document-frequency cap (llm/dedup.py:cap_doc_freq)
    under oracle proof: Jaccard over shingles with df <= 2, mirrored
    hash-for-hash by the DuckDB posting CTE. The cap is the skew guard
    that keeps the inverted-index self-join bounded at corpus scale."""
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.8, max_doc_freq=_NG_CAP
    )


@query(
    "containment_capped",
    f"""
    WITH {_NG_CTE}, {_CAPPED_CONTAINMENT.format(cap=_NG_CAP)}
    SELECT doc_a, doc_b, containment FROM cc WHERE containment >= 0.6
    """,
)
def containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df cap on the containment form (llm/dedup.py:
    containment_pairs(max_doc_freq=...)) under oracle proof, same
    capped posting CTE as ngram_jaccard_capped. The cap matters more
    for containment than Jaccard: min() in the denominator means one
    hot boilerplate shingle makes every short doc look contained in
    everything — df <= 2 drops exactly the shingles whose pair
    fan-out the inverted index couldn't afford anyway."""
    return dedup.containment_pairs(
        _docs(spark, sf_dir), threshold=0.6, max_doc_freq=_NG_CAP
    )


@query(
    "near_dup_clusters",
    f"""
    WITH RECURSIVE {_NG_CTE.lstrip()}, {_JACCARD_PAIRS},
    p AS (SELECT doc_a, doc_b FROM jacc WHERE jaccard >= 0.8),
    e AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
    reach AS (
        SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
        UNION
        SELECT e.v AS u, r.lbl FROM reach r JOIN e ON e.u = r.u
    )
    SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> keeper groups (the
    final dedup step: keep doc_id == cluster_id). The DuckDB oracle is
    the recursive-CTE transitive closure of the same pair graph."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)
    return dedup.dup_clusters(pairs)


@query(
    "minhash_lsh_dedup",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS}
    SELECT doc_a, doc_b FROM cands
    """,
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir))


@query(
    "minhash_near_dup",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS}, {_JACCARD_PAIRS}
    SELECT j.doc_a, j.doc_b, j.jaccard
    FROM cands c JOIN jacc j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
    WHERE j.jaccard >= 0.8
    """,
)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_near_dup(_docs(spark, sf_dir), threshold=0.8)


# SimHash fingerprint CTE chain (g -> h -> fp), shared by the simhash
# gates below.
_SIMHASH_FP = f"""
    h AS (
        SELECT doc_id,
               list_transform(ng, gr -> {_H48.format(x="gr")}) AS gh
        FROM g
    ),
    fp AS (
        SELECT doc_id,
               list_sum(list_transform(range(0, 48), j ->
                   CASE WHEN list_sum(list_transform(gh, x ->
                            CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS simhash
        FROM h
    )"""


@query(
    "simhash_dedup",
    f"""
    WITH {_NG_CTE}, {_SIMHASH_FP}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dup(_docs(spark, sf_dir), max_distance=3)


@query(
    "minhash_star_guard",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS},
    stats AS (
        SELECT band, key, count(*) AS m, min(doc_id) AS rep
        FROM bands GROUP BY band, key
    ),
    mk AS (
        SELECT b.doc_id, b.band, b.key, s.m, s.rep
        FROM bands b JOIN stats s ON b.band = s.band AND b.key = s.key
    ),
    guarded AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM mk x JOIN mk y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        WHERE x.m <= 2
        UNION ALL
        SELECT rep AS doc_a, doc_id AS doc_b FROM mk
        WHERE m > 2 AND doc_id <> rep
    )
    SELECT DISTINCT doc_a, doc_b FROM guarded
    """,
)
def minhash_star_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The giant-LSH-bucket star guard (llm/dedup.py:
    minhash_lsh_candidates(max_bucket_size=...)) under oracle proof
    with a cap the data EXCEEDS (2 < the sf0.01 max bucket of 3):
    oversized buckets emit (bucket-min -> member) star edges, small
    buckets keep the full pair join — the DuckDB oracle mirrors the
    split hash-for-hash. Production cap is LSH_MAX_BUCKET; this gate
    pins the firing path, the never-firing path is pinned byte-equal
    to the unguarded plan by the planted-bucket unit."""
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir), max_bucket_size=2)


@query(
    "simhash_star_guard",
    f"""
    WITH {_NG_CTE}, {_SIMHASH_FP},
    ch AS (
        SELECT doc_id, simhash, c AS chunk,
               (simhash >> (12 * c)) & 4095 AS val
        FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS c) t
    ),
    stats AS (
        SELECT chunk, val, count(*) AS m, min(doc_id) AS rep,
               arg_min(simhash, doc_id) AS rep_sh
        FROM ch GROUP BY chunk, val
    ),
    mk AS (
        SELECT ch.doc_id, ch.simhash, ch.chunk, ch.val, s.m, s.rep, s.rep_sh
        FROM ch JOIN stats s ON ch.chunk = s.chunk AND ch.val = s.val
    ),
    pr AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               x.simhash AS sh_a, y.simhash AS sh_b
        FROM mk x JOIN mk y
          ON x.chunk = y.chunk AND x.val = y.val AND x.doc_id < y.doc_id
        WHERE x.m <= 2
        UNION ALL
        SELECT rep, doc_id, rep_sh, simhash FROM mk
        WHERE m > 2 AND doc_id <> rep
    )
    SELECT DISTINCT doc_a, doc_b,
           cast(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
    FROM pr WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def simhash_star_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simhash chunk-bucket star guard (llm/dedup.py:
    simhash_near_dup(max_bucket_size=...)) with a firing cap: chunk
    buckets over the cap reduce to representative star edges with
    exact per-pair hamming. Same arg_min representative (bucket-min
    doc id) on both engines."""
    return dedup.simhash_near_dup(
        _docs(spark, sf_dir), max_distance=3, max_bucket_size=2
    )


@query(
    "admission_decisions",
    f"""
    WITH RECURSIVE {_NG_CTE.lstrip()}, {_MINHASH_BANDS},
    rejc AS (
        SELECT DISTINCT y.doc_id
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        JOIN g a ON a.doc_id = x.doc_id
        JOIN g b2 ON b2.doc_id = y.doc_id
        WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
          AND round(len(list_intersect(a.ng, b2.ng))::DOUBLE
                / (len(a.ng) + len(b2.ng) - len(list_intersect(a.ng, b2.ng))),
                4) >= 0.8
    ),
    surv AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM rejc)
    ),
    sp AS (
        SELECT c.doc_a, c.doc_b
        FROM (
            SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
            WHERE x.doc_id IN (SELECT doc_id FROM surv)
              AND y.doc_id IN (SELECT doc_id FROM surv)
        ) c
        JOIN g a ON a.doc_id = c.doc_a
        JOIN g b2 ON b2.doc_id = c.doc_b
        WHERE round(len(list_intersect(a.ng, b2.ng))::DOUBLE
                / (len(a.ng) + len(b2.ng) - len(list_intersect(a.ng, b2.ng))),
                4) >= 0.8
    ),
    e AS (SELECT doc_a AS u, doc_b AS v FROM sp
          UNION SELECT doc_b, doc_a FROM sp),
    reach AS (
        SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
        UNION
        SELECT e.v AS u, r.lbl FROM reach r JOIN e ON e.u = r.u
    ),
    comp AS (SELECT u AS doc_id, min(lbl) AS cluster_id
             FROM reach GROUP BY u),
    nk AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
    SELECT b.doc_id,
           CASE WHEN b.doc_id IN (SELECT doc_id FROM rejc)
                    THEN 'rejected_corpus_dup'
                WHEN b.doc_id IN (SELECT doc_id FROM nk)
                    THEN 'rejected_batch_dup'
                ELSE 'admitted' END AS decision
    FROM documents b WHERE b.doc_id % 5 = 0
    """,
)
def admission_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming admission sink's DECISION TABLE, oracle-gated on
    the exact code path the sink executes (streaming/admission.py:
    _decide, shared by admit_batch): one row per batch doc with its
    admit/reject verdict and reason. The oracle replays the whole
    state machine in SQL — corpus-band rejection with exact-Jaccard
    verify, survivor set, intra-batch LSH candidates, recursive-CTE
    connected components, cluster-min keeper election. The mod-5
    corpus/batch split keeps ids disjoint, so the redelivery decision
    ('rejected_known_id') never fires here — it is unit-pinned by
    test_redelivered_doc_id_not_duplicated_in_corpus instead."""
    from ..streaming.admission import admission_decisions as decide

    d = _docs(spark, sf_dir)
    return decide(
        d.filter(F.col("doc_id") % 5 == 0),
        d.filter(F.col("doc_id") % 5 != 0),
        threshold=0.8,
    )


@query(
    "index_incremental_near_dup",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS},
    ic AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
    ),
    iv AS (
        SELECT ic.doc_a, ic.doc_b,
               round(len(list_intersect(a.ng, b.ng))::DOUBLE
                     / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
                     4) AS jaccard
        FROM ic JOIN g a ON a.doc_id = ic.doc_a
                JOIN g b ON b.doc_id = ic.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM iv WHERE jaccard >= 0.8
    """,
)
def index_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED-index admission path end to end (llm/
    dedup_index.py): the corpus (doc_id % 5 != 0) is written to a
    parquet posting + band index as TWO batch partitions, then the
    new batch (doc_id % 5 == 0) is checked against the loaded index —
    and must hash-identically reproduce the in-flight
    ``incremental_near_dup`` SQL, proving the stored index is the
    same computation. Every run REWRITES the same index path with the
    same batch ids, so the dynamic-partition idempotent-retry
    contract is exercised on each execution, not just in units."""
    import hashlib
    import tempfile

    from ..llm import dedup_index

    d = _docs(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    path = "{}/spark_graft_dedup_index_{}".format(
        tempfile.gettempdir(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    dedup_index.write_dedup_index(
        corpus.filter(F.col("doc_id") % 2 == 0), path, batch_id=0
    )
    dedup_index.write_dedup_index(
        corpus.filter(F.col("doc_id") % 2 != 0), path, batch_id=1
    )
    return dedup_index.check_batch_against_index(
        spark, d.filter(F.col("doc_id") % 5 == 0), path, threshold=0.8
    )


@query(
    "incremental_star_guard",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS},
    cb AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 5 <> 0),
    nb AS (SELECT doc_id, band, key FROM bands WHERE doc_id % 5 = 0),
    stats AS (
        SELECT band, key, count(*) AS m, min(doc_id) AS rep
        FROM cb GROUP BY band, key
    ),
    cbg AS (
        SELECT cb.doc_id, cb.band, cb.key
        FROM cb JOIN stats s ON cb.band = s.band AND cb.key = s.key
        WHERE s.m <= 1 OR cb.doc_id = s.rep
    ),
    ic AS (
        SELECT DISTINCT c.doc_id AS doc_a, n.doc_id AS doc_b
        FROM cbg c JOIN nb n ON c.band = n.band AND c.key = n.key
        WHERE c.doc_id <> n.doc_id
    ),
    iv AS (
        SELECT ic.doc_a, ic.doc_b,
               round(len(list_intersect(a.ng, b.ng))::DOUBLE
                     / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
                     4) AS jaccard
        FROM ic JOIN g a ON a.doc_id = ic.doc_a
                JOIN g b ON b.doc_id = ic.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM iv WHERE jaccard >= 0.8
    """,
)
def incremental_star_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-corpus-bucket guard on batch admission (llm/dedup.py:
    minhash_incremental(max_bucket_size=...)) with a cap of 1, so
    EVERY multi-member corpus bucket thins to its representative: a
    colliding batch doc is reported as a duplicate of the bucket-min
    corpus doc only. This is the guard streaming/admission.py runs
    with (at LSH_MAX_BUCKET); the oracle mirrors the thinning before
    the corpus-vs-batch band join and the exact-Jaccard verify."""
    d = _docs(spark, sf_dir)
    new_batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    posting = dedup._posting(d, "text").persist()
    return dedup.minhash_incremental(
        new_batch,
        corpus,
        threshold=0.8,
        max_bucket_size=1,
        _corpus_posting_df=posting.filter(F.col("doc_id") % 5 != 0),
        _new_posting_df=posting.filter(F.col("doc_id") % 5 == 0),
    )


@query(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           CASE WHEN length(text) >= 16 THEN
               list_min(list_transform(range(1, length(text) - 14),
                   i -> {_H48.format(x="substring(text, i, 16)")}))
           ELSE {_H48.format(x="text")} END AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint_table(_docs(spark, sf_dir))


@query(
    "cluster_keepers",
    f"""
    WITH RECURSIVE {_NG_CTE.lstrip()}, {_JACCARD_PAIRS},
    p AS (SELECT doc_a, doc_b FROM jacc WHERE jaccard >= 0.8),
    e AS (SELECT doc_a AS u, doc_b AS v FROM p
          UNION SELECT doc_b, doc_a FROM p),
    reach AS (
        SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM e)
        UNION
        SELECT e.v AS u, r.lbl FROM reach r JOIN e ON e.u = r.u
    ),
    cl AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u),
    t AS (
        SELECT doc_id, text,
               list_filter(string_split(text, ' '), x -> x != '') AS w,
               length(text) AS nc
        FROM documents
    ),
    qs AS (
        SELECT doc_id,
               round(least(len(w) / 64.0, 1.0) * 0.5
                 + (1 - coalesce(round((nc - length(regexp_replace(text,
                       '[^a-z ]', '', 'g'))) / nullif(nc, 0), 3), 0.0)) * 0.3
                 + least(coalesce(round(len(list_filter(w, x ->
                       list_contains({_sql_list(STOPWORDS)}, x)))
                       / nullif(len(w), 0), 3), 0.0) * 4, 1.0) * 0.2,
                 3) AS q
        FROM t
    ),
    ranked AS (
        SELECT cl.cluster_id, cl.doc_id, qs.q,
               row_number() OVER (PARTITION BY cl.cluster_id
                   ORDER BY qs.q DESC, cl.doc_id) AS rn,
               count(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
        FROM cl JOIN qs USING (doc_id)
    )
    SELECT cluster_id, doc_id AS keeper_doc_id, q AS keeper_score,
           cast(n_docs AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1
    """,
)
def cluster_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper selection: near-dup clusters keep
    their highest-quality member (not min doc_id) — the form a real
    curation pipeline uses. Composition: pair detection -> connected
    components -> join quality scores -> per-cluster argmax."""
    from pyspark.sql import Window

    from ..llm.text import quality_metrics

    d = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.8)
    clusters = dedup.dup_clusters(pairs)
    # Join FIRST, score after: clustered docs are a small fraction of
    # the corpus, and the quality projection (several regexes over the
    # full text) sat below the join, scoring every document to rank
    # the few that clustered.  The inner join keeps the same rows, and
    # quality is per-doc deterministic, so the ranking is unchanged.
    joined = clusters.join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "cluster_id",
        quality_metrics(F.col("text"))["quality_score"].alias("q"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("q"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_docs",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("q").alias("keeper_score"),
            "n_docs",
        )
    )


@query(
    "incremental_near_dup",
    f"""
    WITH {_NG_CTE}, {_MINHASH_BANDS},
    ic AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
        WHERE x.doc_id % 5 <> 0 AND y.doc_id % 5 = 0
    ),
    iv AS (
        SELECT ic.doc_a, ic.doc_b,
               round(len(list_intersect(a.ng, b.ng))::DOUBLE
                     / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
                     4) AS jaccard
        FROM ic JOIN g a ON a.doc_id = ic.doc_a
                JOIN g b ON b.doc_id = ic.doc_b
    )
    SELECT doc_a, doc_b, jaccard FROM iv WHERE jaccard >= 0.8
    """,
)
def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus near-dup admission check (llm/dedup.py:
    minhash_incremental): the 'new batch' (doc_id % 5 == 0) joins the
    corpus band index; no corpus self-join ever runs. The oracle
    mirrors the split, the band join, and the exact-Jaccard verify."""
    d = _docs(spark, sf_dir)
    new_batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    # Both splits come from one table here, so tokenize/shingle ONCE
    # and split the posting by the same predicate (posting carries
    # doc_id) — halves the heavy stage vs two independent builds.
    posting = dedup._posting(d, "text").persist()
    return dedup.minhash_incremental(
        new_batch,
        corpus,
        threshold=0.8,
        _corpus_posting_df=posting.filter(F.col("doc_id") % 5 != 0),
        _new_posting_df=posting.filter(F.col("doc_id") % 5 == 0),
    )
