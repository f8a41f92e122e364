"""Oracle-gated queries for the LLM-data-pipeline operators (llm/*).

Every query pairs the Spark plan with DuckDB SQL that reproduces it
EXACTLY — possible because all hashing goes through the portable
48-bit md5-prefix hash (llm/text.py:portable_hash48) that both engines
compute bit-identically, and all floating-point outputs are rounded.

The pairs here are the correctness contract for dedup / similarity /
text-analysis / multimodal; scale notes live in the llm/ modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup, multimodal, similarity
from ..llm.text import (
    LANG_LEXICONS,
    STOPWORDS,
    fingerprint_table,
    lang_id,
    quality_metrics,
    token_count_bpe,
    token_count_ws,
)
from ..sources.catalog import load_table, rebalance
from .analytics import ORACLE, query

# --- shared DuckDB fragments -------------------------------------------------

_H48 = "('0x' || substring(md5({x}), 1, 12))::BIGINT"

# distinct word-3-gram shingles per doc (docs with >= 3 words)
_NG_CTE = """
toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
    FROM documents
),
g AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(w) - 1),
               i -> w[i] || '|' || w[i+1] || '|' || w[i+2])) AS ng
    FROM toks WHERE len(w) >= 3
)
"""

_JACCARD_PAIRS = """
jacc AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.ng, b.ng))::DOUBLE
                 / (len(a.ng) + len(b.ng) - len(list_intersect(a.ng, b.ng))),
                 4) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
)
"""

_MINHASH_BANDS = f"""
sig AS (
    SELECT doc_id,
           list_transform(range(0, 16), i ->
               list_min(list_transform(ng, gr ->
                   (({_H48.format(x="gr")})
                    + i * (('0x' || substring(md5(gr), 13, 12))::BIGINT))
                   & 281474976710655))) AS s
    FROM g
),
bands AS (
    SELECT doc_id, band,
           s[4*band+1]::VARCHAR || ',' || s[4*band+2]::VARCHAR || ',' ||
           s[4*band+3]::VARCHAR || ',' || s[4*band+4]::VARCHAR AS key
    FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b
),
cands AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table rebalances under-split scans so the shingle/hash
    # stages fan out across all cores (no-op on well-split inputs).
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- dedup family ------------------------------------------------------------


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


# Hash-keyed posting-table form of the capped Jaccard: df computed on
# the same 48-bit md5-prefix key Spark uses, so hot-shingle membership
# is bit-identical across engines even under (vanishing) collisions.
_CAPPED_JACCARD = """
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
),
cj AS (
    SELECT s.doc_a, s.doc_b,
           round(s.n_shared::DOUBLE / (sa.n + sb.n - s.n_shared), 4) AS jaccard
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc_id
    JOIN sizes sb ON s.doc_b = sb.doc_id
)
"""

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


@query(
    "simhash_dedup",
    f"""
    WITH {_NG_CTE},
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
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_dup(_docs(spark, sf_dir), max_distance=3)


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


# --- text analysis -----------------------------------------------------------


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_LANG_SCORES_SQL = ",\n".join(
    f"len(list_intersect(dw, {_sql_list(lex)})) AS score_{lang}"
    for lang, lex in LANG_LEXICONS.items()
)
_BEST = "greatest(score_en, score_es, score_de, score_fr, score_zh)"
_LANG_CASE = (
    f"CASE WHEN {_BEST} = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = {_BEST} THEN '{lang}'" for lang in LANG_LEXICONS
    )
    + " ELSE 'und' END"
)


@query(
    "text_quality",
    f"""
    WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split(text, ' '), x -> x != '') AS w,
               list_distinct(list_filter(string_split(text, ' '), x -> x != '')) AS dw,
               length(text) AS nc
        FROM documents
    ),
    s AS (
        SELECT doc_id, text, w, nc,
               {_LANG_SCORES_SQL},
               len(w)::BIGINT AS n_tokens_ws,
               len(regexp_extract_all(text, '[a-z]{{1,4}}|[^a-z ]'))::BIGINT
                   AS n_tokens_bpe,
               len(list_filter(w, x -> list_contains({_sql_list(STOPWORDS)}, x)))::BIGINT
                   AS n_stopwords,
               (nc - length(regexp_replace(text, '[^a-z ]', '', 'g')))::BIGINT AS n_sym
        FROM t
    )
    SELECT doc_id, n_tokens_ws, n_tokens_bpe,
           {_LANG_CASE} AS lang_pred,
           n_stopwords,
           round((nc - (n_tokens_ws - 1)) / nullif(n_tokens_ws, 0), 3) AS avg_token_len,
           round(n_stopwords / nullif(n_tokens_ws, 0), 3) AS stopword_ratio,
           round(n_sym / nullif(nc, 0), 3) AS symbol_ratio,
           round(least(n_tokens_ws / 64.0, 1.0) * 0.5
                 + (1 - coalesce(round(n_sym / nullif(nc, 0), 3), 0.0)) * 0.3
                 + least(coalesce(round(n_stopwords / nullif(n_tokens_ws, 0), 3), 0.0) * 4,
                         1.0) * 0.2,
                 3) AS quality_score
    FROM s
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    c = F.col("text")
    m = quality_metrics(c)
    return d.select(
        "doc_id",
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        lang_id(c).alias("lang_pred"),
        m["n_stopwords"].alias("n_stopwords"),
        m["avg_token_len"].alias("avg_token_len"),
        m["stopword_ratio"].alias("stopword_ratio"),
        m["symbol_ratio"].alias("symbol_ratio"),
        m["quality_score"].alias("quality_score"),
    )


@query(
    "vocab_stats",
    """
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        FROM documents
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
    SELECT token,
           count(DISTINCT doc_id)::BIGINT AS doc_freq,
           cast(count(*) AS BIGINT) AS term_freq,
           round(ln(n / count(DISTINCT doc_id)), 4) AS idf
    FROM tok, nd
    GROUP BY token, n
    """,
)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document/term frequency and idf — the
    input table for tokenizer training and tf-idf weighting."""
    from ..llm.text import vocab_stats as _vs

    return _vs(_docs(spark, sf_dir))


# --- similarity search -------------------------------------------------------

_QUERY_IDS = [0, 1, 2, 3, 4]


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round({_dot_sql(a, b)} / "
        f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})), 4)"
    )


@query(
    "ann_topk",
    f"""
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
        WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    p AS (
        SELECT q.q_id, e.vec_id, {_cos_sql('e.embedding', 'q.q_vec')} AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
        FROM p
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(_emb(spark, sf_dir), _QUERY_IDS, k=5)


def _bucket_sql(vec: str) -> str:
    terms = []
    for p, w in enumerate(similarity.plane_weights()):
        lit = "[" + ", ".join(f"{x:.1f}" for x in w) + "]"
        terms.append(
            f"CASE WHEN {_dot_sql(vec, lit)} > 0 THEN {1 << p} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "ann_topk_lsh",
    f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM b
        WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    p AS (
        SELECT q.q_id, b.vec_id, {_cos_sql('b.embedding', 'q.q_vec')} AS cosine
        FROM b JOIN q ON b.bucket = q.bucket
        WHERE b.vec_id <> q.q_id
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
        FROM p
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk_lsh(_emb(spark, sf_dir), _QUERY_IDS, k=5)


@query(
    "ann_join_topk",
    f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM b
        WHERE vec_id % 40 = 0
    ),
    c AS (SELECT * FROM b WHERE vec_id % 40 <> 0),
    p AS (
        SELECT q.q_id, c.vec_id, {_cos_sql('c.embedding', 'q.q_vec')} AS cosine
        FROM c JOIN q ON c.bucket = q.bucket
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
        FROM p
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table ANN retrieval (llm/similarity.py:ann_join): the query
    TABLE (vec_id % 40 == 0) joins a disjoint corpus table through the
    LSH bucket index — the batch-serving shape where both sides are
    DataFrames, not an id list.  The oracle replays the same split,
    buckets, and tie rules."""
    emb = _emb(spark, sf_dir)
    return similarity.ann_join(
        emb.filter(F.col("vec_id") % 40 == 0),
        emb.filter(F.col("vec_id") % 40 != 0),
        k=5,
    )


_IVF_CELLS = 8
_IVF_PROBE = 2


@query(
    "ann_topk_ivf",
    f"""
    WITH dims AS (
        SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
    ),
    cents AS (
        SELECT (vec_id % {_IVF_CELLS}) AS cell, dim, round(avg(x), 4) AS c
        FROM dims GROUP BY 1, 2
    ),
    d2 AS (
        SELECT d.vec_id, ct.cell,
               round(sum((d.x - ct.c) * (d.x - ct.c)), 4) AS d2
        FROM dims d JOIN cents ct ON d.dim = ct.dim
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM d2
    ),
    assigned AS (SELECT vec_id, cell FROM rc WHERE rn = 1),
    probes AS (
        SELECT vec_id AS q_id, cell FROM rc
        WHERE vec_id IN (0, 1, 2, 3, 4) AND rn <= {_IVF_PROBE}
    ),
    pairs AS (
        SELECT p.q_id, a.vec_id,
               {_cos_sql('e.embedding', 'qe.embedding')} AS cosine
        FROM probes p
        JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.q_id
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.q_id
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
        FROM pairs
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (hash-seeded deterministic centroids) under oracle
    proof — same probe/assign join shape as the learned-KMeans
    ivf_topk, which stays unit-gated (llm/similarity.py docstrings)."""
    return similarity.ivf_topk_hashseed(
        _emb(spark, sf_dir),
        _QUERY_IDS,
        k=5,
        n_centroids=_IVF_CELLS,
        n_probe=_IVF_PROBE,
    )


def _ivf_centroid_values() -> str:
    from ..llm.ivf_fixture import IVF_CENTROIDS

    return ",\n            ".join(
        f"({cell}, {dim}, {c})"
        for cell, row in enumerate(IVF_CENTROIDS)
        for dim, c in enumerate(row)
    )


@query(
    "ann_topk_ivf_learned",
    f"""
    WITH cents AS (
        SELECT cell, dim, c::DOUBLE AS c FROM (VALUES
            {_ivf_centroid_values()}
        ) AS t(cell, dim, c)
    ),
    dims AS (
        SELECT vec_id, i - 1 AS dim, embedding[i]::DOUBLE AS x
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
    ),
    d2 AS (
        SELECT d.vec_id, ct.cell,
               round(sum((d.x - ct.c) * (d.x - ct.c)), 4) AS d2
        FROM dims d JOIN cents ct ON d.dim = ct.dim
        GROUP BY 1, 2
    ),
    rc AS (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        FROM d2
    ),
    assigned AS (SELECT vec_id, cell FROM rc WHERE rn = 1),
    probes AS (
        SELECT vec_id AS q_id, cell FROM rc
        WHERE vec_id IN (0, 1, 2, 3, 4) AND rn <= {_IVF_PROBE}
    ),
    pairs AS (
        SELECT p.q_id, a.vec_id,
               {_cos_sql('e.embedding', 'qe.embedding')} AS cosine
        FROM probes p
        JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.q_id
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN embeddings qe ON qe.vec_id = p.q_id
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
        FROM pairs
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_topk_ivf_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN serving against the PINNED learned centroid index
    (llm/ivf_fixture.py — trained once offline by seeded KMeans on the
    sf0.01 corpus, exactly how production IVF freezes its coarse
    quantizer). Gates ivf_topk's relational assign/probe/score core
    with learned centroids; the in-situ KMeans training path of the
    same function remains unit-gated."""
    from ..llm.ivf_fixture import IVF_CENTROIDS

    return similarity.ivf_topk(
        _emb(spark, sf_dir),
        _QUERY_IDS,
        k=5,
        n_probe=_IVF_PROBE,
        centroids=IVF_CENTROIDS,
    )


@query(
    "embedding_near_dup",
    f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    p AS (
        SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
               {_cos_sql('a.embedding', 'c.embedding')} AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup(_emb(spark, sf_dir), threshold=0.45)


# --- repetition / decontamination / normalization ----------------------------


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


# --- curation ----------------------------------------------------------------


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


# --- multimodal --------------------------------------------------------------


@query(
    "multimodal_features",
    """
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           cast(min(ascii(substring(text, 1, 1))) AS BIGINT) AS min_first_byte,
           cast(max(ascii(substring(text, 1, 1))) AS BIGINT) AS max_first_byte,
           cast(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_blobs
    FROM documents GROUP BY source
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the REAL multimodal path: text -> binary blob column ->
    Arrow-batched mapInPandas feature extraction -> relational rollup.
    The oracle recomputes the deterministic fake features in SQL."""
    d = _docs(spark, sf_dir)
    media = multimodal.attach_blob(d)
    feats = multimodal.extract_blob_features(media)
    return (
        feats.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("first_byte").cast("long").alias("min_first_byte"),
            F.max("first_byte").cast("long").alias("max_first_byte"),
            F.countDistinct("content_md5").cast("long").alias("n_distinct_blobs"),
        )
    )


@query(
    "wav_audio_features",
    """
    SELECT doc_id,
           cast(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
           cast(1 + doc_id % 2 AS BIGINT) AS channels,
           cast(100 + (doc_id % 5) * 30 AS BIGINT) AS n_samples,
           cast((100 + (doc_id % 5) * 30) * 1000
                // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms,
           cast(50 + doc_id % 70 AS BIGINT) AS rms
    FROM documents WHERE doc_id < 200
    """,
)
def wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode behind an oracle gate: synthesize a
    deterministic PCM square-wave wav per doc (8/16-bit, 1-2 channels,
    three sample rates — llm/multimodal.py:synth_wav_corpus), push the
    bytes through the Arrow-batched ``wav_features`` decode
    (RIFF chunk walk + integer RMS), and let DuckDB predict every
    feature arithmetically (square-wave RMS == amplitude, exact in
    integers). A decode regression in the chunk walk, PCM parse,
    channel interleave, or RMS math breaks the hash."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return multimodal.wav_features(multimodal.synth_wav_corpus(d))


@query(
    "bmp_image_features",
    """
    SELECT doc_id,
           cast(4 + doc_id % 8 AS BIGINT) AS width,
           cast(3 + doc_id % 5 AS BIGINT) AS height,
           cast(1 AS BIGINT) AS channels,
           cast((doc_id * 7) % 256 AS BIGINT) AS mean_pixel
    FROM documents WHERE doc_id < 200
    """,
)
def bmp_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode behind an oracle gate: synthesize a
    deterministic 8-bit paletted grayscale BMP per doc
    (llm/multimodal.py:synth_bmp_corpus — real headers, palette, row
    padding), decode it back with the Arrow-batched ``bmp_features``
    (struct parse + palette resolution + mean pixel), and have DuckDB
    predict width/height/channels/mean as integer functions of
    doc_id. Constant-value pixels make the mean exact."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return multimodal.bmp_features(multimodal.synth_bmp_corpus(d))


@query(
    "png_image_features",
    """
    SELECT doc_id,
           cast(4 + doc_id % 6 AS BIGINT) AS width,
           cast(2 + doc_id % 4 AS BIGINT) AS height,
           cast(1 AS BIGINT) AS channels,
           cast((doc_id * 11) % 256 AS BIGINT) AS mean_pixel
    FROM documents WHERE doc_id < 200
    """,
)
def png_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode behind an oracle gate: synthesize a zlib-
    deflated 8-bit grayscale PNG per doc (llm/multimodal.py:
    synth_png_corpus), decode through the Arrow-batched
    ``png_features`` (inflate + unfilter + mean), DuckDB predicts the
    features arithmetically (constant pixels -> exact mean)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return multimodal.png_features(multimodal.synth_png_corpus(d))


@query(
    "gif_image_features",
    """
    SELECT doc_id,
           cast(3 + doc_id % 7 AS BIGINT) AS width,
           cast(2 + doc_id % 3 AS BIGINT) AS height,
           cast(1 AS BIGINT) AS channels,
           cast((doc_id * 13) % 256 AS BIGINT) AS mean_pixel
    FROM documents WHERE doc_id < 200
    """,
)
def gif_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode behind an oracle gate: synthesize a genuine
    GIF89a (real variable-width LZW stream, 256-entry grayscale
    palette — llm/multimodal.py:synth_gif_corpus + _gif_lzw_encode),
    decode through ``gif_features`` (full LZW + palette resolution),
    DuckDB predicts width/height/channels/mean exactly."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return multimodal.gif_features(multimodal.synth_gif_corpus(d))


@query(
    "video_frame_summary",
    """
    SELECT doc_id,
           cast(3 + doc_id % 6 AS BIGINT) AS n_frames,
           cast(10 * (3 + doc_id % 6)
                + (3 + doc_id % 6) * (3 + doc_id % 6 - 1) / 2 AS BIGINT)
               AS total_frame_bytes,
           cast(doc_id % 256 AS BIGINT) AS first_frame_byte
    FROM documents WHERE doc_id < 200
    """,
)
def video_frame_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH real container demuxes behind one oracle gate: even docs
    synthesize a RIFF/AVI, odd docs an ISO-BMFF mp4, with the SAME
    frame-payload formula (llm/multimodal.py:synth_video_corpus);
    ``video_frame_features`` routes each blob through
    ``sample_frames`` (AVI chunk walk / mp4 sample tables) and DuckDB
    predicts frame count, total payload bytes (frame j has 10+j
    bytes: 10n + n(n-1)/2), and the first frame's first byte.  A
    regression in either walk — or in the dispatch — breaks the hash
    on half the rows."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return multimodal.video_frame_features(multimodal.synth_video_corpus(d))


def _bpe_oracle_sql(k: int) -> str:
    """Unrolled DuckDB replica of the ENTIRE iterative BPE training
    loop (llm/bpe.py:bpe_train): k rounds of (pair count -> argmax ->
    greedy list_reduce merge), MATERIALIZED per round so the chain
    stays linear.  Generated, deterministic, and embedded verbatim in
    the registry — the oracle hashes the whole loop, not one round."""
    sql = """WITH w AS MATERIALIZED (
  SELECT word, cast(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY 1
),
v0 AS MATERIALIZED (SELECT cnt, split(word, '') AS syms FROM w)"""
    for r in range(k):
        sql += f""",
b{r} AS MATERIALIZED (
  SELECT s.l AS l, s.r AS r, sum(cnt)::BIGINT AS n
  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
          i -> struct_pack(l := syms[i], r := syms[i+1]))) AS s FROM v{r})
  GROUP BY 1, 2 ORDER BY n DESC, l, r LIMIT 1),
v{r + 1} AS MATERIALIZED (
  SELECT cnt, list_reduce(list_transform(syms, s -> [s]),
    (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
                THEN list_concat(acc[1:len(acc)-1], [b.l || b.r])
                ELSE list_concat(acc, x) END) AS syms
  FROM v{r} CROSS JOIN b{r} b)"""
    sql += "\nSELECT * FROM (" + " UNION ALL ".join(
        f"SELECT cast({r} AS BIGINT) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, n AS pair_count FROM b{r}"
        for r in range(k)
    ) + ")"
    return sql


@query("bpe_train_merges", _bpe_oracle_sql(4))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (llm/bpe.py:bpe_train): the
    corpus collapses to a word-frequency table once, then each of the
    4 registered rounds is a pair-count aggregation + 1-row driver
    argmax + native greedy fold, with per-round lineage truncation.
    The oracle unrolls the SAME loop in DuckDB (list_reduce), so the
    hash certifies the full iterative computation — deterministic
    ties (count desc, then pair) on both engines."""
    from ..llm.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir), n_merges=4)


# --- layout: sequence packing / sharding -------------------------------------

from ..llm import packing  # noqa: E402  (grouped with its query family)

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
    scored = d.select(
        "doc_id", quality_metrics(F.col("text"))["quality_score"].alias("q")
    )
    joined = clusters.join(scored, "doc_id")
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


@query(
    "bigram_pmi",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ),
    uni AS (SELECT unnest(w) AS word FROM toks),
    uc AS (SELECT word, count(*)::DOUBLE AS n FROM uni GROUP BY 1),
    bl AS (
        SELECT unnest(list_transform(range(1, len(w)),
            i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS s
        FROM toks
    ),
    bc AS (
        SELECT s.w1 AS w1, s.w2 AS w2, count(*)::BIGINT AS n_pair
        FROM bl GROUP BY 1, 2
    ),
    tot AS (
        SELECT (SELECT sum(n_pair)::DOUBLE FROM bc) AS n_bi,
               (SELECT sum(n) FROM uc) AS n_uni
    )
    SELECT bc.w1, bc.w2, bc.n_pair,
           round(ln((bc.n_pair / tot.n_bi)
                    / ((a.n / tot.n_uni) * (b.n / tot.n_uni))), 4) + 0.0 AS pmi
    FROM bc JOIN uc a ON a.word = bc.w1
            JOIN uc b ON b.word = bc.w2
            CROSS JOIN tot
    WHERE bc.n_pair >= 10
    """,
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation/PMI table (llm/text.py:bigram_pmi_table) — the
    phrase-mining and tokenizer-merge-seeding statistic, mirrored
    operand-for-operand so the rounded doubles hash-match."""
    from ..llm.text import bigram_pmi_table

    return bigram_pmi_table(_docs(spark, sf_dir), min_count=10)


@query(
    "token_encoding",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ),
    tok AS (SELECT unnest(w) AS token FROM toks),
    vc AS (SELECT token, count(*) AS tf FROM tok GROUP BY 1),
    vid AS (
        SELECT token,
               cast(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS id
        FROM vc
    ),
    pe AS (
        SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM toks
    ),
    pt AS (SELECT doc_id, pos, w[pos] AS token FROM pe)
    SELECT p.doc_id,
           array_to_string(list(v.id ORDER BY p.pos), ',') AS ids
    FROM pt p JOIN vid v USING (token)
    GROUP BY p.doc_id
    """,
)
def token_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenizer encode (llm/text.py:vocab_ids +
    encode_with_vocab): frequency-ranked vocabulary ids, documents
    re-emitted as id sequences. The encode join broadcasts the vocab;
    sequence order is pinned by (pos, id) sort, not collect order."""
    from ..llm.text import encode_with_vocab

    return encode_with_vocab(_docs(spark, sf_dir))


# --- tf-idf sparse cosine similarity ----------------------------------------

_TFIDF_CAP = 1000  # document-frequency cap for the pair join


@query(
    "tfidf_similarity",
    f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t != ''))
                   AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    voc AS (
        SELECT token, round(ln(n / count(DISTINCT doc_id)), 4) AS idf
        FROM tok, nd GROUP BY token, n
        HAVING count(DISTINCT doc_id) <= {_TFIDF_CAP}
    ),
    w AS (
        SELECT tf.doc_id, tf.token, tf.tf * voc.idf AS w
        FROM tf JOIN voc USING (token)
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
        FROM w a JOIN w b USING (token)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / (na.nrm * nb.nrm), 4) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = doc_a
    JOIN nrm nb ON nb.doc_id = doc_b
    WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.9
    """,
)
def tfidf_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical near-dup pairs by tf-idf cosine >= 0.9 (llm/tfidf.py):
    the weighted complement of the set-based Jaccard family. idf is
    rounded 4dp before weighting so Spark and DuckDB agree on every
    weight bit-for-bit; the final cosine rounding absorbs sum-order
    drift. The df cap bounds the posting self-join's hottest key."""
    from ..llm.tfidf import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        _docs(spark, sf_dir), threshold=0.9, max_doc_freq=_TFIDF_CAP
    )


# --- bigram LM quality scoring ----------------------------------------------


@query(
    "lm_quality_scores",
    """
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM documents
    ),
    pe AS (
        SELECT doc_id, w, unnest(range(1, len(w))) AS pos
        FROM toks WHERE len(w) >= 2
    ),
    bg AS (SELECT doc_id, w[pos] AS w1, w[pos + 1] AS w2 FROM pe),
    bc AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM bg GROUP BY 1, 2),
    uc AS (
        SELECT w1, count(*)::DOUBLE AS cu
        FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY 1
    ),
    v AS (SELECT count(*)::DOUBLE AS vsize FROM uc)
    SELECT doc_id,
           cast(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((cb + 1) / (cu + vsize))), 4) AS avg_logprob
    FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1), v
    GROUP BY doc_id
    """,
)
def lm_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy text quality (llm/lm_score.py): per-doc mean
    bigram log-probability under an add-one-smoothed model trained on
    the corpus — the CCNet-style signal for ranking text before
    mixing. Model tables are reusable aggregates; scoring is one
    bigram-keyed join over the stream."""
    from ..llm.lm_score import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir))


# --- substring-overlap (MOSS-style) pairs -----------------------------------


@query(
    "substring_overlap",
    f"""
    WITH sel AS (
        SELECT DISTINCT doc_id, h FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text) - 14),
                       i -> {_H48.format(x="substring(text, i, 16)")})) AS h
            FROM documents WHERE length(text) >= 16
        ) WHERE h % 64 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(count(*) AS BIGINT) AS n_shared
    FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def substring_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-passage pairs via mod-p substring fingerprint
    selection (llm/overlap.py) — character-level plagiarism/quote
    detection that word-Jaccard dilutes away. The shuffled posting is
    ~1/64 of the character stream; pairing is one equi-join on the
    selected hash."""
    from ..llm.overlap import substring_overlap_pairs

    return substring_overlap_pairs(_docs(spark, sf_dir), min_shared=2)


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


_PROBE_MASKS = "[" + ", ".join(
    str(m) for m in [0] + [1 << p for p in range(similarity.N_PLANES)]
) + "]"


@query(
    "ann_topk_lsh_multiprobe",
    f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM b
        WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    probes AS (
        SELECT q_id, q_vec, xor(bucket, m) AS bucket
        FROM q, unnest({_PROBE_MASKS}::BIGINT[]) AS t(m)
    ),
    p AS (
        SELECT pr.q_id, b.vec_id,
               {_cos_sql('b.embedding', 'pr.q_vec')} AS cosine
        FROM b JOIN probes pr ON b.bucket = pr.bucket
        WHERE b.vec_id <> pr.q_id
    ),
    r AS (
        SELECT q_id, vec_id, cosine,
               cast(row_number() OVER (
                   PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT)
                   AS rn
        FROM p
    )
    SELECT q_id, vec_id, cosine, rn FROM r WHERE rn <= 5
    """,
)
def ann_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (hamming-1 probe set): the recall lever on
    the bucketed path — candidates x(n_planes+1), corpus untouched."""
    return similarity.cosine_topk_lsh_multiprobe(
        _emb(spark, sf_dir), _QUERY_IDS, k=5
    )


@query(
    "langid_confusion",
    f"""
    WITH t AS (
        SELECT lang,
               list_distinct(list_filter(string_split(text, ' '),
                                         x -> x != '')) AS dw
        FROM documents
    ),
    s AS (SELECT lang, {_LANG_SCORES_SQL} FROM t)
    SELECT lang AS lang_label, {_LANG_CASE} AS lang_pred,
           cast(count(*) AS BIGINT) AS n_docs,
           round(count(*) / sum(count(*)) OVER (PARTITION BY lang), 4)
               AS row_share
    FROM s GROUP BY 1, 2
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-vs-predicted language confusion matrix with row-share —
    the evaluation query you run before trusting the lang-ID heuristic
    as a corpus filter.  One pass over documents (the same lexicon
    argmax as ``text_quality``), then a |langs|² aggregate; the
    row-normalizing window runs over that tiny matrix, not documents."""
    d = _docs(spark, sf_dir)
    counts = d.select(
        F.col("lang").alias("lang_label"),
        lang_id(F.col("text")).alias("lang_pred"),
    ).groupBy("lang_label", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("lang_label")
    return counts.select(
        "lang_label",
        "lang_pred",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 4).alias(
            "row_share"
        ),
    )


# Embed the two registered pair queries as derived tables (a DuckDB
# subquery may carry its own WITH), so the eval oracle is BY
# CONSTRUCTION the same ground truth / candidate definitions the
# individual gates certify.
@query(
    "minhash_recall_eval",
    f"""
    WITH e AS (SELECT doc_a, doc_b FROM ({ORACLE["ngram_jaccard_dedup"]})),
    m AS (SELECT doc_a, doc_b FROM ({ORACLE["minhash_near_dup"]})),
    j AS (
      SELECT e.doc_a IS NOT NULL AS in_e, m.doc_a IS NOT NULL AS in_m
      FROM e FULL OUTER JOIN m
        ON e.doc_a = m.doc_a AND e.doc_b = m.doc_b)
    SELECT cast(count(CASE WHEN in_e THEN 1 END) AS BIGINT) AS n_exact,
           cast(count(CASE WHEN in_m THEN 1 END) AS BIGINT) AS n_minhash,
           cast(count(CASE WHEN in_e AND in_m THEN 1 END) AS BIGINT) AS tp,
           cast(count(CASE WHEN in_m AND NOT in_e THEN 1 END) AS BIGINT)
               AS fp,
           cast(count(CASE WHEN in_e AND NOT in_m THEN 1 END) AS BIGINT)
               AS fn,
           round(count(CASE WHEN in_e AND in_m THEN 1 END)
                 / nullif(count(CASE WHEN in_m THEN 1 END), 0), 4)
               AS precision,
           round(count(CASE WHEN in_e AND in_m THEN 1 END)
                 / nullif(count(CASE WHEN in_e THEN 1 END), 0), 4)
               AS recall
    FROM j
    """,
)
def minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH near-dup path measured
    against the exact n-gram-Jaccard ground truth at the same
    threshold — the evaluation you run before trusting the sketch as
    the 100 TB substitute for the exact join.  Both pair sets are the
    very DataFrames the individual gates certify; the comparison is a
    full outer join on the (small) pair lists, so the eval costs the
    two pair computations plus a pair-table-sized join, and the oracle
    embeds the SAME two certified SQL definitions as derived tables."""
    docs = _docs(spark, sf_dir)
    # One shared posting: both detectors tokenize/shingle the same
    # corpus, so build the inverted index once and thread it through —
    # halves the tokenize/shingle/md5 work of the eval. count()
    # materializes the cache BEFORE the two branch pipelines run
    # (concurrent stages racing an unfilled cache each compute the
    # partitions themselves — Spark does not coordinate in-flight
    # cache fills). At local[32]/sf0.1 the duplicated work hides in
    # idle cores (interleaved A/B: timing parity within noise); the
    # saving is real where cores are the budget — i.e. at cluster
    # scale, where this eval runs over a corpus, not a sketch.
    posting = dedup._posting(docs, "text").persist()
    posting.count()
    e = dedup.ngram_jaccard_pairs(
        docs, threshold=0.8, _posting_df=posting
    ).select("doc_a", "doc_b", F.lit(True).alias("in_e"))
    m = dedup.minhash_near_dup(
        docs, threshold=0.8, _posting_df=posting
    ).select("doc_a", "doc_b", F.lit(True).alias("in_m"))
    j = e.join(m, ["doc_a", "doc_b"], "full_outer")
    tp = F.count(F.when(F.col("in_e") & F.col("in_m"), 1))
    n_e = F.count(F.when(F.col("in_e"), 1))
    n_m = F.count(F.when(F.col("in_m"), 1))
    return j.agg(
        n_e.cast("long").alias("n_exact"),
        n_m.cast("long").alias("n_minhash"),
        tp.cast("long").alias("tp"),
        F.count(F.when(F.col("in_m") & F.col("in_e").isNull(), 1))
        .cast("long")
        .alias("fp"),
        F.count(F.when(F.col("in_e") & F.col("in_m").isNull(), 1))
        .cast("long")
        .alias("fn"),
        F.round(tp / F.nullif(n_m, F.lit(0)), 4).alias("precision"),
        F.round(tp / F.nullif(n_e, F.lit(0)), 4).alias("recall"),
    )


@query(
    "jaccard_histogram",
    f"""
    WITH {_NG_CTE}, {_JACCARD_PAIRS}
    SELECT floor(jaccard * 10) / 10 AS bucket,
           cast(count(*) AS BIGINT) AS n_pairs
    FROM jacc WHERE jaccard >= 0.3
    GROUP BY 1
    """,
)
def jaccard_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-mass histogram of near-dup candidate pairs (0.1-wide
    buckets above 0.3) — the threshold-tuning view: where the pair
    mass sits tells you what a 0.8 cutoff keeps vs drops.  Runs on the
    inverted-index pair table (the oracle's all-pairs form is the
    naive-by-design ground truth); the histogram is a tiny aggregate
    over pairs."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.3)
    return pairs.groupBy(
        (F.floor(F.col("jaccard") * 10) / 10).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))


@query(
    "dedup_funnel_summary",
    f"""
    WITH eg AS (SELECT * FROM ({ORACLE["exact_dedup"]})),
    nc AS (SELECT * FROM ({ORACLE["near_dup_clusters"]})),
    removed AS (SELECT doc_id FROM nc WHERE doc_id <> cluster_id),
    keep AS (SELECT keeper_doc_id AS doc_id FROM eg)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT cast(count(*) AS BIGINT) FROM keep) AS n_unique_content,
           (SELECT cast(count(*) AS BIGINT) FROM nc) AS n_clustered_docs,
           (SELECT cast(count(DISTINCT cluster_id) AS BIGINT) FROM nc)
               AS n_clusters,
           (SELECT cast(count(*) AS BIGINT) FROM removed) AS n_near_removed,
           (SELECT cast(count(*) AS BIGINT) FROM keep
            WHERE doc_id NOT IN (SELECT doc_id FROM removed)) AS n_final
    """,
)
def dedup_funnel_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel in one row: corpus size → exact-dedup
    survivors → near-dup clustering → final kept set (exact keepers
    minus non-keeper cluster members).  Composes the SAME certified
    building blocks (`exact_dedup`, `near_dup_clusters`), and the
    oracle embeds their registered SQL as derived tables, so the
    funnel arithmetic can never drift from the per-stage gates.
    Cluster keeper = cluster_id (the min-label convention
    ``dup_clusters`` guarantees), so no extra argmax pass is needed."""
    d = _docs(spark, sf_dir)
    groups = dedup.exact_dedup_groups(d)
    clusters = dedup.dup_clusters(
        dedup.ngram_jaccard_pairs(d, threshold=0.8)
    ).persist()
    keep = groups.select(F.col("keeper_doc_id").alias("doc_id"))
    removed = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_keep = keep.agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_content")
    )
    n_clustered = clusters.agg(
        F.count(F.lit(1)).cast("long").alias("n_clustered_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )
    n_removed = removed.agg(
        F.count(F.lit(1)).cast("long").alias("n_near_removed")
    )
    n_final = keep.join(removed, "doc_id", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_final")
    )
    return (
        n_docs.crossJoin(n_keep)
        .crossJoin(n_clustered)
        .crossJoin(n_removed)
        .crossJoin(n_final)
    )


@query(
    "simhash_recall_eval",
    f"""
    WITH e AS (SELECT doc_a, doc_b FROM ({ORACLE["ngram_jaccard_dedup"]})),
    s AS (SELECT doc_a, doc_b FROM ({ORACLE["simhash_dedup"]})),
    j AS (
      SELECT e.doc_a IS NOT NULL AS in_e, s.doc_a IS NOT NULL AS in_s
      FROM e FULL OUTER JOIN s
        ON e.doc_a = s.doc_a AND e.doc_b = s.doc_b)
    SELECT cast(count(CASE WHEN in_e THEN 1 END) AS BIGINT) AS n_exact,
           cast(count(CASE WHEN in_s THEN 1 END) AS BIGINT) AS n_simhash,
           cast(count(CASE WHEN in_e AND in_s THEN 1 END) AS BIGINT) AS tp,
           round(count(CASE WHEN in_e AND in_s THEN 1 END)
                 / nullif(count(CASE WHEN in_s THEN 1 END), 0), 4)
               AS precision,
           round(count(CASE WHEN in_e AND in_s THEN 1 END)
                 / nullif(count(CASE WHEN in_e THEN 1 END), 0), 4)
               AS recall
    FROM j
    """,
)
def simhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-distance pairs scored against the exact
    n-gram-Jaccard ground truth — the companion of
    ``minhash_recall_eval`` for the OTHER sketch family.  Unlike the
    MinHash path (whose candidates are jaccard-verified, so precision
    is 1 by construction), SimHash admits pairs by hamming distance
    alone: both false positives and false negatives are possible, and
    this eval is how you pick between the sketches for a corpus.
    Oracle embeds the same two certified SQL definitions."""
    docs = _docs(spark, sf_dir)
    # Shared posting, same reason as minhash_recall_eval (incl. the
    # eager fill — see the cache-race note there).
    posting = dedup._posting(docs, "text").persist()
    posting.count()
    e = dedup.ngram_jaccard_pairs(
        docs, threshold=0.8, _posting_df=posting
    ).select("doc_a", "doc_b", F.lit(True).alias("in_e"))
    s = dedup.simhash_near_dup(
        docs, max_distance=3, _posting_df=posting
    ).select("doc_a", "doc_b", F.lit(True).alias("in_s"))
    j = e.join(s, ["doc_a", "doc_b"], "full_outer")
    tp = F.count(F.when(F.col("in_e") & F.col("in_s"), 1))
    n_e = F.count(F.when(F.col("in_e"), 1))
    n_s = F.count(F.when(F.col("in_s"), 1))
    return j.agg(
        n_e.cast("long").alias("n_exact"),
        n_s.cast("long").alias("n_simhash"),
        tp.cast("long").alias("tp"),
        F.round(tp / F.nullif(n_s, F.lit(0)), 4).alias("precision"),
        F.round(tp / F.nullif(n_e, F.lit(0)), 4).alias("recall"),
    )


@query(
    "vocab_coverage",
    """
    WITH words AS (
      SELECT word, cast(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY 1),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, word) AS rnk,
             sum(freq) OVER () AS total
      FROM words),
    cum AS (
      SELECT rnk, total,
             sum(freq) OVER (ORDER BY rnk) AS cum_freq
      FROM ranked)
    SELECT cast(n AS BIGINT) AS vocab_size,
           round(max(CASE WHEN rnk <= n THEN cum_freq END)
                 * 100.0 / max(total), 2) AS coverage_pct
    FROM cum CROSS JOIN (SELECT unnest([10, 20, 50]) AS n)
    GROUP BY 1
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage of a frequency-truncated vocabulary at
    sizes 10/20/50 — the tokenizer-design curve (what does capping the
    vocab cost in <unk> rate?).  One corpus pass builds the frequency
    table; ranking and the cumulative curve run over the
    vocabulary-sized aggregate, and the three coverage points read off
    one cumulative window with a deterministic (freq desc, word)
    total order."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    from pyspark.sql import Window as _W

    ranked = words.select(
        "freq",
        F.row_number()
        .over(_W.orderBy(F.desc("freq"), F.col("word")))
        .alias("rnk"),
    )
    total = words.agg(F.sum("freq").alias("total"))
    cum = ranked.select(
        "rnk",
        F.sum("freq").over(_W.orderBy("rnk")).alias("cum_freq"),
    ).crossJoin(F.broadcast(total))
    sizes = F.explode(F.array(F.lit(10), F.lit(20), F.lit(50))).alias("n")
    return (
        cum.select("rnk", "cum_freq", "total", sizes)
        .groupBy(F.col("n").cast("long").alias("vocab_size"))
        .agg(
            F.round(
                F.max(F.when(F.col("rnk") <= F.col("n"), F.col("cum_freq")))
                * 100.0
                / F.max("total"),
                2,
            ).alias("coverage_pct")
        )
    )


_I8_DOT = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
)

@query(
    "int8_ann_recall",
    f"""
    WITH m AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
                                              x -> abs(x::DOUBLE))),
                      1e-30) AS ma
      FROM embeddings),
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
                 x -> cast(floor(x::DOUBLE * 127.0 / ma + 0.5) AS BIGINT))
                 AS qv
      FROM m),
    q AS (SELECT vec_id AS q_id, qv AS q_vec FROM qz
          WHERE vec_id IN (0, 1, 2, 3, 4)),
    p AS (
      SELECT q.q_id, z.vec_id,
             round({_I8_DOT.format(a="z.qv", b="q.q_vec")}
                   / sqrt({_I8_DOT.format(a="z.qv", b="z.qv")}::DOUBLE
                          * {_I8_DOT.format(a="q.q_vec", b="q.q_vec")}::DOUBLE),
                   4) AS cosine
      FROM qz z CROSS JOIN q WHERE z.vec_id <> q.q_id),
    r AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM p),
    approx AS (SELECT q_id, vec_id FROM r WHERE rn <= 5),
    exact AS (SELECT q_id, vec_id FROM ({ORACLE["ann_topk"]})),
    base AS (SELECT q_id, cast(count(*) AS BIGINT) AS k FROM exact
             GROUP BY 1),
    hits AS (SELECT e.q_id, cast(count(*) AS BIGINT) AS n_overlap
             FROM exact e JOIN approx a
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY 1)
    SELECT base.q_id, k,
           cast(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap
    FROM base LEFT JOIN hits ON base.q_id = hits.q_id
    """,
)
def int8_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of brute-force ANN on symmetric-max-abs int8-quantized
    vectors against the certified exact float path — the accuracy
    audit that licenses serving quantized (4× less memory traffic per
    vector).  Quantization uses ⌊x+½⌋ (round() flips between Spark's
    half-up and DuckDB's half-even at exact halves), the per-vector
    scale cancels inside cosine, and the quantized dot products are
    exact integer arithmetic — so the whole evaluation is
    cross-engine bit-deterministic.  The oracle embeds the registered
    `ann_topk` SQL as its exact side."""
    return similarity.int8_recall_at_k(_emb(spark, sf_dir), _QUERY_IDS, k=5)


# sign-bit packing: bit 63 cannot be built with 1<<63 in DuckDB (left-
# shift overflow check); its two's-complement weight is BIGINT MIN, and
# summing DISJOINT bit weights equals OR — so the pack is a list_sum of
# per-bit weights with the i=64 term spelled as (-max-1).
_SIGN_PACK = """
    list_sum(list_transform(range(1, 65), i ->
      CASE WHEN {v}[i] >= 0 THEN
        CASE WHEN i = 64 THEN (-9223372036854775807 - 1)
             ELSE 1::BIGINT << (i - 1) END
      ELSE 0::BIGINT END))::BIGINT
"""


@query(
    "sign_bit_ann_recall",
    f"""
    WITH b AS (
      SELECT vec_id, {_SIGN_PACK.format(v="embedding")} AS bits
      FROM embeddings),
    q AS (SELECT vec_id AS q_id, bits AS q_bits FROM b
          WHERE vec_id IN (0, 1, 2, 3, 4)),
    p AS (
      SELECT q.q_id, b.vec_id,
             cast(bit_count(xor(b.bits, q.q_bits)) AS BIGINT) AS hamming
      FROM b CROSS JOIN q WHERE b.vec_id <> q.q_id),
    r AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY hamming, vec_id) AS rn
      FROM p),
    approx AS (SELECT q_id, vec_id FROM r WHERE rn <= 5),
    exact AS (SELECT q_id, vec_id FROM ({ORACLE["ann_topk"]})),
    base AS (SELECT q_id, cast(count(*) AS BIGINT) AS k FROM exact
             GROUP BY 1),
    hits AS (SELECT e.q_id, cast(count(*) AS BIGINT) AS n_overlap
             FROM exact e JOIN approx a
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY 1)
    SELECT base.q_id, k,
           cast(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap
    FROM base LEFT JOIN hits ON base.q_id = hits.q_id
    """,
)
def sign_bit_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the 1-bit (sign) hamming retriever against the
    certified exact path — the 64×-compression extreme of the
    quantization ladder (`int8_ann_recall` is the 4× rung).  The
    sign-bit pack, xor, and popcount are exact integer arithmetic in
    both engines, so the whole audit is bit-deterministic; production
    use is as stage one of retrieve-then-rerank, and this number is
    the stage-one recall budget."""
    return similarity.sign_bit_recall_at_k(
        _emb(spark, sf_dir), _QUERY_IDS, k=5
    )


@query(
    "rerank_ann_recall",
    f"""
    WITH b AS (
      SELECT vec_id, {_SIGN_PACK.format(v="embedding")} AS bits
      FROM embeddings),
    q AS (SELECT vec_id AS q_id, bits AS q_bits FROM b
          WHERE vec_id IN (0, 1, 2, 3, 4)),
    h AS (
      SELECT q.q_id, b.vec_id,
             row_number() OVER (PARTITION BY q.q_id
                ORDER BY bit_count(xor(b.bits, q.q_bits)), b.vec_id) AS rn
      FROM b CROSS JOIN q WHERE b.vec_id <> q.q_id),
    cands AS (SELECT q_id, vec_id FROM h WHERE rn <= 50),
    qv AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN (0, 1, 2, 3, 4)),
    scored AS (
      SELECT c.q_id, c.vec_id,
             {_cos_sql('e.embedding', 'qv.q_vec')} AS cosine
      FROM cands c JOIN embeddings e ON e.vec_id = c.vec_id
                   JOIN qv ON qv.q_id = c.q_id),
    rr AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS rn
      FROM scored),
    approx AS (SELECT q_id, vec_id FROM rr WHERE rn <= 5),
    exact AS (SELECT q_id, vec_id FROM ({ORACLE["ann_topk"]})),
    base AS (SELECT q_id, cast(count(*) AS BIGINT) AS k FROM exact
             GROUP BY 1),
    hits AS (SELECT e.q_id, cast(count(*) AS BIGINT) AS n_overlap
             FROM exact e JOIN approx a
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY 1)
    SELECT base.q_id, k,
           cast(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap
    FROM base LEFT JOIN hits ON base.q_id = hits.q_id
    """,
)
def rerank_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of retrieve-then-rerank: 1-bit hamming stage-1 top-50,
    exact-cosine rerank of just those candidates — the production ANN
    serving shape, where the float metric touches 50 vectors per query
    instead of the corpus.  Completes the quantization story: raw
    1-bit recall (`sign_bit_ann_recall`) is the floor, this is what a
    50-candidate rerank budget buys back."""
    return similarity.rerank_recall_at_k(
        _emb(spark, sf_dir), _QUERY_IDS, k=5, stage1_k=50
    )


@query(
    "quantization_ladder_summary",
    f"""
    WITH i8 AS (SELECT 'int8' AS method, q_id, k, n_overlap
                FROM ({ORACLE["int8_ann_recall"]})),
    s1 AS (SELECT '1bit' AS method, q_id, k, n_overlap
           FROM ({ORACLE["sign_bit_ann_recall"]})),
    rr AS (SELECT '1bit+rerank50' AS method, q_id, k, n_overlap
           FROM ({ORACLE["rerank_ann_recall"]})),
    u AS (SELECT * FROM i8 UNION ALL SELECT * FROM s1
          UNION ALL SELECT * FROM rr)
    SELECT method,
           cast(count(*) AS BIGINT) AS n_queries,
           cast(sum(n_overlap) AS BIGINT) AS total_overlap,
           round(sum(n_overlap) * 1.0 / sum(k), 4) AS recall_at_5
    FROM u GROUP BY 1
    """,
)
def quantization_ladder_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole compression-accuracy trade in three rows: recall@5 of
    int8 (4× compression), raw 1-bit (64×), and 1-bit with a
    50-candidate exact rerank — each line a certified query whose SQL
    the oracle embeds, aggregated to the number a serving-tier design
    review actually reads."""
    emb = _emb(spark, sf_dir)

    def tag(df, name):
        return df.select(
            F.lit(name).alias("method"), "q_id", "k", "n_overlap"
        )

    u = (
        tag(similarity.int8_recall_at_k(emb, _QUERY_IDS, k=5), "int8")
        .unionAll(
            tag(
                similarity.sign_bit_recall_at_k(emb, _QUERY_IDS, k=5),
                "1bit",
            )
        )
        .unionAll(
            tag(
                similarity.rerank_recall_at_k(
                    emb, _QUERY_IDS, k=5, stage1_k=50
                ),
                "1bit+rerank50",
            )
        )
    )
    return u.groupBy("method").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("n_overlap").cast("long").alias("total_overlap"),
        F.round(
            F.sum("n_overlap") * 1.0 / F.sum("k"), 4
        ).alias("recall_at_5"),
    )
