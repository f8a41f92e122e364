"""Shared substrate for the oracle-gated LLM-operator query families.

The LLM-pipeline gates (split by family into ``llm_dedup_gates``,
``llm_text_gates``, ``llm_ann_gates``, ``llm_corpus_gates``,
``llm_media_gates``, ``llm_evals``) pair every Spark plan with DuckDB
SQL that reproduces it EXACTLY — possible because all hashing goes
through the portable 48-bit md5-prefix hash
(llm/text.py:portable_hash48) that both engines compute
bit-identically, and all floating-point outputs are rounded.  This
module holds the DuckDB fragments and tiny helpers those families
share, so each fragment has exactly one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llm import similarity
from ..llm.text import LANG_LEXICONS
from ..sources.catalog import load_table

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


def _bucket_sql(vec: str) -> str:
    terms = []
    for p, w in enumerate(similarity.plane_weights()):
        lit = "[" + ", ".join(f"{x:.1f}" for x in w) + "]"
        terms.append(
            f"CASE WHEN {_dot_sql(vec, lit)} > 0 THEN {1 << p} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"
