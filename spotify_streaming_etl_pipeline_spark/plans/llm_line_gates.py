"""Oracle-gated queries for the line-level corpus family
(llm/lines.py): corpus-wide exact line dedup and the C4 line/document
rule filters.

Substrate: the synthetic documents are single-line word streams, so
each gate first REFLOWS them — a newline every 3 tokens — with
``lines.reflow_lines`` on the Spark side and the identical
slice-arithmetic CTE on the DuckDB side (the media-gate discipline:
the oracle predicts by direct construction, never by re-running the
Spark expression chain).  At 3 tokens/line over the ~30-word corpus
vocabulary, duplicate lines provably occur (3172 of 9216 sf0.01
lines sit in dup groups), so the drop paths all fire.

The rule gates additionally inject punctuation/braces/blocklist
material arithmetically (replace 'slow' -> 'slow.', 'big' ->
'{big}', append ' lorem ipsum.' on doc_id % 11 == 0) so every rule
column varies on the substrate instead of being constant-false.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import lines
from .analytics import query
from .llm_shared import _docs

#: Reflow-to-lines CTE chain: ``lt`` = (doc_id, line_no, line), the
#: DuckDB twin of ``reflow_lines(df, 3)`` -> ``line_table`` ({src} is
#: the text expression to reflow).
_REFLOW_LT = """
    toks AS (
        SELECT doc_id,
               list_filter(string_split({src}, ' '), t -> t != '') AS w
        FROM documents
    ),
    xl AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, cast(ceil(len(w) / 3.0) AS INT)),
                   i -> struct_pack(
                       line_no := i,
                       line := array_to_string(w[3*i+1:3*i+3], ' ')))) AS L
        FROM toks
    ),
    lt AS (
        SELECT doc_id, L.line_no::BIGINT AS line_no, trim(L.line) AS line
        FROM xl WHERE trim(L.line) != ''
    )
"""

#: Punctuation/brace injection for the rule gates, identical on both
#: engines: 'slow' gains a sentence terminator, 'big' gains braces.
_RULE_SRC_SQL = "replace(replace(text, 'slow', 'slow.'), 'big', '{big}')"


def _rule_src_col():
    return F.regexp_replace(
        F.regexp_replace(F.col("text"), "slow", "slow."), "big", "{big}"
    )


@query(
    "line_dedup_decisions",
    f"""
    WITH {_REFLOW_LT.format(src="text")},
    h AS (
        SELECT doc_id, line_no, md5(line) AS m FROM lt
    ),
    k AS (
        SELECT m, min(doc_id * 1000000 + line_no) AS first,
               count(*)::BIGINT AS n_copies
        FROM h GROUP BY m
    )
    SELECT doc_id, line_no,
           (doc_id * 1000000 + line_no) = k.first AS kept,
           n_copies
    FROM h JOIN k USING (m)
    """,
)
def line_dedup_decisions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact line dedup, decision form (llm/lines.py:
    line_dedup_decisions — the C4 §2.2 / RefinedWeb §3.4 boilerplate
    remover): reflow the corpus to 3-token lines, then keep only the
    lexicographically-first (doc_id, line_no) occurrence of each
    distinct line.  The full per-line decision table (kept +
    n_copies) is hashed; the oracle replays the min-composite-key
    keeper rule over md5 line identity.  The corpus-sized shuffle
    carries 16-byte hash halves, never line text."""
    d = lines.reflow_lines(_docs(spark, sf_dir), tokens_per_line=3)
    return lines.line_dedup_decisions(d)


@query(
    "line_dedup_docs",
    f"""
    WITH {_REFLOW_LT.format(src="text")},
    h AS (
        SELECT doc_id, line_no, line, md5(line) AS m FROM lt
    ),
    k AS (
        SELECT m, min(doc_id * 1000000 + line_no) AS first
        FROM h GROUP BY m
    ),
    kept AS (
        SELECT h.doc_id, h.line_no, h.line
        FROM h JOIN k USING (m)
        WHERE doc_id * 1000000 + line_no = k.first
    ),
    reb AS (
        SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(line, chr(10) ORDER BY line_no) AS clean_text
        FROM kept GROUP BY doc_id
    ),
    tot AS (
        SELECT doc_id, count(*)::BIGINT AS n_lines FROM h GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(tot.n_lines, 0) AS n_lines,
           coalesce(reb.n_kept, 0) AS n_kept,
           coalesce(reb.clean_text, '') AS clean_text
    FROM documents d
    LEFT JOIN tot ON tot.doc_id = d.doc_id
    LEFT JOIN reb ON reb.doc_id = d.doc_id
    """,
)
def line_dedup_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line dedup, document form (llm/lines.py:line_dedup): the same
    keeper rule, then each document REBUILT from its kept lines in
    original order — the actual corpus-cleaning output.  clean_text
    is hashed verbatim, so the order-stable rebuild (array_sort over
    collect_list) is itself under the gate; documents whose every
    line was a repeat keep a row with n_kept = 0."""
    d = lines.reflow_lines(_docs(spark, sf_dir), tokens_per_line=3)
    return lines.line_dedup(d)


@query(
    "c4_line_rules",
    f"""
    WITH {_REFLOW_LT.format(src=_RULE_SRC_SQL)},
    r AS (
        SELECT doc_id, line_no, line,
               len(list_filter(string_split(line, ' '), t -> t != ''))::BIGINT
                   AS n_words,
               list_contains(list_filter(string_split(line, ' '),
                                         t -> t != ''), 'merge')
                   AS blocklisted,
               NOT (right(line, 1) IN ('.', '!', '?', '"', chr(39)))
                   AS no_terminal,
               (contains(line, '{{') OR contains(line, '}}')) AS has_brace
        FROM lt
    )
    SELECT doc_id, line_no, n_words,
           n_words < 3 AS too_short,
           no_terminal, blocklisted, has_brace,
           NOT (n_words < 3 OR no_terminal OR blocklisted OR has_brace)
               AS kept
    FROM r
    """,
)
def c4_line_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 per-line rule decision table (llm/lines.py:c4_line_rules —
    Raffel et al. 2020 §2.2): >= 3 words, terminal punctuation, word
    blocklist ('merge'), curly-brace code filter.  The substrate
    injection makes every rule fire: 'slow.' supplies terminal
    punctuation, '{big}' supplies braces, tail lines supply
    too_short.  Full decision table hashed — every rule column plus
    the combined kept bit."""
    d = _docs(spark, sf_dir).withColumn("text", _rule_src_col())
    d = lines.reflow_lines(d, tokens_per_line=3)
    return lines.c4_line_rules(
        d, min_words=3, require_terminal_punct=True, blocklist=("merge",)
    )


@query(
    "c4_doc_filter",
    f"""
    WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0
                    THEN {_RULE_SRC_SQL} || ' lorem ipsum.'
                    ELSE {_RULE_SRC_SQL} END AS text
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t != '') AS w
        FROM base
    ),
    xl AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, cast(ceil(len(w) / 3.0) AS INT)),
                   i -> struct_pack(
                       line_no := i,
                       line := array_to_string(w[3*i+1:3*i+3], ' ')))) AS L
        FROM toks
    ),
    lt AS (
        SELECT doc_id, L.line_no::BIGINT AS line_no, trim(L.line) AS line
        FROM xl WHERE trim(L.line) != ''
    ),
    r AS (
        SELECT doc_id, line,
               NOT (
                   len(list_filter(string_split(line, ' '),
                                   t -> t != '')) < 3
                   OR NOT (right(line, 1) IN ('.', '!', '?', '"', chr(39)))
                   OR list_contains(list_filter(string_split(line, ' '),
                                                t -> t != ''), 'merge')
                   OR contains(line, '{{') OR contains(line, '}}')
               ) AS kept
        FROM lt
    ),
    per_doc AS (
        SELECT doc_id, count(*)::BIGINT AS n_lines,
               sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept_lines,
               max(contains(lower(line), 'lorem ipsum')) AS has_lorem
        FROM r GROUP BY doc_id
    )
    SELECT b.doc_id,
           coalesce(p.n_lines, 0) AS n_lines,
           coalesce(p.n_kept_lines, 0) AS n_kept_lines,
           coalesce(p.has_lorem, false) AS has_lorem,
           (coalesce(p.n_kept_lines, 0) >= 2
            AND NOT coalesce(p.has_lorem, false)) AS kept
    FROM base b LEFT JOIN per_doc p ON p.doc_id = b.doc_id
    """,
)
def c4_doc_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 document-level gate (llm/lines.py:c4_doc_filter): a doc
    survives iff >= 2 of its lines pass the line rules and it lacks
    the 'lorem ipsum' placeholder (injected on doc_id % 11 == 0 —
    sometimes split across the reflow boundary, so BOTH lorem
    branches fire and the oracle must replicate the per-line
    containment exactly, not the raw-text one).  Full per-doc
    decision table hashed."""
    d = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(_rule_src_col(), F.lit(" lorem ipsum.")),
        ).otherwise(_rule_src_col()),
    )
    d = lines.reflow_lines(d, tokens_per_line=3)
    return lines.c4_doc_filter(
        d,
        min_kept_lines=2,
        min_words=3,
        require_terminal_punct=True,
        blocklist=("merge",),
        lorem_filter=True,
    )
