"""Line-level corpus operations: the C4/RefinedWeb boilerplate
family — line tables, corpus-wide line deduplication, and rule-based
line/document filters.

Web-scraped training corpora repeat LINES far more than documents:
navigation menus, cookie banners, "terms of use" footers appear on
millions of otherwise-distinct pages.  C4 (Raffel et al. 2020,
§2.2) and RefinedWeb (Penedo et al. 2023, §3.4) both remove them
with (a) corpus-wide exact line dedup — keep only the first
occurrence of each distinct line — and (b) per-line heuristic rules
(minimum word count, terminal punctuation, blocklists, code
braces).  This module is that family, Spark-first.

Scale posture (the point of each design):

- **line_table**: posexplode of the separator split — entirely
  narrow, no shuffle; output rows ≈ line count.
- **line_dedup_decisions**: the ONLY corpus-wide shuffle carries
  (h1, h2, doc_id, line_no) — two 48-bit md5 halves plus position,
  ~28 B/row, never line text; the keeper argmin is a
  ``min(struct(doc_id, line_no))`` grouped on the hash, so the map
  side collapses each partition's occurrences to one candidate
  BEFORE the exchange (partial aggregation), and the decision join
  is hash-keyed.  Identical discipline to ``dedup._posting``.
- **line_dedup**: rebuilds each document from its kept lines with a
  per-doc ``collect_list(struct(line_no, line)) -> array_sort``
  (doc-sized arrays, partitioned by doc_id — scales with documents,
  not corpus).
- **c4_line_rules / c4_doc_filter**: per-line rule columns are pure
  narrow expressions; the doc filter is one count aggregation
  partitioned by doc_id.

Line identity uses BOTH 48-bit halves of one codegen'd md5 (96-bit
key, collision odds ~2^-96·pairs), the ``dedup._posting`` idiom —
the full md5 string would double the shuffle width for no recall
gain at any plausible corpus size.

Reference parity note: the reference has no line-level operators
(its unit is the listening-history row); this module is part of the
additive LLM-curation surface, sharing text/token conventions with
``llm/text.py`` (whitespace tokens) and hash conventions with
``llm/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: C4's sentence-terminal characters: a line must end in one to count
#: as prose (Raffel et al. 2020 §2.2 — "retained only lines that
#: ended in a terminal punctuation mark").
TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def line_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """(doc_id, line_no, line): one row per non-blank line, trimmed,
    ``line_no`` the 0-based position in the ORIGINAL document (blank
    lines keep their slot, so decisions re-join cleanly).  Entirely
    narrow — split + posexplode + filter, no shuffle.  ``line_sep``
    is a Java regex (the default newline behaves literally; escape
    metacharacter separators)."""
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "line_no", "_raw"
        ),
    )
    return out.select(
        "doc_id",
        F.col("line_no").cast("long").alias("line_no"),
        F.trim(F.col("_raw")).alias("line"),
    ).filter(F.col("line") != "")


def _line_hashes(lt: DataFrame) -> DataFrame:
    """(doc_id, line_no, h1, h2): ONE codegen'd md5 per line split
    into two 48-bit halves — the 16-byte shuffle key the dedup
    family standardizes on (see dedup._posting)."""
    hashed = lt.select("doc_id", "line_no", F.md5("line").alias("_md5"))
    return hashed.select(
        "doc_id",
        "line_no",
        F.conv(F.substring("_md5", 1, 12), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("_md5", 13, 12), 16, 10).cast("long").alias("h2"),
    )


def line_dedup_decisions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact line dedup, decision form: (doc_id, line_no,
    kept, n_copies) for every non-blank line — ``kept`` iff this
    (doc_id, line_no) is the FIRST occurrence of the line's exact
    content anywhere in the corpus (C4 §2.2: "discarded all but one
    of any three-sentence span occurring more than once"; RefinedWeb
    applies it per line).  First = min (doc_id, line_no)
    lexicographically — deterministic, oracle-replayable.

    The corpus-sized shuffle carries only hash halves + position;
    ``min(struct(...))`` partially aggregates map-side, and the
    decision join is on the same hash key, so line text never moves
    between executors."""
    hashed = _line_hashes(line_table(df, text_col, id_col, line_sep))
    keepers = hashed.groupBy("h1", "h2").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return hashed.join(keepers, ["h1", "h2"]).select(
        "doc_id",
        "line_no",
        (
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("line_no") == F.col("first.line_no"))
        ).alias("kept"),
        "n_copies",
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    join_sep: str | None = None,
) -> DataFrame:
    """Corpus-wide exact line dedup, document form: (doc_id, n_lines,
    n_kept, clean_text) — every input document gets a row; documents
    whose every line was a repeat keep n_kept = 0 and an empty
    clean_text rather than vanishing (dropping them silently would
    corrupt joins downstream — the repetition_stats discipline).

    Separator asymmetry: ``line_sep`` SPLITS as a Java regex but
    ``clean_text`` is rebuilt by JOINING with a literal string —
    ``join_sep`` when given, else ``line_sep`` verbatim.  For the
    default newline the two coincide; for an escaped/metacharacter
    separator (e.g. ``line_sep='\\\\|'``) pass the literal
    ``join_sep='|'`` or the rebuilt text diverges from the original.

    The rebuild is a per-doc ``collect_list(struct(line_no, line))``
    sorted in-array — doc-sized state partitioned by doc_id, so it
    scales with document count; the order key makes the output
    byte-deterministic under any shuffle placement."""
    if join_sep is None:
        join_sep = line_sep
    lt = line_table(df, text_col, id_col, line_sep)
    dec = line_dedup_decisions(df, text_col, id_col, line_sep)
    kept = lt.join(dec.filter("kept"), ["doc_id", "line_no"], "left_semi")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            join_sep,
        ).alias("clean_text"),
    )
    totals = lt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def c4_line_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_words: int = 5,
    require_terminal_punct: bool = True,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Per-line C4 rule decision table: (doc_id, line_no, n_words,
    too_short, no_terminal, blocklisted, has_brace, kept) — one row
    per non-blank line, ``kept`` iff NO rule fired.  The rules are
    C4 §2.2's line set: >= ``min_words`` words, terminal
    punctuation (toggleable — corpora without sentence punctuation,
    e.g. ASR transcripts, disable it), word blocklist, and the
    curly-brace code filter.  All columns are narrow expressions —
    the full table costs one pass, no shuffle."""
    lt = line_table(df, text_col, id_col, line_sep)
    w = tokens(F.col("line"))
    n_words = F.size(w).cast("long")
    too_short = n_words < min_words
    no_terminal: Column = (
        ~F.substring(F.col("line"), -1, 1).isin(*TERMINAL_PUNCT)
        if require_terminal_punct
        else F.lit(False)
    )
    blocklisted: Column = (
        F.arrays_overlap(w, F.array(*[F.lit(b) for b in blocklist]))
        if blocklist
        else F.lit(False)
    )
    has_brace = F.col("line").contains("{") | F.col("line").contains("}")
    return lt.select(
        "doc_id",
        "line_no",
        n_words.alias("n_words"),
        too_short.alias("too_short"),
        no_terminal.alias("no_terminal"),
        blocklisted.alias("blocklisted"),
        has_brace.alias("has_brace"),
        (~(too_short | no_terminal | blocklisted | has_brace)).alias("kept"),
    )


def c4_doc_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_kept_lines: int = 3,
    min_words: int = 5,
    require_terminal_punct: bool = True,
    blocklist: tuple[str, ...] = (),
    lorem_filter: bool = True,
) -> DataFrame:
    """Document-level C4 gate: (doc_id, n_lines, n_kept_lines,
    has_lorem, kept) — a document survives iff >= ``min_kept_lines``
    of its lines pass the line rules AND (when ``lorem_filter``) it
    does not contain the placeholder phrase "lorem ipsum" (C4 §2.2).
    Every input document gets a row (documents with zero surviving
    lines report n_kept_lines = 0), so the decision table composes
    with joins.  One count aggregation partitioned by doc_id."""
    rules = c4_line_rules(
        df, text_col, id_col, line_sep,
        min_words, require_terminal_punct, blocklist,
    )
    per_doc = rules.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("kept").cast("long")).alias("n_kept_lines"),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem"),
    )
    # has_lorem is always REPORTED; it only FIRES when lorem_filter
    lorem_fires = F.col("has_lorem") if lorem_filter else F.lit(False)
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept_lines", F.lit(0)).alias("n_kept_lines"),
            "has_lorem",
            (
                (F.coalesce("n_kept_lines", F.lit(0)) >= min_kept_lines)
                & ~lorem_fires
            ).alias("kept"),
        )
    )


def reflow_lines(
    df: DataFrame,
    tokens_per_line: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Rewrite ``text_col`` with a newline every ``tokens_per_line``
    whitespace tokens — the substrate adapter that turns a
    single-line corpus into a lined one (the oracle gates and units
    use it to exercise the line family on the newline-free synthetic
    documents; ASR/OCR pipelines use the same reflow before line
    rules).  Narrow expression, deterministic."""
    w = tokens(F.col(text_col))
    n_lines = F.ceil(F.size(w) / F.lit(tokens_per_line)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(w, i * tokens_per_line + 1, tokens_per_line), " "
        ),
    )
    return df.withColumn(
        text_col,
        F.when(F.size(w) > 0, F.array_join(lines, "\n")).otherwise(F.lit("")),
    )
