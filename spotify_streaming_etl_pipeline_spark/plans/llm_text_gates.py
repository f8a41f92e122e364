"""Oracle-gated queries for the text-analysis operators (llm/text.py,
llm/bpe.py, llm/tfidf.py, llm/lm_score.py, llm/overlap.py): quality
metrics, vocabulary stats, PMI collocations, tokenizer encode, BPE
merge training, tf-idf cosine pairs, bigram-LM scoring, and
substring-overlap pairs.

Shared DuckDB fragments live in ``llm_shared``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.text import (
    STOPWORDS,
    lang_id,
    quality_metrics,
    token_count_bpe,
    token_count_ws,
)
from .analytics import query
from .llm_shared import (
    _H48,
    _LANG_CASE,
    _LANG_SCORES_SQL,
    _docs,
    _sql_list,
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
    "html_text_extract",
    """
    SELECT doc_id,
           'Title ' || doc_id || ' Para & text ' || doc_id AS text
    FROM documents WHERE doc_id < 200
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (llm/text.py:html_to_text) over
    synthesized real markup — script/style blocks whose CONTENT
    contains tags (the trap naive strippers fall into), comments,
    entities, nbsp — with the oracle predicting the extracted text by
    direct string construction, never re-running the regex chain: an
    INDEPENDENT statement of what extraction must produce (and the
    script-block pattern uses a Java-regex backreference RE2 could
    not mirror anyway)."""
    from ..llm.text import html_to_text

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    sid = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><script>var x='<p>';</script>"
              "<style>p{color:red}</style></head><body><!-- c -->"
              "<h1>Title "),
        sid,
        F.lit("</h1><p>Para &amp; text&nbsp;"),
        sid,
        F.lit("</p></body></html>"),
    )
    return d.select("doc_id", html_to_text(html).alias("text"))


@query(
    "url_canonical_groups",
    """
    SELECT 'https://www.site' || (doc_id // 4) || '.com/a/b?a=2&x=1'
               AS canonical,
           cast(count(*) AS BIGINT) AS n
    FROM documents WHERE doc_id < 200
    GROUP BY 1
    """,
)
def url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for web-corpus dedup (llm/text.py:
    canonical_url): four per-group variants — uppercase host,
    REORDERED query parameters + :443 default port + fragment, a utm_
    tracking parameter, a trailing path slash — must all collapse to
    one canonical form (parameters sorted), so every group counts
    exactly 4. The oracle constructs the canonical strings and counts
    arithmetically; a missed variant shows up as a split group and
    breaks the hash."""
    from ..llm.text import canonical_url

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    base = (F.col("doc_id") / 4).cast("long").cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://www.Site"), base,
                                F.lit(".COM/a/b?x=1&a=2")))
        .when(v == 1, F.concat(F.lit("https://www.site"), base,
                               F.lit(".com:443/a/b?a=2&x=1#frag")))
        .when(v == 2, F.concat(F.lit("https://www.site"), base,
                               F.lit(".com/a/b?utm_source=tw&x=1&a=2")))
        .otherwise(F.concat(F.lit("https://www.site"), base,
                            F.lit(".com/a/b/?x=1&a=2")))
    )
    return (
        d.select(canonical_url(url).alias("canonical"))
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "winnowed_overlap",
    f"""
    WITH wh AS (
        SELECT doc_id, i,
               {_H48.format(x="substring(text, i, 16)")} AS h
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - 14)) AS i
            FROM documents WHERE length(text) >= 16
        )
    ),
    sel AS (
        SELECT DISTINCT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS h
        FROM wh
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           cast(count(*) AS BIGINT) AS n_shared
    FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def winnowed_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint overlap (llm/overlap.py:
    winnowed_overlap_pairs) — the GUARANTEED-recall sibling of mod-p
    selection: the min hash of every 8-hash sliding window, so any
    shared verbatim passage of >= 23 chars must share a fingerprint
    (mod-p has no such worst-case bound). The DuckDB oracle runs the
    identical window frame (ROWS CURRENT..7 FOLLOWING per doc) and
    the same pairing, hash for hash."""
    from ..llm.overlap import winnowed_overlap_pairs

    return winnowed_overlap_pairs(_docs(spark, sf_dir), min_shared=2)


#: unigram substrate: 8 letter-disjoint 2-char pieces; doc d's text
#: is piece[d % 8] repeated 2 + d % 5 times (one word, no spaces)
_UNI_PIECES = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
_UNI_SQL_LIST = "['" + "','".join(_UNI_PIECES) + "']"


def _unigram_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select("doc_id")
    piece = F.element_at(
        F.array(*[F.lit(p) for p in _UNI_PIECES]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    m = (F.col("doc_id") % 5 + 2).cast("int")
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), m), lambda _: piece), ""
    )
    return d.select("doc_id", text.alias("text"))


@query(
    "unigram_vocab",
    f"""
    SELECT ({_UNI_SQL_LIST})[(doc_id % 8)::INT + 1] AS piece,
           cast(sum(2 + doc_id % 5) AS BIGINT) AS cnt
    FROM documents WHERE doc_id < 200
    GROUP BY 1
    """,
)
def unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer TRAINING
    (llm/unigram.py:unigram_train, hard-EM variant): seed every
    <=2-char substring count, quantize integer costs
    round(1000*ln(T/cnt)), Viterbi-segment the distinct words with a
    native-fold DP, re-count pieces from the segmentations.  The
    substrate plants 8 letter-disjoint bigram pieces, each doc one
    word of piece^(2+d%5) — the optimal segmentation is [piece]*m by
    construction (the only m-piece path; singles cost the same per
    char but double the count), so the trained vocabulary must prune
    to EXACTLY the 8 planted pieces with usage counts DuckDB predicts
    arithmetically.  A regression in seeding, cost quantization, the
    DP fold, tie-breaking, or the EM recount changes the piece set or
    its counts."""
    from ..llm.unigram import unigram_train

    return unigram_train(_unigram_corpus(spark, sf_dir), rounds=1)


@query(
    "unigram_tokens",
    f"""
    WITH d AS (
        SELECT doc_id,
               ({_UNI_SQL_LIST})[(doc_id % 8)::INT + 1] AS piece,
               2 + doc_id % 5 AS m
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, cast(m AS BIGINT) AS n_tokens,
           rtrim(repeat(piece || ' ', m::INT)) AS tokens_str
    FROM d
    """,
)
def unigram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram tokenizer SERVING (llm/unigram.py:unigram_encode):
    train on the substrate (one hard-EM round prunes to the 8 planted
    pieces), re-quantize costs, then Viterbi-tokenize every document
    — distinct words segment once, documents reassemble by position.
    DuckDB predicts each doc's token sequence by construction
    ([piece] * m, space-joined); a regression anywhere in the
    train->costs->DP->backpointer-walk->reassembly chain moves
    token strings or counts."""
    from ..llm.unigram import piece_costs, unigram_encode, unigram_train

    corpus = _unigram_corpus(spark, sf_dir)
    costs = piece_costs(unigram_train(corpus, rounds=1))
    enc = unigram_encode(corpus, costs)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join("tokens", " ").alias("tokens_str"),
    )


def _span_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-span substrate with arithmetically PLANTED spans:
    doc layout  prefix G s1 G mid G s0 G mid G s2 G  where the
    prefix/mid runs are doc-UNIQUE markers (every 16-char window
    contains the full ``<%06d>`` doc id, so they never match across
    docs), G is a doc-unique GUARD letter (same-group docs differ by
    multiples of 25, never 0 mod 26, so guards always differ —
    pinning span boundaries exactly: without guards the markers'
    shared structural chars '>'/'<0000' would extend spans
    pair-dependently), s1/s0/s2 are group-shared (g = doc_id % 25)
    non-periodic counter strings of lengths 9*(4+g%3) / exactly 16 /
    27, and the prefix length 8*(2+doc_id%3) varies PER DOC so
    matched spans sit on non-zero diagonals.  Same-group pairs share
    exactly three spans of known offsets; the 16-char s0 pins the
    min_len threshold (dropped at the default 20)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 150).select("doc_id")
    g = (F.col("doc_id") % 25).cast("int")
    m1 = (F.lit(4) + g % 3).cast("int")
    marker = F.format_string("<%06d>", F.col("doc_id"))
    letters = F.lit("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    guard = F.substring(
        letters, ((F.col("doc_id") % 26) + 1).cast("int"), 1
    )

    def rep(n: int):
        return F.concat(*([marker] * n))

    k = F.col("doc_id") % 3
    prefix = (
        F.when(k == 0, rep(2)).when(k == 1, rep(3)).otherwise(rep(4))
    )
    s1 = F.array_join(
        F.transform(
            F.sequence(F.lit(0), m1 - 1),
            lambda j: F.format_string("(%04d:%02d)", g, j),
        ),
        "",
    )
    s0 = F.format_string("<<%04d:abcdefg>>", g)
    s2 = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda j: F.format_string("[%04d:%02d]", g, j),
        ),
        "",
    )
    text = F.concat(
        prefix, guard, s1, guard, rep(2), guard, s0, guard, rep(2),
        guard, s2, guard,
    )
    return d.select("doc_id", text.alias("text"))


#: the span substrate's per-doc arithmetic, shared by both oracles:
#: pa = prefix chars, L1 = first shared block's length
_SPAN_CTE = """
    d AS (
        SELECT doc_id, doc_id % 25 AS g,
               8 * (2 + doc_id % 3) AS pa,
               9 * (4 + (doc_id % 25) % 3) AS l1
        FROM documents WHERE doc_id < 150
    )
"""


@query(
    "verbatim_spans",
    f"""
    WITH {_SPAN_CTE},
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pa AS paa, b.pa AS pab, a.l1 AS l1
        FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           cast(paa + 2 AS BIGINT) AS a_start,
           cast(pab + 2 AS BIGINT) AS b_start,
           cast(l1 AS BIGINT) AS span_len
    FROM p
    UNION ALL
    SELECT doc_a, doc_b,
           cast(paa + l1 + 54 AS BIGINT),
           cast(pab + l1 + 54 AS BIGINT),
           cast(27 AS BIGINT)
    FROM p
    """,
)
def verbatim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact verbatim duplicate-span extraction (llm/overlap.py:
    duplicate_spans) — the Lee et al. 2022 surgical-removal primitive:
    maximal shared substrings with 1-based offsets in BOTH documents,
    found by position-keeping window hashes -> hot-capped posting ->
    join-free matched-position explode -> same-diagonal
    gaps-and-islands merge.  The substrate (``_span_corpus``) PLANTS
    the spans arithmetically: same-group docs share blocks of length
    9*(4+g%3) and 27 at prefix-dependent offsets, plus a 16-char
    block that the min_len=20 threshold must drop — so DuckDB
    predicts every (a_start, b_start, span_len) by construction and
    a regression in hashing, posting, diagonal math, island merge,
    or thresholding moves rows."""
    from ..llm.overlap import duplicate_spans

    return duplicate_spans(_span_corpus(spark, sf_dir), min_len=20)


@query(
    "verbatim_removal",
    f"""
    WITH {_SPAN_CTE},
    k AS (SELECT g, min(doc_id) AS keeper FROM d GROUP BY g),
    nk AS (
        SELECT doc_id, pa, l1 FROM d JOIN k USING (g)
        WHERE doc_id != keeper
    )
    SELECT doc_id, cast(pa + 2 AS BIGINT) AS start,
           cast(l1 AS BIGINT) AS length
    FROM nk
    UNION ALL
    SELECT doc_id, cast(pa + l1 + 54 AS BIGINT), cast(27 AS BIGINT)
    FROM nk
    """,
)
def verbatim_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical-removal intervals (llm/overlap.py:
    removal_intervals): per-document merged character intervals to
    delete, min-doc_id keeper policy — every span charges doc_b, and
    the interval union (running-max gaps-and-islands window) merges
    the duplicate charges a doc receives from its many keepers.
    DuckDB predicts the intervals by construction: every non-keeper
    group member deletes exactly its two planted blocks (the
    identical intervals charged once per same-group keeper pair must
    collapse to one row each, or the hash moves)."""
    from ..llm.overlap import duplicate_spans, removal_intervals

    return removal_intervals(
        duplicate_spans(_span_corpus(spark, sf_dir), min_len=20)
    )


@query(
    "verbatim_clean_docs",
    f"""
    WITH d AS (
        SELECT doc_id, doc_id % 25 AS g,
               2 + doc_id % 3 AS np,
               4 + (doc_id % 25) % 3 AS m1,
               '<' || lpad(doc_id::VARCHAR, 6, '0') || '>' AS mk,
               substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                      (doc_id % 26)::INT + 1, 1) AS gu
        FROM documents WHERE doc_id < 150
    ),
    t AS (
        SELECT doc_id, g, gu, m1,
               repeat(mk, np::INT) AS pre,
               array_to_string(list_transform(range(m1),
                   j -> printf('(%04d:%02d)', g, j)), '') AS s1,
               repeat(mk, 2) AS mid,
               '<<' || lpad(g::VARCHAR, 4, '0') || ':abcdefg>>' AS s0,
               array_to_string(list_transform(range(3),
                   j -> printf('[%04d:%02d]', g, j)), '') AS s2
        FROM d
    ),
    k AS (SELECT g AS kg, min(doc_id) AS keeper FROM d GROUP BY g)
    SELECT doc_id,
           cast(CASE WHEN doc_id = keeper THEN 0
                     ELSE 9 * m1 + 27 END AS BIGINT) AS n_removed,
           CASE WHEN doc_id = keeper
                THEN pre || gu || s1 || gu || mid || gu || s0 || gu
                     || mid || gu || s2 || gu
                ELSE pre || gu || gu || mid || gu || s0 || gu || mid
                     || gu || gu
           END AS clean_text
    FROM t JOIN k ON t.g = k.kg
    """,
)
def verbatim_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surgical dedup EXECUTED (llm/overlap.py:apply_removal):
    spans -> merged removal intervals -> native-fold text rebuild
    (substring slices over the kept gaps — no char explode, no UDF).
    DuckDB predicts every document's FULL cleaned text by
    construction: non-keepers lose exactly the two planted blocks
    (their guards survive, pinning slice boundaries to the
    character), keepers and uncharged docs pass through verbatim
    with n_removed = 0.  Gates the whole chain end to end: a
    one-character slip anywhere in span offsets, interval union, or
    the rebuild fold moves the text hash."""
    from ..llm.overlap import (
        apply_removal,
        duplicate_spans,
        removal_intervals,
    )

    corpus = _span_corpus(spark, sf_dir)
    iv = removal_intervals(duplicate_spans(corpus, min_len=20))
    return apply_removal(corpus, iv)


def _occ_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substrate for the occurrence-form removal gate: doc_id < 120,
    group g = doc_id %% 20; text = doc-unique prefix (2 + doc_id %% 3
    twelve-char units) + the GROUP's shared block (3 + g %% 4 NINE-char
    non-periodic units) + a doc-unique suffix.  Every 16-char window
    is unique except those fully inside the shared block (doc-unique
    GUARD letters fence the block — format-string tails like ':002}'
    would otherwise collide across same-group docs), so the
    duplicated-window islands are exactly the planted blocks and
    DuckDB predicts every (doc_id, start, length) arithmetically."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 120)
    g = F.col("doc_id") % 20
    gu = F.substring(
        F.lit("ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
        ((F.col("doc_id") % 26) + 1).cast("int"),
        1,
    )
    pre = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (F.col("doc_id") % 3) + 1),
            lambda j: F.format_string("{%06d:%03d}", F.col("doc_id"), j),
        ),
        "",
    )
    blk = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (g % 4) + 2),
            lambda j: F.format_string("(%04d#%02d)", g, j),
        ),
        "",
    )
    post = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda j: F.format_string("[%06d:%03d]", F.col("doc_id"), j),
        ),
        "",
    )
    return d.select(
        "doc_id", F.concat(pre, gu, blk, gu, post).alias("text")
    )


@query(
    "verbatim_occurrence_removal",
    """
    WITH d AS (
        SELECT doc_id, doc_id % 20 AS g,
               12 * (2 + doc_id % 3) AS pf,
               9 * (3 + (doc_id % 20) % 4) AS l
        FROM documents WHERE doc_id < 120
    ),
    k AS (SELECT g, min(doc_id) AS keeper, count(*) AS sz
          FROM d GROUP BY g)
    SELECT doc_id, cast(pf + 2 AS BIGINT) AS start,
           cast(l AS BIGINT) AS length
    FROM d JOIN k USING (g)
    WHERE doc_id != keeper AND sz >= 2
    """,
)
def verbatim_occurrence_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-space verbatim removal (llm/overlap.py:
    occurrence_removal_intervals) — the Lee et al. 2022 "keep one
    occurrence of every duplicated substring" form: per window hash
    the min-(doc_id, position) occurrence is canonical and every
    other occurrence is a duplicated window; consecutive duplicated
    positions merge to islands.  One row per OCCURRENCE — never per
    occurrence pair — so a passage shared by g documents costs g
    rows where ``duplicate_spans`` costs g² (the 100 TB removal
    path).  DuckDB predicts the intervals by construction: every
    non-keeper group member is charged exactly its planted block at
    the prefix-determined offset; keepers and singleton groups are
    uncharged."""
    from ..llm.overlap import occurrence_removal_intervals

    return occurrence_removal_intervals(_occ_corpus(spark, sf_dir), min_len=20)


@query(
    "repetition_signals",
    """
    WITH toks AS (
        SELECT doc_id, length(text)::BIGINT AS nc,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, nc, 2 AS n,
               unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i + 1])) AS gram
        FROM toks WHERE len(w) >= 2
        UNION ALL
        SELECT doc_id, nc, 3,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))
        FROM toks WHERE len(w) >= 3
    ),
    c AS (
        SELECT doc_id, nc, n, gram, count(*)::BIGINT AS c
        FROM g GROUP BY ALL
    ),
    r2 AS (
        SELECT doc_id, nc, gram, c,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, gram) AS rk
        FROM c WHERE n = 2
    ),
    top AS (
        SELECT doc_id, nc, gram AS top2_gram, c AS top2_count
        FROM r2 WHERE rk = 1
    ),
    dup AS (
        SELECT doc_id,
               coalesce(sum(CASE WHEN n = 3 AND c >= 2
                                 THEN c * length(gram) END), 0)::BIGINT AS dupch
        FROM c GROUP BY doc_id
    )
    SELECT t.doc_id, t.top2_gram, t.top2_count,
           round(t.top2_count * length(t.top2_gram) / t.nc, 4) + 0.0
               AS top2_char_frac,
           round(d.dupch / t.nc, 4) + 0.0 AS dup3_char_frac
    FROM top t JOIN dup d USING (doc_id)
    """,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (llm/text.py:
    repetition_table): most-frequent-2-gram char coverage and
    duplicated-3-gram char coverage per document — the
    excessive-repetition filter every web-crawl curation pipeline
    applies before training. Spark computes both metrics from one
    tagged explode + two hash aggregations (no joins); the oracle
    mirrors the occurrence counting, the (count desc, gram asc) tie
    break, and the full-occurrence char accounting exactly."""
    from ..llm.text import repetition_table

    return repetition_table(_docs(spark, sf_dir))
