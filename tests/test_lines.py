"""Units for the line-level corpus family (llm/lines.py): crafted-text
semantics the synthetic-substrate oracle gates cannot exercise —
terminal punctuation on real sentences, blank-line positions,
fully-duplicated documents, rebuild order."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.llm import lines


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_table_preserves_positions_and_drops_blanks(spark):
    df = _df(spark, [(1, "alpha\n\n  beta  \ngamma")])
    got = {
        (r.line_no, r.line)
        for r in lines.line_table(df).collect()
    }
    # blank line keeps its slot (line 1 vanishes, positions 0/2/3 stay)
    assert got == {(0, "alpha"), (2, "beta"), (3, "gamma")}


def test_line_dedup_keeps_first_occurrence_across_docs(spark):
    df = _df(
        spark,
        [
            (1, "unique one\nshared footer"),
            (2, "shared footer\nunique two"),
            (3, "shared footer"),
        ],
    )
    dec = {
        (r.doc_id, r.line_no): (r.kept, r.n_copies)
        for r in lines.line_dedup_decisions(df).collect()
    }
    assert dec[(1, 0)] == (True, 1)
    assert dec[(1, 1)] == (True, 3)   # first occurrence of the footer
    assert dec[(2, 0)] == (False, 3)
    assert dec[(2, 1)] == (True, 1)
    assert dec[(3, 0)] == (False, 3)


def test_line_dedup_rebuild_order_and_empty_docs(spark):
    df = _df(
        spark,
        [
            (1, "a a\nb b\nc c"),
            (2, "b b\na a\nz z"),   # loses both repeats, keeps z z
            (3, "a a"),             # fully duplicated -> empty
        ],
    )
    out = {r.doc_id: r for r in lines.line_dedup(df).collect()}
    assert out[1].clean_text == "a a\nb b\nc c"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    assert out[2].clean_text == "z z"
    assert (out[2].n_lines, out[2].n_kept) == (3, 1)
    assert out[3].clean_text == ""
    assert (out[3].n_lines, out[3].n_kept) == (1, 0)


def test_c4_line_rules_real_sentences(spark):
    df = _df(
        spark,
        [
            (
                1,
                "This is a perfectly fine prose sentence.\n"
                "too short.\n"
                "this line has enough words but no terminal punct\n"
                "function main() { return 0; }\n"
                "click here to subscribe to our newsletter today!",
            )
        ],
    )
    rules = {
        r.line_no: r
        for r in lines.c4_line_rules(
            df, min_words=5, blocklist=("subscribe",)
        ).collect()
    }
    assert rules[0].kept
    assert rules[1].too_short and not rules[1].kept
    assert rules[2].no_terminal and not rules[2].kept
    assert rules[3].has_brace and not rules[3].kept
    assert rules[4].blocklisted and not rules[4].kept


def test_c4_doc_filter_lorem_and_min_lines(spark):
    good = (
        "One full sentence of adequate length here.\n"
        "Another full sentence of adequate length here.\n"
        "A third full sentence of adequate length here."
    )
    df = _df(
        spark,
        [
            (1, good),
            (2, good + "\nLorem ipsum dolor sit amet filler text."),
            (3, "Only one good sentence of adequate length."),
        ],
    )
    out = {r.doc_id: r for r in lines.c4_doc_filter(df).collect()}
    assert out[1].kept and out[1].n_kept_lines == 3
    assert out[2].has_lorem and not out[2].kept
    assert out[3].n_kept_lines == 1 and not out[3].kept
    # lorem_filter=False: the column still reports, the rule no
    # longer fires (doc 2 has 4 kept lines, so it survives)
    off = {
        r.doc_id: r
        for r in lines.c4_doc_filter(df, lorem_filter=False).collect()
    }
    assert off[2].has_lorem and off[2].kept
    assert off[1].kept and not off[3].kept


def test_line_dedup_join_sep_for_regex_separators(spark):
    # line_sep is a regex; '\\|' splits on literal '|' but would
    # re-join as the two characters '\|' — join_sep restores it
    df = _df(spark, [(1, "alpha beta|alpha beta|gamma delta")])
    out = lines.line_dedup(
        df, line_sep=r"\|", join_sep="|"
    ).collect()[0]
    assert out.n_lines == 3 and out.n_kept == 2
    assert out.clean_text == "alpha beta|gamma delta"


def test_reflow_lines_chunks_and_empty(spark):
    df = _df(spark, [(1, "a b c d e f g"), (2, "")])
    out = {r.doc_id: r.text for r in lines.reflow_lines(df, 3).collect()}
    assert out[1] == "a b c\nd e f\ng"
    assert out[2] == ""


def test_html_to_text_block_newlines(spark):
    from spotify_streaming_etl_pipeline_spark.llm.text import html_to_text
    from pyspark.sql import functions as F

    html = (
        "<html><body><h1>Title</h1><p>first para</p>"
        "<p>second<br>third</p><div>fourth</div>"
        "<script>var x = 1;</script></body></html>"
    )
    df = spark.createDataFrame([(html,)], "h string")
    one_line, lined = df.select(
        html_to_text(F.col("h")).alias("a"),
        html_to_text(F.col("h"), block_newlines=True).alias("b"),
    ).collect()[0]
    assert one_line == "Title first para second third fourth"
    assert lined == "Title\nfirst para\nsecond\nthird\nfourth"


def test_curriculum_order_bands_and_determinism(spark):
    from spotify_streaming_etl_pipeline_spark.llm.curation import (
        curriculum_order,
    )

    rows = [(i, [0.9, 0.6, 0.3, 0.1, None][i % 5]) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    out = curriculum_order(df).collect()
    got = {r.doc_id: r for r in out}
    # threshold bands, cleanest first; null score -> worst band
    assert got[0].bucket == 0   # 0.9
    assert got[1].bucket == 1   # 0.6
    assert got[2].bucket == 2   # 0.3
    assert got[3].bucket == 3   # 0.1
    assert got[4].bucket == 3   # None -> 0.0
    # positions are a 0-based permutation within each band
    from collections import defaultdict

    bands = defaultdict(list)
    for r in out:
        bands[r.bucket].append(r.position)
    for b, ps in bands.items():
        assert sorted(ps) == list(range(len(ps))), b
    # deterministic across runs
    again = {r.doc_id: (r.bucket, r.position)
             for r in curriculum_order(df).collect()}
    assert again == {r.doc_id: (r.bucket, r.position) for r in out}
