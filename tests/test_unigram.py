"""Units for the unigram-LM tokenizer family (llm/unigram.py):
seeding, integer-cost Viterbi segmentation, hard-EM pruning,
encoding, and the dead-letter path for uncoverable words."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm import unigram as U


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seed_vocab_counts_and_char_exemption(spark):
    df = _df(spark, [(1, "abab ab"), (2, "abab")])
    got = {r.piece: r.cnt for r in U.seed_vocab(df, 2).collect()}
    # "abab" x2 + "ab": a appears 2+2+1=5, ab 2+2+1=5, ba 1+1=2, b 5
    assert got == {"a": 5, "b": 5, "ab": 5, "ba": 2}
    # min_count prunes multi-char pieces but never single chars
    pruned = {r.piece for r in U.seed_vocab(df, 2, min_count=3).collect()}
    assert pruned == {"a", "b", "ab"}


def test_train_prunes_to_used_pieces_and_encode_segments(spark):
    docs = _df(
        spark,
        [(1, "ababab abab cdcd"), (2, "abab cd cdcdcd"), (3, "efef ef abab")],
    )
    v = {r.piece: r.cnt for r in U.unigram_train(docs, rounds=1).collect()}
    # Viterbi picks the 2-char pieces everywhere (fewer, frequent);
    # counts = total piece usages; singles and "ba"/"dc" prune out
    assert v == {"ab": 9, "cd": 6, "ef": 3}
    costs = U.piece_costs(U.unigram_train(docs, rounds=1))
    enc = {
        r.doc_id: r.tokens
        for r in U.unigram_encode(docs, costs).collect()
    }
    assert enc[1] == ["ab", "ab", "ab", "ab", "ab", "cd", "cd"]
    assert enc[2] == ["ab", "ab", "cd", "cd", "cd", "cd"]
    assert enc[3] == ["ef", "ef", "ef", "ab", "ab"]


def test_viterbi_prefers_frequent_long_piece_over_singles(spark):
    # cost is ln(T/cnt): the frequent bigram beats two cheap singles
    docs = _df(spark, [(1, "xy " * 20 + "x y")])
    costs = U.piece_costs(U.seed_vocab(docs, 2))
    seg = {
        r.word: list(r.pieces)
        for r in U._segment_words(
            docs.select(F.explode(F.split("text", " ")).alias("word"))
            .filter("word != ''"),
            costs,
            2,
        ).collect()
    }
    assert seg["xy"] == ["xy"]
    assert seg["x"] == ["x"] and seg["y"] == ["y"]


def test_uncoverable_word_dead_letters_as_null(spark):
    train = _df(spark, [(1, "abab abab")])
    costs = U.piece_costs(U.unigram_train(train, rounds=1))
    # "zz" has no covering piece in the trained vocab
    enc = {
        r.doc_id: r.tokens
        for r in U.unigram_encode(
            _df(spark, [(7, "abab zz")]), costs
        ).collect()
    }
    assert enc[7][:2] == ["ab", "ab"]
    assert enc[7][2] is None  # the uncoverable word is a NULL token


def test_multi_round_em_is_stable_on_clean_corpus(spark):
    docs = _df(spark, [(1, "ghgh gh ghghgh"), (2, "gh ghgh")])
    v1 = {r.piece: r.cnt for r in U.unigram_train(docs, rounds=1).collect()}
    v2 = {r.piece: r.cnt for r in U.unigram_train(docs, rounds=2).collect()}
    assert v1 == v2 == {"gh": 9}
