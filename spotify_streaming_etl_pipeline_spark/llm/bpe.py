"""Byte-pair-encoding merge learning — distributed tokenizer training.

The real Sennrich-style BPE training loop, Spark-first:

1. ONE corpus pass collapses the text to a word-frequency table —
   the reason BPE training scales: every later round iterates over the
   vocabulary (distinct words), not the corpus.  At 100 TB the corpus
   is petabytes but the word table is millions of rows.
2. Each merge round is one map-side-combined aggregation (adjacent
   symbol pairs weighted by word count), a driver-side argmax of ONE
   row (deterministic ties: count desc, then pair), and a native
   ``F.aggregate`` fold applying the merge greedily left-to-right —
   no Python UDFs anywhere.
3. The evolving symbol table is ``localCheckpoint``-ed per round, so
   the plan stays round-sized instead of accreting k nested folds
   (same lineage-truncation discipline as the connected-components
   loop in ``llm/dedup.py``).

Variant notes: merges are intra-word (no end-of-word marker), and the
greedy fold mirrors the classic leftmost-first merge application —
after "aa" merges in "aaaa", the result is [aa, aa], not [aa, a, a].
The unrolled DuckDB oracle (``plans/llm_text_gates.py:bpe_train_merges``)
reproduces the full loop with list_reduce, so the gate hashes the
ENTIRE iterative computation, not a single round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGES_SCHEMA = (
    "merge_rank long, left_sym string, right_sym string, "
    "merged string, pair_count long"
)


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus -> (word, cnt) collapse every round iterates over."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost-first application of one merge to a symbol
    array, as a native fold (no Python): walking left to right, when
    the accumulated tail equals ``left`` and the next symbol is
    ``right``, replace the tail with the merged symbol.  Because the
    merged string differs from ``left``, a freshly-merged symbol never
    immediately re-merges — exactly the classic non-overlapping
    greedy semantics ("aaaa" + (a,a) -> [aa, aa])."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the
    ordered merge table (merge_rank, left_sym, right_sym, merged,
    pair_count) — the trained tokenizer artifact.

    Per round: one distributed pair-count aggregation over the
    vocabulary-sized symbol table, a 1-row driver argmax, one fold
    application, one lineage-truncating checkpoint.  Stops early if
    the best pair's count falls below ``min_count``."""
    spark = docs.sparkSession
    vocab = (
        word_freq(docs, text_col)
        .select("cnt", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(n_merges):
            pairs = vocab.select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1),
                        F.slice("syms", 2, F.size("syms") - 1),
                    )
                ).alias("p"),
            ).select(
                F.col("p.0").alias("l"), F.col("p.1").alias("r"), "cnt"
            )
            best = (
                pairs.groupBy("l", "r")
                .agg(F.sum("cnt").cast("long").alias("n"))
                .orderBy(F.desc("n"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_count:
                break
            l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
            merges.append((rank, l, r, l + r, n))
            # LAZY checkpoint: the next round's argmax collect
            # materializes it (lineage truncates there all the same),
            # and the LAST round's — whose vocab nothing consumes —
            # never runs at all; eager paid one extra job per merge.
            vocab = vocab.withColumn(
                "syms", apply_merge(F.col("syms"), l, r)
            ).localCheckpoint(eager=False)
    finally:
        pass  # checkpointed RDDs are GC-reclaimed with the DataFrames
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to tokenize a corpus: per document,
    split words to characters and fold each merge in rank order —
    the serving half of BPE (train once, encode anywhere).  Returns
    (doc_id, tokens array<string>).  All native expressions; merge
    application composes ``apply_merge`` per rank, so keep the list
    short or pre-materialize intermediate steps for big vocabularies."""
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    syms = F.split("word", "")
    for left, right in merges:
        syms = apply_merge(syms, left, right)
    toks = words.select("doc_id", "pos", syms.alias("syms"))
    return (
        toks.select(
            "doc_id", "pos", F.posexplode("syms").alias("i", "tok")
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "i", "tok"))
            ).alias("st")
        )
        .select(
            "doc_id",
            F.transform(F.col("st"), lambda s: s["tok"]).alias("tokens"),
        )
    )
