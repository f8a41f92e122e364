"""Sequence packing and shard assignment — the layout stage of a
training-data pipeline: after curation, documents become a token
stream chunked into fixed-size context windows, and the corpus is
dealt into shards for data-parallel loaders.

Both operators need a deterministic global order and a global prefix
sum over it. A naive ``Window.orderBy(...)`` with no partition key
plans a SINGLE-partition window — correct on a laptop, a one-task
straggler at 100 TB. The scalable shape used here is the classic
two-level scan:

1. bucket every doc by its portable hash (``h % n_buckets``);
2. cumulative sums run *within* buckets (parallel windows, one
   shuffle on the bucket key);
3. per-bucket totals (``n_buckets`` rows) get a driver-sized global
   prefix, broadcast-joined back.

The resulting total order is (bucket, h, doc_id) — bucket-major, but
any fixed pseudorandom order is equally good for training-data
layout, and this one costs one parallel shuffle instead of a global
sort. The DuckDB oracle reproduces the arithmetic exactly (md5-based
hash, explicit ROWS frames).

The packing semantics are GPT-style concat-and-chunk: documents are
concatenated in stream order and the stream is cut every
``ctx_tokens``; a document may straddle a cut, so its span is
reported as [first_chunk, last_chunk]. (No-split greedy bin packing
is inherently sequential — each decision depends on the running
remainder — and is deliberately not offered as a distributed op.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash48, token_count_ws

N_BUCKETS = 8


def _stream_positions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """(id, n_tokens, start_offset): each doc's token-count and its
    offset in the deterministic concatenated token stream."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).alias("n_tokens"),
        portable_hash48(F.col(id_col).cast("string")).alias("h"),
    ).withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum_in_bucket", F.sum("n_tokens").over(w_in))
    totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("tot"))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Global window over n_buckets rows only — bounded by construction.
    offsets = totals.withColumn(
        "bucket_offset", F.sum("tot").over(w_b) - F.col("tot")
    ).select("bucket", "bucket_offset")
    return cum.join(F.broadcast(offsets), "bucket").select(
        id_col,
        "n_tokens",
        (F.col("bucket_offset") + F.col("cum_in_bucket") - F.col("n_tokens"))
        .cast("long")
        .alias("start_offset"),
    )


def pack_concat_chunks(
    df: DataFrame,
    ctx_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Concat-and-chunk packing: (doc_id, n_tokens, start_offset,
    first_chunk, last_chunk) with chunk = floor(offset / ctx_tokens).
    Empty docs occupy no stream space and report their insertion
    point's chunk for both ends."""
    pos = _stream_positions(df, text_col, id_col, n_buckets)
    end = F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return pos.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / ctx_tokens).cast("long").alias("first_chunk"),
        F.floor(end / ctx_tokens).cast("long").alias("last_chunk"),
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deal documents into ``n_shards`` pseudorandom shards with a
    deterministic within-shard position — the layout contract of a
    data-parallel loader (shard = worker, pos = step order). One
    shuffle on the shard key; windows are per-shard, never global."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        portable_hash48(F.col(id_col).cast("string")).alias("h"),
    ).withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("long"))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return base.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
