"""The REST enrichment as a first-class Spark data source (Spark 4
Python Data Source API): ``spark.read.format("rest_enrichment")``.

Where ``sources/enrichment.py`` offers a driver-side loop and a
``mapInPandas`` wrapper, this registers the SAME batch/retry/
dead-letter fetch loop (`fetch_in_batches`) as a planned SOURCE:

- the URI list splits into ``uris_per_partition`` chunks, one input
  partition each — fetch parallelism is cluster-scheduled like any
  scan, shows up in the UI as a scan, and composes with every
  downstream operator (the mapInPandas form is an opaque stage in the
  middle of a plan);
- successes and dead letters come back in ONE frame
  (``error_reason IS NULL`` splits them), so the caller lands both
  sides with ordinary filters instead of wiring two code paths;
- the URI feed can ride an option two ways: ``uris`` (inline JSON
  list — fine for dim-sized sets, but the list materializes on the
  driver) or ``uris_path`` (a parquet file/dir with a ``uri`` column
  — the SCALE form: the driver reads only parquet FOOTER metadata to
  plan one partition per row group, and each executor reads its own
  row group once with pyarrow, so an arbitrarily large URI set never
  exists as a driver-side Python object; fetch parallelism follows
  the staging file layout — repartition the URI frame before writing,
  as ``pipeline.enrich_datasource`` does).

The ``fetch`` callable must be importable on executors, so it is
passed as a ``"module:attr"`` string option (options are strings by
API contract).  If the resolved attribute is marked with
``__rest_factory__ = True`` it is called once per partition to
produce the real fetch callable — that lets tests and credentialed
clients close over state that cannot be pickled into an option.

At 100 TB scale-mind the API's global rate limit exactly as with
``enrich_partitions``: cap ``uris_per_partition`` × concurrent tasks,
or wrap ``fetch`` in a token bucket.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .enrichment import BATCH_SIZE, fetch_in_batches


class UriChunk(InputPartition):
    def __init__(self, uris: list[str]):
        self.uris = uris


class UriFileChunk(InputPartition):
    """One parquet ROW GROUP: (path, row_group).  Planned from footer
    metadata only; the rows are read executor-side, each row group
    read exactly once.  (A row-RANGE chunking was rejected: parquet
    cannot seek to a row inside a row group, so k sub-chunks of one
    group would each decode the whole group — k-fold read
    amplification on exactly the large feeds the path exists for.
    Fetch parallelism therefore follows the STAGING LAYOUT — writers
    control it by repartitioning the URI frame before the parquet
    write, as ``pipeline.enrich_datasource`` does.)"""

    def __init__(self, path: str, row_group: int):
        self.path, self.row_group = path, row_group


def _resolve_fetch(path: str):
    mod_name, attr = path.split(":")
    obj = getattr(importlib.import_module(mod_name), attr)
    if getattr(obj, "__rest_factory__", False):
        obj = obj()
    return obj


class RestEnrichmentReader(DataSourceReader):
    def __init__(self, options: dict):
        self.uris = (
            json.loads(options["uris"]) if "uris" in options else None
        )
        self.uris_path = options.get("uris_path")
        if self.uris is None and self.uris_path is None:
            raise ValueError("rest_enrichment needs 'uris' or 'uris_path'")
        self.uri_col = options.get("uri_col", "uri")
        self.entity = options.get("entity", "artists")
        self.fetch_path = options["fetch"]
        self.per_partition = int(options.get("uris_per_partition", "200"))
        self.batch_size = int(options.get("batch_size", str(BATCH_SIZE)))
        self.retry_limit = int(options.get("retry_limit", "2"))

    def _file_partitions(self) -> list[UriFileChunk]:
        """One chunk per parquet row group, planned from footers alone
        — the driver never holds the URI values and each executor
        reads its own row group exactly once."""
        import glob
        import os

        import pyarrow.parquet as pq

        if os.path.isdir(self.uris_path):
            files = sorted(
                glob.glob(os.path.join(self.uris_path, "*.parquet"))
            )
        else:
            files = [self.uris_path]
        parts: list[UriFileChunk] = []
        for f in files:
            meta = pq.ParquetFile(f).metadata
            parts.extend(UriFileChunk(f, g) for g in range(meta.num_row_groups))
        return parts

    def partitions(self) -> list[InputPartition]:
        if self.uris_path is not None:
            return self._file_partitions() or [UriChunk([])]
        step = max(1, self.per_partition)
        return [
            UriChunk(self.uris[i : i + step])
            for i in range(0, len(self.uris), step)
        ] or [UriChunk([])]

    def _partition_uris(self, partition: InputPartition) -> list[str]:
        if isinstance(partition, UriFileChunk):
            import pyarrow.parquet as pq

            tbl = pq.ParquetFile(partition.path).read_row_group(
                partition.row_group, columns=[self.uri_col]
            )
            return sorted(
                {u for u in tbl.column(0).to_pylist() if u is not None}
            )
        return partition.uris

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        fetch = _resolve_fetch(self.fetch_path)
        result = fetch_in_batches(
            self._partition_uris(partition),
            fetch,
            self.entity,
            batch_size=self.batch_size,
            retry_limit=self.retry_limit,
        )
        for uri, payload in result.records:
            yield (uri, json.dumps(payload, sort_keys=True), None)
        for uri, _etype, reason in result.failures:
            yield (uri, None, reason)


class RestEnrichmentDataSource(DataSource):
    """``spark.dataSource.register(RestEnrichmentDataSource)`` then
    ``spark.read.format("rest_enrichment").options(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "rest_enrichment"

    def schema(self) -> str:
        return "uri string, raw_data string, error_reason string"

    def reader(self, schema) -> RestEnrichmentReader:
        return RestEnrichmentReader(self.options)

    def simpleStreamReader(self, schema) -> "RestEnrichmentStreamReader":
        return RestEnrichmentStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming form: poll the URI feed incrementally with replayable
# offsets (Spark 4 SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------


class RestEnrichmentStreamReader(SimpleDataSourceStreamReader):
    """Offsets are indexes into the (ordered) URI feed: each trigger
    fetches the next ``uris_per_batch`` URIs; ``readBetweenOffsets``
    re-fetches a committed range verbatim on recovery, which is what
    makes the source replayable — the fetch MUST be deterministic for
    a given URI (same contract the oracle gates elsewhere).  This is
    the incremental-enrichment half of the reference's extractor (new
    URIs stream in, enrichment keeps up) with checkpointed progress
    instead of a processed-flag table."""

    def __init__(self, options: dict):
        self.uris = json.loads(options["uris"])
        self.entity = options.get("entity", "artists")
        self.fetch_path = options["fetch"]
        self.per_batch = int(options.get("uris_per_batch", "100"))
        self.batch_size = int(options.get("batch_size", str(BATCH_SIZE)))
        self.retry_limit = int(options.get("retry_limit", "2"))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _rows(self, lo: int, hi: int):
        fetch = _resolve_fetch(self.fetch_path)
        result = fetch_in_batches(
            self.uris[lo:hi], fetch, self.entity,
            batch_size=self.batch_size, retry_limit=self.retry_limit,
        )
        for uri, payload in result.records:
            yield (uri, json.dumps(payload, sort_keys=True), None)
        for uri, _etype, reason in result.failures:
            yield (uri, None, reason)

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.per_batch, len(self.uris))
        # iter(list), not a generator: the simple-reader prefetch
        # cache pickles the rows alongside the offset (generators
        # don't pickle; list iterators do)
        return iter(list(self._rows(lo, hi))), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["index"], end["index"])))
