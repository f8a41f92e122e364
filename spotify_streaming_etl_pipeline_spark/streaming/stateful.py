"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in stateful operators (windowed aggs, session_window,
dropDuplicates-with-watermark) cover most of SURVEY §2.9; this module
is the escape hatch for semantics they can't express. First resident:
**cross-batch exactly-once dedup with state TTL** — the streaming
form of the reference's ``ON CONFLICT DO NOTHING`` idempotency
(reference scripts/connectors/db_manager.py:72): an event key admits
exactly one row across micro-batches, and its dedup state expires
after ``ttl_minutes`` of processing time so state stays bounded (the
trade: a duplicate arriving later than the TTL is re-admitted —
choose TTL >= the source's max redelivery window).

Scale: state lives in the state store partitioned by key — per-key
bytes are a single marker, so memory is O(distinct keys in TTL), not
O(stream length). Arrow batches keep the Python hop columnar.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

STATE_SCHEMA = StructType.fromJson(
    {"type": "struct", "fields": [{"name": "seen", "type": "boolean", "nullable": False, "metadata": {}}]}
)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ttl_minutes: int = 60,
) -> DataFrame:
    """Emit the first row per key across micro-batches; drop the rest
    while the key's state lives (TTL-refreshed on every sighting)."""
    schema = events.schema

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already_seen = state.exists
        state.update((True,))
        state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if already_seen:
            return
        for pdf in pdfs:
            if len(pdf):
                yield pdf.head(1)
                return

    return (
        events.groupBy(*key_cols)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_dedup_to_memory(
    stream: DataFrame,
    key_cols: list[str],
    query_name: str,
    ttl_minutes: int = 60,
) -> Any:
    """Convenience: dedup_stream -> in-memory sink (tests/demos)."""
    return (
        dedup_stream(stream, key_cols, ttl_minutes)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time streaming dedup via the NATIVE
    ``dropDuplicatesWithinWatermark``: one row per key among rows whose
    event times fall within the watermark delay of each other; state
    for a key is dropped once the watermark passes its event time.

    The companion to ``dedup_stream``: that one bounds state by
    PROCESSING-time TTL (redelivery windows measured on the wall
    clock), this one by EVENT time (late data governed by the same
    watermark as the windowed aggregates downstream). Prefer this form
    when the pipeline already reasons in event time — one watermark
    setting then rules both dedup and aggregation state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas form of the TTL dedup
# ---------------------------------------------------------------------------


class DedupStateProcessor:
    """The ``transformWithStateInPandas`` handler behind
    ``dedup_stream_tws``, hoisted to module level so its LOGIC is
    executable without the TWS state server: a unit test instantiates
    it, calls ``init`` with a stubbed handle whose ``getValueState``
    returns an in-memory ValueState, and drives ``handleInputRows``
    directly (``tests/test_streaming_aggregates.py::
    test_tws_handler_logic_with_stubbed_state``).  The end-to-end
    wiring stays covered by the protobuf-gated parity test.

    The base class is only mixed in lazily (``_as_stateful_processor``)
    because subclassing is the sole runtime requirement the real API
    imposes — the handler protocol itself (init / handleInputRows /
    close) is plain Python.

    State per key is one boolean ValueState with
    ``ttlDurationMs = ttl_minutes``; every sighting — including a
    dropped duplicate — re-``update``s the state, because TTL in this
    API is measured from the last update: without the refresh a key
    seen at t=0 and t=55min would expire at t=60 and re-admit a t=70
    duplicate that the legacy form (which resets its timeout on every
    sighting) still drops."""

    def __init__(self, ttl_minutes: int) -> None:
        self._ttl_ms = ttl_minutes * 60 * 1000

    def init(self, handle: Any) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: Any
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            # refresh the TTL on the duplicate sighting (parity with
            # the legacy form's per-sighting timeout reset)
            self._seen.update((True,))
            for _ in rows:
                pass
            return
        self._seen.update((True,))
        for pdf in rows:
            if len(pdf):
                yield pdf.head(1)
                return

    def close(self) -> None:
        pass


def _as_stateful_processor(ttl_minutes: int) -> Any:
    """Wrap DedupStateProcessor in the real ``StatefulProcessor`` base
    class (imported lazily — the class itself imports everywhere, but
    keeping the import local mirrors the runtime boundary: only the
    streaming entry point needs it)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Processor(DedupStateProcessor, StatefulProcessor):
        pass

    return _Processor(ttl_minutes)


def dedup_stream_tws(
    events: DataFrame,
    key_cols: list[str],
    ttl_minutes: int = 60,
) -> DataFrame:
    """The ``dedup_stream`` semantics on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: typed state handles (ValueState /
    ListState / MapState) with NATIVE per-state TTL instead of a
    hand-managed timeout, timers as a first-class concept, and an
    evolvable-schema state store.  Kept alongside the legacy form so
    both front ends are exercised.

    Verification status: the handler LOGIC (``DedupStateProcessor``)
    is executed in-sandbox by a stubbed-state unit test; the
    end-to-end state-server wiring is covered by
    ``test_tws_dedup_matches_legacy_dedup``, which auto-skips where
    ``google.protobuf`` (a transformWithStateInPandas runtime
    dependency) is absent.  Dependency investigation (round 6): in the
    build sandbox the protobuf runtime is confirmed unobtainable — no
    wheel anywhere on disk, no network, installs disallowed; a local
    shim would mean reimplementing the protobuf descriptor runtime.
    The parity test runs (and must pass) automatically in any
    environment that has protobuf."""
    return events.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_as_stateful_processor(ttl_minutes),
        outputStructType=events.schema,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
