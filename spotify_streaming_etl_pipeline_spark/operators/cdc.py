"""CDC apply: merge an insert/update/delete change feed into a keyed
snapshot — MERGE INTO semantics as pure dataflow (additive family,
SURVEY §2.11; the reference's loader only upserts, reference
scripts/connectors/db_manager.py ON CONFLICT — deletes and ordered
change collapsing are beyond it).

Scale shape: one shuffle of the (much smaller) change feed to collapse
per-key history, then ONE outer join against the snapshot on the key.
The snapshot is never window-scanned — only joined — so cost is
snapshot-scan + feed-size, the same as any incremental merge on a
lakehouse table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPS = ("I", "U", "D")


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Collapse a change feed to each key's LATEST row by ``seq_col``
    (a total order: log offset, LSN, commit ts + tiebreak). Earlier
    changes for a key are superseded — applying only the survivor is
    what makes the merge idempotent and batch-size-independent. The
    op plays no role here: a superseded delete loses to a later
    update purely by sequence order."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """New snapshot = base MERGE change feed:

    - key only in base                     -> kept as-is
    - latest change D                      -> row removed
    - latest change I/U                    -> change's payload wins
      (insert-or-update: upsert semantics, so replayed feeds and
      I-vs-U misclassification cannot corrupt the result)

    ``changes`` must carry every base column plus ``op_col`` and
    ``seq_col``. Payload columns are taken wholesale from the change
    row (full-row images, the Debezium-style contract).

    Ops outside {I, U, D} — lowercase 'd', 'delete', connector enums —
    FAIL the job via a per-row assert instead of being silently
    applied as upserts (a lowercase-'d' feed would otherwise
    materialize every delete as an update and the snapshot would
    diverge without any signal)."""
    payload = [c for c in base.columns if c not in key_cols]
    # The guard is woven INTO the op column (a pruned side-channel
    # assert column would be optimized away and never evaluate).
    changes = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin(*OPS), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"apply_cdc: invalid {op_col}="),
                    F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                    F.lit(" (expected one of I/U/D)"),
                )
            )
        ),
    )
    last = latest_changes(changes, key_cols, seq_col)
    joined = base.alias("b").join(
        last.alias("c"), on=key_cols, how="full_outer"
    )
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    pick = lambda c: F.when(  # noqa: E731 - tight column chooser
        F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{c}")
    ).otherwise(F.col(f"b.{c}"))
    return joined.filter(keep).select(
        *[F.col(k) for k in key_cols],
        *[pick(c).alias(c) for c in payload],
    )
