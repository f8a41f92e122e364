"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side by side, then compares
row count, column names, and order-insensitive values. Floats are
compared exactly after a round-trip through a canonical string form —
if this passes, the driver's value hash should too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isinf(v):
            # int(inf) raises; canon must be total over IEEE doubles.
            return repr(v)
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            # Preserve the sign bit of zero: the driver's value hash
            # distinguishes -0.0 from +0.0 (bigram_pmi went red in
            # CORRECTNESS_r04 while this gate, which collapsed both
            # to "0", stayed green). Canon must be >= driver-strict.
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canon_rows(spdf), canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:5]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:5]
        problems.append(
            f"values differ; spark-only (≤5): {diff_s}; oracle-only (≤5): {diff_o}"
        )
    return problems
