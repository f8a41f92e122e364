"""End-to-end parity of every registered query vs its DuckDB oracle —
the local replica of the driver's correctness gate (t2)."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duckdb_con


def _pairs():
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    return qs, oracles


def test_every_query_has_an_oracle_or_is_flagged():
    qs, oracles = _pairs()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"


QUERY_NAMES = sorted(_pairs()[0].keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    qs, oracles = _pairs()
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0
        return
    con = duckdb_con(sf_dir)
    oracle_pdf = con.execute(oracles[name]).fetchdf()
    spark_df = qs[name](spark, sf_dir)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
