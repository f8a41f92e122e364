"""Bench harness contract: one broken query must not take down the
suite (round-2 postmortem — a single AnalysisException produced a
rc=1 bench with zero recorded timings). The JSON line always prints;
failures are recorded per-query; exit is nonzero only when EVERY
query fails."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import SparkSession


def _run_bench(monkeypatch, capsys, queries):
    import bench
    import __spark_entry__ as entry

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_WARM2_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(entry, "queries", lambda: queries)
    # bench stops its session on exit; keep the shared test session alive.
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def _ok(spark, sf_dir):
    return spark.range(5).selectExpr("id")


def _boom(spark, sf_dir):
    raise ValueError("kaboom: injected failure")


def test_one_failure_is_isolated(monkeypatch, capsys, spark):
    result = _run_bench(monkeypatch, capsys, {"ok": _ok, "boom": _boom})
    assert "ok" in result["queries"]
    assert "boom" not in result["queries"]
    assert result["errors"]["boom"].startswith("ValueError: kaboom")
    assert result["metric"] == "suite_total_wall_clock"


def test_all_failures_exit_nonzero(monkeypatch, capsys, spark):
    with pytest.raises(SystemExit) as exc:
        _run_bench(monkeypatch, capsys, {"boom": _boom})
    assert exc.value.code == 1
    # The JSON line still printed before exit.
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed["errors"]["boom"].startswith("ValueError")


def test_median_of_n_runs_reported(monkeypatch, capsys, spark):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "3")
    result = _run_bench(monkeypatch, capsys, {"ok": _ok})
    assert result["runs"] == 3
    assert "ok" in result["queries"]


def test_standalone_mode_fresh_process(monkeypatch, capsys):
    """SPARK_GRAFT_STANDALONE=1 runs each query in its own subprocess
    (fresh JVM/SparkSession) — the suite-context-free column the
    round-11 drift A/Bs called for."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_STANDALONE", "1")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_WARM2_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_QUERIES", "top_parts")
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["metric"] == "standalone_total_wall_clock"
    assert summary["mode"] == "standalone"
    assert summary["n_queries"] == 1 and summary["n_errors"] == 0
    assert "top_parts" in summary["queries"]
