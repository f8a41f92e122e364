"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints one JSON
line with per-query wall-clock seconds (median of
$SPARK_GRAFT_BENCH_RUNS timed runs, default 3 — single-run timings at
this scale swing +/-40% with suite context, enough to fake or mask a
regression).

Execution is measured with the `noop` sink so we time the full
distributed compute (scan → shuffle → agg) without driver-collect
overhead dominating small results.

Each query is first executed once at sf0.001 (~6k rows): the plan and
expression trees are identical across scale factors, so that run pays
whole-stage-codegen compilation (~1-2 s/query of JVM compiler time)
and the timed run at the target sf measures the plan itself. At the
100 TB design point compilation is amortized noise; including it in a
sub-second-query benchmark would measure the Janino compiler, not the
engine.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _standalone(sf: str) -> None:
    """Fresh-JVM-per-query mode (SPARK_GRAFT_STANDALONE=1): each
    query runs in its own subprocess/SparkSession, eliminating the
    suite-context inflation three rounds of A/Bs measured at 1.3-2x
    (accumulated shuffle files, checkpoint blocks, JIT state, storage
    -memory pressure).  ~10 s of JVM+Spark startup per query, so meant
    for the headline subset (SPARK_GRAFT_QUERIES=a,b,c), not the full
    registry; the in-suite mode stays the registry-wide default."""
    import subprocess

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    names = sorted(entry.queries())
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        env = dict(os.environ)
        env["SPARK_GRAFT_QUERIES"] = name
        env["SPARK_GRAFT_STANDALONE"] = "0"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        got = False
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("query") == name and "sec" in rec:
                timings[name] = rec["sec"]
                print(line, flush=True)
                got = True
            elif rec.get("query") == name and "error" in rec:
                errors[name] = rec["error"]
                print(line, flush=True)
                got = True
        if not got:
            errors[name] = f"subprocess rc={proc.returncode}, no timing line"
            print(json.dumps({"query": name, "error": errors[name]}))
    result = {
        "metric": "standalone_total_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": float(sf),
        "mode": "standalone",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": {},
    }
    budget = 1800
    for name in sorted(timings, key=timings.get, reverse=True):
        result["queries"][name] = round(timings[name], 2)
        if len(json.dumps(result)) > budget:
            del result["queries"][name]
            break
    print(json.dumps(result))
    if names and not timings:
        sys.exit(1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if os.environ.get("SPARK_GRAFT_STANDALONE") == "1":
        _standalone(sf)
        return

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from spotify_streaming_etl_pipeline_spark.session import get_spark

    queries = entry.queries()  # full registry: analytics + llm + extras
    # Optional subset (comma-separated names) for A/B runs, e.g.
    # SPARK_GRAFT_QUERIES=star_join,top_parts python bench.py
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        queries = {k: v for k, v in queries.items() if k in keep}

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    # Second warm tier: the sf0.001 pass compiles the codegen classes
    # but feeds them too few rows to push HotSpot past its C2
    # compilation thresholds, so a single timed run still pays JIT ramp
    # (measured 20-60% inflation with run-to-run variance to match). A
    # mid-size pass drives the compiled loops to steady state; the
    # timed run then measures the plan, not the JVM warming up.
    warm2_dir = os.environ.get("SPARK_GRAFT_WARM2_SF_DIR", "/root/testdata/sf0.01")

    timings: dict[str, float] = {}
    run_samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    for name, fn in queries.items():
        # Release the previous queries' shuffle files / broadcasts
        # BEFORE the warm passes: ContextCleaner only acts on a driver
        # GC (backlog measured ~+0.25s/query by query 50 of a suite
        # run), while a GC *after* warming would unload the generated
        # codegen classes and make the timed run pay Janino + JIT
        # recompilation (measured +8s on simhash_dedup). The warm
        # passes below re-populate the codegen cache post-GC.
        spark.sparkContext._jvm.System.gc()
        # Per-query error isolation: one broken query must never take
        # down the suite (round-2 postmortem — a single AnalysisException
        # left the driver with zero recorded timings). Failures are
        # reported in the JSON line; the exit code stays 0 unless
        # EVERY query fails.
        try:
            # Compile pass (tiny sf, same codegen cache keys), then timed run.
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            # Per-query isolation: drop caches left by earlier queries (some
            # operators persist intermediates consumed by the returned plan;
            # letting them pile up across 48 queries measures storage-memory
            # pressure, not the plans).
            spark.catalog.clearCache()
            if warm2_dir != sf_dir:
                fn(spark, warm2_dir).write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()
            # n>=3 timed runs, report the MEDIAN (round-5 postmortem:
            # single-run timings swing +/-40% with suite context — two
            # apparent 3x regressions were phantom, confirmed by
            # isolated re-runs. The median of 3 bounds that noise while
            # keeping the suite under the driver's wall-clock budget).
            samples = []
            for _ in range(n_runs):
                start = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - start)
                spark.catalog.clearCache()
            timings[name] = round(statistics.median(samples), 4)
            run_samples[name] = [round(s, 4) for s in samples]
        except Exception as exc:  # noqa: BLE001 — harness boundary
            # Keep the exception type + first line of the message: the
            # self-explanatory form the round-2 artifacts lacked.
            first_line = str(exc).strip().splitlines()[0] if str(exc) else ""
            errors[name] = f"{type(exc).__name__}: {first_line}"[:500]
        finally:
            try:
                spark.catalog.clearCache()
                # localCheckpoint blocks (the iterative operators:
                # k-means, pagerank, BPE) are pinned until the driver
                # GC lets ContextCleaner release them — clearCache
                # does NOT touch them. A GC nudge between queries
                # stops checkpoint blocks from one query inflating the
                # variance of the next (observed: near_dup_clusters
                # run samples [9.96, 16.98, 4.66] in-suite vs 3.16
                # standalone after the clustering family grew).
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass

    total = round(sum(timings.values()), 4)
    # Output contract (round-4 postmortem): the driver keeps only the
    # LAST 2,000 chars of stdout and parses the final JSON line. At
    # 137 queries a full per-query dict is ~3.6 kB — the line's head
    # (including "metric") fell outside the capture window and round 4
    # recorded `parsed: null`. So: full per-query detail goes out as
    # one small JSON line per query FIRST, and the final line is a
    # compact summary (suite total + as many worst-first per-query
    # entries as fit) kept strictly under the capture window.
    for name in sorted(timings):
        print(
            json.dumps(
                {"query": name, "sec": timings[name], "runs": run_samples[name]}
            )
        )
    for name in sorted(errors):
        print(json.dumps({"query": name, "error": errors[name]}))

    result = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "runs": n_runs,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": {},
    }
    if errors:
        # Errors are the exception, so keep them in the summary line
        # too (truncated) — full messages went out per-query above.
        result["errors"] = {k: v[:120] for k, v in errors.items()}
    # Fill "queries" worst-first until the serialized line would pass
    # the budget (1,800 chars leaves headroom under the 2,000-char
    # tail capture even with a trailing newline and wrapper text).
    budget = 1800
    for name in sorted(timings, key=timings.get, reverse=True):
        result["queries"][name] = round(timings[name], 2)
        if len(json.dumps(result)) > budget:
            del result["queries"][name]
            break
    print(json.dumps(result))
    spark.stop()
    if queries and not timings:
        sys.exit(1)


if __name__ == "__main__":
    main()
