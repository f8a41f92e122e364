"""robots.txt politeness for the crawl pipeline: parse Robots
Exclusion Protocol files into a rules table and decide fetchability
per URL.

A Common-Crawl-style pipeline must honor robots.txt before (or while
auditing) ingestion; this module is the engine form of that gate:

- ``parse_robots``: (host, robots_txt) -> (host, agent, allow,
  path_prefix, rule_len) — a REAL parser for the classic REP
  (Koster 1994 / RFC 9309 §2): comment stripping, case-insensitive
  field names, User-agent GROUPS (consecutive ``User-agent`` lines
  share the rule block that follows), Allow/Disallow records, empty
  ``Disallow:`` = no restriction.  Wildcard (``*``/``$``) path
  patterns are out of scope — prefix rules only, the original REP;
  rows with patterns are dropped with ``n_dropped`` accounting left
  to the caller (they contain '*' or '$').
- ``robots_decisions``: apply a rules table to a URL table for one
  crawler agent: per URL, candidate rules are the host's
  most-specific agent group (exact agent match beats ``*``), the
  LONGEST matching path prefix wins, allow wins length ties
  (RFC 9309 §2.2.2), no match or no rules = allowed.

Scale posture: robots files are per-HOST — bounded by the host
count, orders of magnitude smaller than the URL table — so the
parsed rules BROADCAST and the decision is a broadcast join + one
per-URL argmax (min(struct(-len, allow_rank))), partially aggregated
map-side.  The parser's only shuffle is the per-host line window
(group assembly), proportional to robots bytes, not corpus bytes.

Reference parity note: the reference has no crawler surface; this is
part of the additive WARC/Common-Crawl family (llm/warc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into (host, agent, allow, path_prefix,
    rule_len) — one row per (agent in group) x (rule in group).

    Group semantics per RFC 9309 §2.1: a group is one or more
    consecutive ``User-agent`` lines followed by its rules; a rule
    belongs to EVERY agent named in its group's header run.  Group
    boundaries are computed over ALL non-blank lines BEFORE unknown
    fields are filtered out, so two header runs separated only by,
    say, a ``Crawl-delay`` stay distinct groups (filtering first
    would merge them and mis-attribute the later run's rules).
    Lines are trimmed, ``#`` comments stripped, field names matched
    case-insensitively; empty-path Allow rules (no-ops) and
    (unsupported) wildcard patterns are dropped.

    Fail-open markers: a group whose every rule was dropped — an
    empty ``Disallow:`` (= no restriction), nothing but wildcard
    patterns, or no rules at all — still EXISTS for agent scoping
    (RFC 9309 §2.2.1: the most-specific matching group applies even
    when it has no rules), so such groups emit one marker row per
    agent: ``allow=true, path_prefix='', rule_len=0``.  The marker
    matches every path at length 0, losing every contest against a
    real rule, but lets ``robots_decisions`` select the exact-agent
    group instead of falling back (and over-blocking) on ``*``."""
    w = Window.partitionBy("host").orderBy("line_no")
    lines = (
        df.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "line_no", "_raw"
            ),
        )
        .select(
            "host",
            "line_no",
            F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("line"),
        )
        .filter(F.col("line") != "")
        .select(
            "host",
            "line_no",
            F.lower(
                F.trim(F.regexp_extract("line", r"^([^:]+):", 1))
            ).alias("field"),
            F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias(
                "value"
            ),
        )
    )
    is_agent = F.col("field") == "user-agent"
    prev_agent = F.lag(is_agent.cast("int"), 1, 0).over(w)
    # a new group starts at a user-agent line NOT preceded by one;
    # unknown fields participate in boundary detection, then drop
    marked = lines.withColumn(
        "group_id",
        F.sum(
            (is_agent.cast("int") * (1 - prev_agent)).cast("long")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    agents = (
        marked.filter(is_agent)
        .select("host", "group_id", F.lower("value").alias("agent"))
        .distinct()
    )
    rules = (
        marked.filter(~is_agent)
        .select(
            "host",
            "group_id",
            (F.col("field") == "allow").alias("allow"),
            F.col("value").alias("path_prefix"),
        )
        # empty Allow is a no-op; empty Disallow = "no restriction"
        # (handled by the group marker below); wildcards unsupported
        .filter(F.col("path_prefix") != "")
        .filter(
            ~F.col("path_prefix").contains("*")
            & ~F.col("path_prefix").contains("$")
        )
    )
    # marker rows for groups with agents but zero surviving rules
    markers = (
        agents.select("host", "group_id")
        .distinct()
        .join(
            rules.select("host", "group_id").distinct(),
            ["host", "group_id"],
            "left_anti",
        )
        .select(
            "host",
            "group_id",
            F.lit(True).alias("allow"),
            F.lit("").alias("path_prefix"),
        )
    )
    joined = rules.join(agents, ["host", "group_id"]).select(
        "host", "agent", "allow", "path_prefix"
    )
    return joined.unionByName(
        markers.join(agents, ["host", "group_id"]).select(
            "host", "agent", "allow", "path_prefix"
        )
    ).select(
        "host",
        "agent",
        "allow",
        "path_prefix",
        F.length("path_prefix").cast("long").alias("rule_len"),
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Fetchability per URL for one crawler agent: input columns plus
    (allowed, rule_len) — ``rule_len`` the winning rule's prefix
    length (0 when no rule matched).

    Selection per RFC 9309 §2.2: among the host's rules, only the
    MOST-SPECIFIC matching agent group applies (exact ``agent`` match
    beats ``*``; hosts with neither contribute nothing); among
    matching path prefixes the longest wins, allow wins length ties;
    no match = allowed.  The rules table broadcasts (bounded by host
    count); the per-URL winner is a ``min(struct(...))`` argmax that
    partially aggregates before the shuffle.

    URL parsing: schemes match case-insensitively (RFC 3986 §3.1),
    and a URL with no path component ('http://host') is treated as
    path '/' per RFC 9309 §2.2.2, so ``Disallow: /`` blocks it.
    Trailing-slash caveat: matching is EXACT prefix, so a rule
    ``Disallow: /dir/`` does not match the path '/dir' that
    ``text.canonical_url`` produces by stripping a trailing slash —
    canonicalize BEFORE the robots gate consistently on both the
    fetch and audit sides, or keep rule prefixes slash-free."""
    a = agent.lower()
    # hostnames are case-insensitive (RFC 4343) — normalize the rules
    # side too, so a mixed-case rules table still matches URL hosts
    scoped = (
        rules.withColumn("host", F.lower("host"))
        .filter(F.col("agent").isin(a, "*"))
        .withColumn("_spec", (F.col("agent") == a).cast("int"))
    )
    best_spec = scoped.groupBy("host").agg(
        F.max("_spec").alias("_best_spec")
    )
    scoped = scoped.join(best_spec, "host").filter(
        F.col("_spec") == F.col("_best_spec")
    )
    scheme = r"(?i)^[a-z][a-z0-9+.-]*://"
    u = (
        urls.withColumn(
            "_host",
            F.lower(F.regexp_extract(url_col, scheme + r"([^/]+)", 1)),
        )
        .withColumn(
            "_raw_path",
            F.regexp_extract(url_col, scheme + r"[^/]+(/.*)?$", 1),
        )
        # RFC 9309 §2.2.2: the empty path is evaluated as '/'
        .withColumn(
            "_path",
            F.when(F.col("_raw_path") == "", F.lit("/")).otherwise(
                F.col("_raw_path")
            ),
        )
    )
    cand = u.join(
        F.broadcast(scoped), u["_host"] == scoped["host"], "left"
    ).withColumn(
        "_hit",
        F.col("path_prefix").isNotNull()
        & F.col("_path").startswith(F.col("path_prefix")),
    )
    # winner: longest prefix, allow beats disallow on ties
    key = F.when(
        F.col("_hit"),
        F.struct(
            (-F.col("rule_len")).alias("neg_len"),
            (~F.col("allow")).cast("int").alias("deny_rank"),
            F.col("allow").alias("rule_allow"),
            F.col("rule_len").alias("len"),
        ),
    )
    group_cols = [c for c in urls.columns]
    won = cand.groupBy(*group_cols).agg(F.min(key).alias("_win"))
    return won.select(
        *group_cols,
        F.coalesce(F.col("_win.rule_allow"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("_win.len"), F.lit(0)).cast("long").alias(
            "rule_len"
        ),
    )
