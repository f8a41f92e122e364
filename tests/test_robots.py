"""Units for the robots.txt family (llm/robots.py): RFC 9309 group
assembly, agent precedence, longest-match/tie rules, and parser
hygiene the arithmetic oracle gate cannot isolate."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.llm.robots import (
    parse_robots,
    robots_decisions,
)


def _robots(spark, host, txt):
    return spark.createDataFrame(
        [(host, txt)], "host string, robots_txt string"
    )


def _urls(spark, *urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_parse_groups_comments_case_and_empty_disallow(spark):
    txt = (
        "# top comment\n"
        "USER-AGENT: GoodBot  # trailing comment\n"
        "DISALLOW: /private/\n"
        "allow: /private/ok\n"
        "\n"
        "User-agent: *\n"
        "Disallow:\n"          # empty = no restriction -> marker
        "Disallow: /tmp*\n"    # wildcard unsupported -> dropped
        "Crawl-delay: 5\n"     # unknown field -> ignored
    )
    rules = parse_robots(_robots(spark, "ex.com", txt)).collect()
    got = {(r.agent, r.allow, r.path_prefix) for r in rules}
    # the * group's every rule was dropped, so it keeps an
    # allow-everything marker row (RFC 9309 §2.2.1 group existence)
    assert got == {
        ("goodbot", False, "/private/"),
        ("goodbot", True, "/private/ok"),
        ("*", True, ""),
    }


def test_shared_header_group_assigns_rules_to_all_agents(spark):
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    rules = parse_robots(_robots(spark, "ex.com", txt)).collect()
    assert {(r.agent, r.path_prefix) for r in rules} == {
        ("a", "/x"),
        ("b", "/x"),
    }


def test_specific_agent_group_overrides_star(spark):
    txt = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: mybot\nAllow: /\n"
    )
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(spark, "http://ex.com/page")
    for_my = robots_decisions(u, rules, agent="MyBot").collect()[0]
    for_other = robots_decisions(u, rules, agent="other").collect()[0]
    assert for_my.allowed          # exact group wins, its Allow applies
    assert not for_other.allowed   # falls back to the * group


def test_longest_match_and_allow_wins_ties(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /a/\n"
        "Allow: /a/b/\n"
        "Disallow: /t/\n"
        "Allow: /t/\n"          # same length as the Disallow -> allow wins
    )
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(
        spark,
        "http://ex.com/a/x",
        "http://ex.com/a/b/x",
        "http://ex.com/t/x",
        "http://ex.com/free",
        "http://other.com/a/x",   # no rules for this host
    )
    out = {r.url: r for r in robots_decisions(u, rules).collect()}
    assert not out["http://ex.com/a/x"].allowed
    assert out["http://ex.com/a/b/x"].allowed        # longer Allow wins
    assert out["http://ex.com/a/b/x"].rule_len == 5
    assert out["http://ex.com/t/x"].allowed          # tie -> allow
    assert out["http://ex.com/free"].allowed
    assert out["http://ex.com/free"].rule_len == 0
    assert out["http://other.com/a/x"].allowed


def test_rules_outside_any_group_are_ignored(spark):
    txt = "Disallow: /orphan\nUser-agent: *\nDisallow: /real\n"
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(spark, "http://ex.com/orphan/x", "http://ex.com/real/x")
    out = {r.url: r.allowed for r in robots_decisions(u, rules).collect()}
    assert out["http://ex.com/orphan/x"]
    assert not out["http://ex.com/real/x"]


def test_unknown_field_splits_header_runs(spark):
    # two user-agent runs separated ONLY by an unknown field are
    # distinct groups: a's group has no rules, b's owns Disallow /x
    txt = (
        "User-agent: a\n"
        "Crawl-delay: 1\n"
        "User-agent: b\n"
        "Disallow: /x\n"
    )
    rules = parse_robots(_robots(spark, "ex.com", txt))
    got = {
        (r.agent, r.allow, r.path_prefix) for r in rules.collect()
    }
    assert got == {("a", True, ""), ("b", False, "/x")}
    u = _urls(spark, "http://ex.com/x/1")
    assert robots_decisions(u, rules, agent="a").collect()[0].allowed
    assert not robots_decisions(u, rules, agent="b").collect()[0].allowed


def test_empty_disallow_agent_group_beats_star_disallow(spark):
    # RFC 9309 §2.2.1: the most-specific matching group applies even
    # when it has no effective rules — mybot's empty Disallow means
    # allow-all, NOT fall back to the * group's Disallow /
    txt = (
        "User-agent: *\nDisallow: /\n"
        "User-agent: mybot\nDisallow:\n"
    )
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(spark, "http://ex.com/page")
    assert robots_decisions(u, rules, agent="mybot").collect()[0].allowed
    assert not robots_decisions(u, rules, agent="other").collect()[0].allowed


def test_agent_group_with_no_rules_at_all_allows(spark):
    # mybot's group is last and has zero rules -> marker -> allowed
    txt = "User-agent: *\nDisallow: /\nUser-agent: mybot\n"
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(spark, "http://ex.com/page")
    assert robots_decisions(u, rules, agent="mybot").collect()[0].allowed
    assert not robots_decisions(u, rules, agent="other").collect()[0].allowed


def test_pathless_and_uppercase_scheme_urls(spark):
    txt = "User-agent: *\nDisallow: /\n"
    rules = parse_robots(_robots(spark, "ex.com", txt))
    u = _urls(
        spark,
        "http://ex.com",        # no path -> evaluated as '/'
        "HTTP://ex.com/page",   # scheme is case-insensitive
        "HTTPS://EX.COM/q",     # host too
    )
    out = {r.url: r for r in robots_decisions(u, rules).collect()}
    assert not out["http://ex.com"].allowed
    assert out["http://ex.com"].rule_len == 1
    assert not out["HTTP://ex.com/page"].allowed
    assert not out["HTTPS://EX.COM/q"].allowed
