"""robots.txt gate (operators/robots.py, RFC 9309 subset): parse
semantics, group selection, longest-match + Allow tie-break, defaults —
and cross-engine parity of the generated SQL twins (the q143 oracle)."""

from __future__ import annotations

import duckdb

from gofeed_spark.operators.robots import (
    parse_robots,
    parse_robots_sql,
    robots_allowed,
    robots_allowed_sql,
)

BODY_A = """# comment line
User-agent: gofeedbot
Disallow: /private/     # trailing comment
Allow: /private/open/

User-agent: *
Disallow: /
"""

# consecutive user-agent lines head ONE group; empty Disallow: is a no-op
BODY_B = """User-agent: botx
User-agent: gofeedbot
Disallow: /x/
Allow: /x/ok

User-agent: *
Disallow:
"""

URLS = [
    ("https://a.com/private/secret", False),   # prefix disallow
    ("https://a.com/private/open/f", True),    # longer Allow wins
    ("https://a.com/public", True),            # no rule matches -> allowed
    ("https://a.com/", True),
    ("https://b.com/x/page", False),           # multi-agent group applies
    ("https://b.com/x/ok/page", True),         # allow override
    ("https://b.com/y", True),
    ("https://norobots.com/anything", True),   # host without robots
]


def _fixture(spark):
    robots = spark.createDataFrame(
        [("a.com", BODY_A), ("b.com", BODY_B)], "host string, body string"
    )
    urls = spark.createDataFrame([(u,) for u, _ in URLS], "url string")
    return robots, urls


def test_parse_and_admission_semantics(spark):
    robots, urls = _fixture(spark)
    rules = parse_robots(robots)
    got_rules = {
        (r.host, r.agent, r.allow, r.prefix) for r in rules.collect()
    }
    # comments stripped, groups fanned out to every heading agent
    assert ("a.com", "gofeedbot", False, "/private/") in got_rules
    assert ("a.com", "gofeedbot", True, "/private/open/") in got_rules
    assert ("a.com", "*", False, "/") in got_rules
    assert ("b.com", "botx", False, "/x/") in got_rules
    assert ("b.com", "gofeedbot", False, "/x/") in got_rules
    # empty Disallow contributed nothing
    assert not any(h == "b.com" and a == "*" for h, a, _, _ in got_rules)
    got = {
        r.url: r.allowed
        for r in robots_allowed(urls, rules, "GofeedBot").collect()
    }
    assert got == dict(URLS)


def test_star_group_applies_to_unknown_agent(spark):
    robots, urls = _fixture(spark)
    rules = parse_robots(robots)
    got = {
        r.url: r.allowed
        for r in robots_allowed(urls, rules, "otherbot").collect()
    }
    # a.com's * group disallows everything for unknown agents
    assert got["https://a.com/public"] is False
    assert got["https://a.com/"] is False
    # b.com's * group has no rules (empty Disallow) -> allowed
    assert got["https://b.com/x/page"] is True


def test_sql_twins_match(spark):
    robots, urls = _fixture(spark)
    rules = parse_robots(robots)
    got = {
        r.url: r.allowed
        for r in robots_allowed(urls, rules, "gofeedbot").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE robots_src AS SELECT * FROM (VALUES "
        + ",".join("(?, ?)" for _ in range(2))
        + ") v(host, body)",
        ["a.com", BODY_A, "b.com", BODY_B],
    )
    con.execute(
        "CREATE TABLE urls_src AS SELECT * FROM (VALUES "
        + ",".join("(?)" for _ in URLS)
        + ") v(url)",
        [u for u, _ in URLS],
    )
    sql = (
        "WITH "
        + parse_robots_sql("robots_src").strip().rstrip(",")
        + ",\n"
        + robots_allowed_sql("urls_src", "gofeedbot").strip()
        + "\nSELECT url, allowed FROM robots_verdict"
    )
    want = dict(con.execute(sql).fetchall())
    assert got == want
