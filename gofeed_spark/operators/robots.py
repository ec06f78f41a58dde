"""robots.txt parsing + URL admission — the crawl-POLITENESS gate (RFC
9309), the step between frontier generation (operators/html.py
``extract_links``) and fetching: a crawler must not enqueue what the
host's robots.txt forbids for its user-agent.

Implemented subset (documented; covers the overwhelmingly common form):

- ``User-agent`` / ``Allow`` / ``Disallow`` fields, case-insensitive,
  ``#`` comments stripped; consecutive ``User-agent`` lines head one
  group (a group's rules apply to every agent that heads it);
- group selection per host: the group naming the requested agent wins
  over the ``*`` group (RFC 9309 §2.2.1 — groups do NOT union);
- matching: path-PREFIX rules, longest match wins, ties break to
  ``Allow`` (RFC 9309 §2.2.2); an URL matching no rule is allowed;
  empty ``Disallow:`` contributes no rule (allow-all, per the RFC).
- out of scope: ``*``/``$`` wildcards inside paths, ``Crawl-delay``,
  ``Sitemap`` (ignored as unknown fields).

Spark-first shape: parsing is posexplode + regexp_extract + one running
SUM window over line positions per host (group assignment) — all
codegen, no UDF.  Admission is a broadcast-sized rules join (robots
bodies are per-HOST, thousands of rows where the URL frontier has
billions) + a per-URL longest-match window over the handful of matched
candidates.  Both halves have exact SQL twins (the q134 generated-oracle
convention), so the whole gate is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FIELD_RE = r"^\s*([A-Za-z-]+)\s*:"
_VALUE_RE = r"^\s*[A-Za-z-]+\s*:\s*([^#]*)"
_HOST_RE = r"^https?://([^/]+)"
_PATH_RE = r"^https?://[^/]+(/[^#]*)?"


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, agent, allow boolean, prefix) rule rows from robots.txt
    bodies.  Consecutive ``User-agent`` lines share one group; a group's
    rules fan out to each of its agents; empty-path rules drop."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _FIELD_RE, 1)).alias("field"),
        F.trim(F.regexp_extract("line", _VALUE_RE, 1)).alias("value"),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("pos")
    # a user-agent line NOT preceded by another user-agent line starts a
    # new group; the running sum of starts is the group id
    is_agent = (F.col("field") == "user-agent").cast("int")
    starts = F.when(
        (F.col("field") == "user-agent")
        & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent"),
        1,
    ).otherwise(0)
    grouped = parsed.withColumn("grp", F.sum(starts).over(w)).filter(
        F.col("grp") > 0  # rules before any user-agent line are invalid
    )
    agents = grouped.filter(F.col("field") == "user-agent").select(
        "host", "grp", F.lower(F.col("value")).alias("agent")
    )
    rules = grouped.filter(
        F.col("field").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "grp",
        (F.col("field") == "allow").alias("allow"),
        F.col("value").alias("prefix"),
    )
    return agents.join(rules, ["host", "grp"]).select(
        "host", "agent", "allow", "prefix"
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` + an ``allowed`` boolean for ``agent`` under ``rules``
    (the ``parse_robots`` output).  Group selection: the host's rules
    for ``agent`` if any exist, else its ``*`` rules; longest-prefix
    match wins, ties to Allow; no match (or no robots at all) ⇒ allowed.

    Scale shape: ``rules`` is broadcast (per-host rule rows), the URL
    frontier streams through one join + a per-URL window over its few
    matched candidates — no shuffle of the frontier beyond the window's
    hash on the url itself."""
    agent = agent.lower()
    pri = F.when(F.col("agent") == agent, 1).when(
        F.col("agent") == "*", 0
    )
    cand_rules = (
        rules.withColumn("pri", pri)
        .filter(F.col("pri").isNotNull())
        .withColumn("max_pri", F.max("pri").over(Window.partitionBy("host")))
        .filter(F.col("pri") == F.col("max_pri"))
        .select("host", "allow", "prefix")
    )
    u = urls.withColumn(
        "__host", F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    ).withColumn(
        "__path",
        F.when(
            F.regexp_extract(F.col(url_col), _PATH_RE, 1) == "", "/"
        ).otherwise(F.regexp_extract(F.col(url_col), _PATH_RE, 1)),
    )
    hits = u.join(
        F.broadcast(cand_rules),
        (u["__host"] == cand_rules["host"])
        & u["__path"].startswith(cand_rules["prefix"]),
        "left",
    )
    wm = Window.partitionBy(url_col).orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    verdict = (
        hits.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .withColumn("allowed", F.coalesce(F.col("allow"), F.lit(True)))
    )
    return verdict.select(*urls.columns, "allowed")


# --- generated DuckDB twins (the q134 oracle convention) ---------------------


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def parse_robots_sql(src: str) -> str:
    """CTE chain over ``src(host, body)`` ending in
    ``robots_rules(host, agent, allow, prefix)``."""
    return f"""
rb_lines AS (SELECT host, t.pos, t.line
             FROM {src}, LATERAL (SELECT UNNEST(string_split(body, chr(10))) AS line,
                                         UNNEST(range(1, len(string_split(body, chr(10))) + 1)) AS pos) t),
rb_parsed AS (SELECT host, pos,
                     lower(regexp_extract(line, {_q(_FIELD_RE)}, 1)) AS field,
                     trim(regexp_extract(line, {_q(_VALUE_RE)}, 1)) AS value
              FROM rb_lines
              WHERE lower(regexp_extract(line, {_q(_FIELD_RE)}, 1))
                    IN ('user-agent', 'allow', 'disallow')),
rb_lagged AS (SELECT host, pos, field, value,
                     COALESCE(LAG(field) OVER (PARTITION BY host ORDER BY pos), '')
                       AS prev_field
              FROM rb_parsed),
rb_grouped AS (SELECT host, pos, field, value,
                      SUM(CASE WHEN field = 'user-agent'
                               AND prev_field <> 'user-agent' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY host ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
               FROM rb_lagged),
rb_agents AS (SELECT host, grp, lower(value) AS agent FROM rb_grouped
              WHERE field = 'user-agent' AND grp > 0),
rb_rules0 AS (SELECT host, grp, field = 'allow' AS allow, value AS prefix
              FROM rb_grouped
              WHERE field IN ('allow', 'disallow') AND value <> '' AND grp > 0),
robots_rules AS (SELECT a.host, a.agent, r.allow, r.prefix
                 FROM rb_agents a JOIN rb_rules0 r USING (host, grp))
"""


def robots_allowed_sql(urls_src: str, agent: str, url_col: str = "url") -> str:
    """CTE chain (appended after ``parse_robots_sql``) over
    ``urls_src({url_col})`` ending in ``robots_verdict({url_col},
    allowed)``."""
    a = _q(agent.lower())
    return f"""
rb_cand AS (SELECT host, allow, prefix,
                   CASE WHEN agent = {a} THEN 1 WHEN agent = '*' THEN 0 END AS pri
            FROM robots_rules WHERE agent = {a} OR agent = '*'),
rb_sel AS (SELECT host, allow, prefix FROM (
             SELECT host, allow, prefix, pri,
                    MAX(pri) OVER (PARTITION BY host) AS max_pri
             FROM rb_cand) x WHERE pri = max_pri),
rb_urls AS (SELECT {url_col},
                   regexp_extract({url_col}, {_q(_HOST_RE)}, 1) AS uhost,
                   CASE WHEN regexp_extract({url_col}, {_q(_PATH_RE)}, 1) = ''
                        THEN '/' ELSE regexp_extract({url_col}, {_q(_PATH_RE)}, 1) END AS upath
            FROM {urls_src}),
rb_hits AS (SELECT u.{url_col}, r.allow, r.prefix
            FROM rb_urls u LEFT JOIN rb_sel r
              ON u.uhost = r.host AND starts_with(u.upath, r.prefix)),
robots_verdict AS (SELECT {url_col}, COALESCE(allow, TRUE) AS allowed FROM (
                     SELECT {url_col}, allow,
                            ROW_NUMBER() OVER (PARTITION BY {url_col}
                              ORDER BY len(prefix) DESC NULLS LAST, allow DESC) AS rn
                     FROM rb_hits) x WHERE rn = 1)
"""
