"""robots.txt (RFC 9309) parsing and URL permission checks.

Crawl-permission filtering is a first-class curation step for web
corpora (drop pages a crawler should not have fetched / must not
retain). Both halves are DataFrame-native:

- :func:`parse_robots` explodes robots.txt bodies into a RULES table
  — one row per (host, agent, rule, pattern) with the pattern
  pre-compiled to an anchored regex (pure JVM string ops; ``*`` →
  ``.*``, ``$`` → end anchor, everything else regex-escaped).
- :func:`check_allowed` joins URLs against the rules and resolves RFC
  9309 precedence: the LONGEST matching pattern wins, allow beats
  disallow on ties, no match → allowed. Resolution is one
  ``max(struct(len, is_allow))`` aggregate — no window, partial-agg
  friendly.

Scale shape: the rules table is small relative to the corpus (one
robots.txt per host — 10^7 hosts × ~10 rules vs 10^11 pages), so the
join broadcasts rules and the corpus never shuffles; per-row regex
matching is JVM ``regexp_like`` with a column pattern. A crawl frontier
at 10^11 URLs/day runs exactly this shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _pattern_to_regex(pat: Column) -> Column:
    """robots path pattern → anchored Java regex, as JVM expressions.

    Escape regex metacharacters, then ``*`` → ``.*``; a trailing ``$``
    becomes the end anchor (RFC 9309 §2.2.3); always prefix-anchored.
    """
    ends_anchored = pat.endswith("$")
    body = F.when(
        ends_anchored, F.substring(pat, F.lit(1), F.length(pat) - 1)
    ).otherwise(pat)
    # escape all Java-regex specials except '*' (handled after)
    esc = F.regexp_replace(body, r"([.\^\$\+\?\(\)\[\]\{\}\|\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(ends_anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → rules table.

    Output: ``(host, agent, rule in {allow, disallow}, pattern,
    pat_len, regex)``. Group structure per RFC 9309: consecutive
    ``User-agent:`` lines open a group; ``Allow:``/``Disallow:`` lines
    attach to every agent of the current group; blank-line comments and
    unknown directives are skipped; an empty Disallow pattern (allow
    all) is dropped (it can never win a longest-match). All JVM
    expressions: split to lines, a running ``User-agent`` group id via
    a window prefix-count, then the group's agents joined back.
    """
    from pyspark.sql import Window

    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "line"),
    ).select(
        host_col, "ln",
        F.regexp_replace(F.trim(F.col("line")), r"#.*$", "").alias("line"),
    ).where(F.col("line") != "")
    parsed = lines.select(
        host_col, "ln",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))
    # group id: a user-agent line PRECEDED BY a rule line (or nothing)
    # starts a new group; consecutive user-agent lines share the group
    w = Window.partitionBy(host_col).orderBy("ln")
    marked = parsed.withColumn(
        "new_group",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("new_group").over(w))
    agents = (
        marked.where(F.col("key") == "user-agent")
        .groupBy(host_col, "grp")
        .agg(F.collect_set(F.lower("value")).alias("agents"))
    )
    rules = marked.where(
        F.col("key").isin("allow", "disallow") & (F.col("value") != "")
    )
    out = (
        rules.join(agents, [host_col, "grp"])
        .select(
            host_col,
            F.explode("agents").alias("agent"),
            F.col("key").alias("rule"),
            F.col("value").alias("pat"),
        )
        .select(
            host_col, "agent", "rule",
            F.col("pat").alias("pattern"),
            F.length("pat").alias("pat_len"),
            _pattern_to_regex(F.col("pat")).alias("regex"),
        )
    )
    return out


def check_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Per-URL crawl permission for ``agent`` under RFC 9309 precedence.

    Rules matching the exact agent take precedence over the ``*``
    group (a specific group REPLACES the default group, per spec —
    hosts with a specific group ignore their ``*`` rules entirely).
    Longest matching pattern wins; allow beats disallow on equal
    length; no matching rule (or no robots.txt) → allowed.

    Returns ``(url, allowed, rule_len)`` — one row per input URL.
    ``rules`` is broadcast: the corpus side never shuffles.
    """
    a = agent.lower()
    # HOST is case-insensitive (lower to match the rules side); PATH
    # matching is case-sensitive per RFC 9309 §2.2.2 — lowercasing the
    # path while rule patterns keep their original case would make any
    # rule containing an uppercase character unmatchable
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(
        F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")
    )
    u = urls.select(F.col(url_col).alias("url"), host.alias("_h"),
                    path.alias("_p"))
    r = (
        rules.withColumnRenamed(rules.columns[0], "_h")
        .withColumn("_h", F.lower(F.col("_h")))
        .where(F.col("agent").isin(a, "*"))
    )
    # specific group REPLACES the default group: build the per-host
    # EFFECTIVE rule set rules-side, BEFORE the url join — filtering
    # after a left join would drop urls whose host has only
    # other-agent groups
    host_has_specific = (
        r.where(F.col("agent") == a)
        .select("_h").distinct()
        .withColumn("_specific", F.lit(True))
    )
    eff = r.join(host_has_specific, "_h", "left").where(
        F.when(
            F.coalesce(F.col("_specific"), F.lit(False)), F.col("agent") == a
        ).otherwise(F.col("agent") == "*")
    )
    j = u.join(F.broadcast(eff), "_h", "left")
    matched = j.withColumn(
        "_hit",
        F.col("regex").isNotNull() & F.regexp_like(F.col("_p"), F.col("regex")),
    )
    res = matched.groupBy("url").agg(
        F.max(
            F.when(
                F.col("_hit"),
                F.struct(
                    F.col("pat_len").alias("l"),
                    (F.col("rule") == "allow").alias("ok"),
                ),
            )
        ).alias("best")
    )
    return res.select(
        "url",
        F.coalesce(F.col("best.ok"), F.lit(True)).alias("allowed"),
        F.coalesce(F.col("best.l"), F.lit(0)).alias("rule_len"),
    )
