"""robots.txt parsing + RFC 9309 permission checks (functions/robots)."""

import pytest
from pyspark.sql import functions as F

from georeader_spark.functions.robots import check_allowed, parse_robots


@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
             "Disallow: /*.pdf$\n# comment\nDisallow: /tmp*core\n"),
            ("b.example",
             "User-agent: googlebot\nUser-agent: mybot\nDisallow: /\n\n"
             "User-agent: *\nDisallow: /x/\n"),
            ("c.example", "User-agent: otherbot\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    return parse_robots(robots).persist()


def test_parse_groups_and_patterns(rules):
    r = {(x.host, x.agent, x.rule, x.pattern): x.regex for x in rules.collect()}
    # consecutive User-agent lines share one group
    assert ("b.example", "googlebot", "disallow", "/") in r
    assert ("b.example", "mybot", "disallow", "/") in r
    # wildcard + $ anchor compile to anchored regex
    assert r[("a.example", "*", "disallow", "/*.pdf$")] == r"^/.*\.pdf$"
    assert r[("a.example", "*", "disallow", "/tmp*core")] == "^/tmp.*core"
    # comments stripped: exactly 8 rules
    assert rules.count() == 8


CASES = {
    "http://a.example/private/doc": (False, 9),     # prefix disallow
    "http://a.example/private/ok/page": (True, 11),  # longer allow wins
    "http://a.example/file.pdf": (False, 7),         # $-anchored
    "http://a.example/file.pdf.html": (True, 0),     # anchor ends match
    "http://a.example/tmp/xyz/core": (False, 9),     # * wildcard
    "http://a.example/public": (True, 0),            # no match
    "http://b.example/x/page": (False, 3),           # '*' group applies
    "http://b.example/anything": (True, 0),
    "http://c.example/anything": (True, 0),   # host has only otherbot group
    "http://norobots.example/q": (True, 0),   # no robots.txt at all
}


def test_check_allowed_star_agent(spark, rules):
    urls = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = {r.url: (r.allowed, r.rule_len)
           for r in check_allowed(urls, rules, agent="*").collect()}
    assert got == CASES


def test_specific_group_replaces_default(spark, rules):
    urls = spark.createDataFrame(
        [("http://b.example/anything",), ("http://a.example/public",)],
        "url string",
    )
    got = {r.url: r.allowed
           for r in check_allowed(urls, rules, agent="mybot").collect()}
    # b.example has a mybot group (disallow all) -> its '*' rules ignored
    assert got["http://b.example/anything"] is False
    # a.example has no mybot group -> falls back to '*'
    assert got["http://a.example/public"] is True


def test_mixed_case_patterns_and_paths(spark):
    # RFC 9309 path matching is case-sensitive: an uppercase rule must
    # match the same-case path and NOT the lowercase one (round-4
    # ADVICE: lowercasing the path while patterns kept original case
    # made 'Disallow: /WP-Admin' unmatchable)
    robots = spark.createDataFrame(
        [("MiXed.example", "User-agent: *\nDisallow: /WP-Admin\n")],
        "host string, robots_txt string",
    )
    r = parse_robots(robots)
    urls = spark.createDataFrame(
        [
            ("http://mixed.example/WP-Admin/login",),   # host case folds
            ("http://MIXED.example/wp-admin/login",),   # path case doesn't
        ],
        "url string",
    )
    got = {u.url: (u.allowed, u.rule_len)
           for u in check_allowed(urls, r).collect()}
    assert got["http://mixed.example/WP-Admin/login"] == (False, 9)
    assert got["http://MIXED.example/wp-admin/login"] == (True, 0)


def test_rules_broadcast_no_url_shuffle(spark, rules):
    urls = spark.createDataFrame([(u,) for u in CASES], "url string")
    plan = check_allowed(urls, rules)._jdf.queryExecution() \
        .executedPlan().toString().lower()
    assert "broadcast" in plan
