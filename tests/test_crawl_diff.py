"""Crawl snapshot reconciliation (operators/crawl.py)."""

from pyspark.sql import functions as F

from georeader_spark.operators.crawl import (
    ADDED, CHANGED, REMOVED, UNCHANGED, crawl_diff, host_change_rates)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_all_four_statuses(spark):
    old = _snap(spark, [
        ("http://a.example/1", b"one"),
        ("http://a.example/2", b"two"),
        ("http://b.example/3", b"three"),
    ])
    new = _snap(spark, [
        ("http://a.example/2", b"two"),          # unchanged
        ("http://b.example/3", b"three-v2"),     # changed
        ("http://b.example/4", b"four"),         # added
    ])
    got = {r.url: r.status for r in crawl_diff(old, new).collect()}
    assert got == {
        "http://a.example/1": REMOVED,
        "http://a.example/2": UNCHANGED,
        "http://b.example/3": CHANGED,
        "http://b.example/4": ADDED,
    }


def test_host_change_rates(spark):
    old = _snap(spark, [
        ("http://a.example/1", b"one"),
        ("http://a.example/2", b"two"),
        ("http://b.example/3", b"three"),
    ])
    new = _snap(spark, [
        ("http://a.example/2", b"two"),
        ("http://b.example/3", b"x"),
        ("http://b.example/4", b"four"),
    ])
    d = host_change_rates(crawl_diff(old, new))
    got = {r.host: (r.n_urls, r.n_changed, r.n_added, r.n_removed,
                    r.change_rate) for r in d.collect()}
    assert got["a.example"] == (2, 0, 0, 1, 0.5)
    assert got["b.example"] == (2, 1, 1, 0, 1.0)


def test_bodies_never_join(spark):
    """The digest projection must sit below the join: the join subtree
    computes md5 scan-side on BOTH inputs, so only (url, digest) rows
    cross the exchange — never page bodies."""
    old = _snap(spark, [("http://a.example/1", b"one")])
    new = _snap(spark, [("http://a.example/1", b"one")])
    opt = crawl_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    join_pos = opt.lower().index("join")
    below = opt[join_pos:].lower()
    assert below.count("md5") >= 2  # both join inputs project the digest
