"""WARC/1.0 codec (sources/warc.py): write-side JVM record construction,
bounded file assembly, gzip member layout, read-side record walk, and
the full write->read round-trip against the synthetic pages generator.

Also pins the DuckDB generator twin (sources.pages.pages_sql) to the
Spark generator byte-for-byte — the identity the pages_url_warc oracle
gate rests on.
"""

import gzip

import duckdb
import pytest
from pyspark.sql import functions as F

from georeader_spark.sources.pages import pages, pages_sql
from georeader_spark.sources.warc import (
    _walk_records, parse_warc, warc_files, warc_record_col,
)


@pytest.fixture(scope="module")
def small_pages(spark):
    return pages(spark, 200).persist()


def _collect_records(spark, small_pages, **kw):
    files = warc_files(small_pages, records_per_file=25, **kw)
    return files, parse_warc(files)


def test_roundtrip_plain(spark, small_pages):
    files, recs = _collect_records(spark, small_pages)
    back = (
        recs.where(F.col("rec_type") == "response")
        .select("url", F.col("warc_ts").alias("r_ts"),
                F.col("html").alias("body"), "http_status", "content_type")
    )
    j = small_pages.join(back, "url")
    rows = j.select(
        (F.col("body") == F.col("html")).alias("body_ok"),
        (F.col("r_ts") == F.col("warc_ts")).alias("ts_ok"),
        "http_status", "content_type",
    ).collect()
    assert len(rows) == 200
    assert all(r.body_ok and r.ts_ok for r in rows)
    assert all(r.http_status == 200 for r in rows)
    assert all(r.content_type == "text/html; charset=utf-8" for r in rows)


def test_roundtrip_gzip(spark, small_pages):
    files, recs = _collect_records(spark, small_pages, compress=True)
    back = recs.where(F.col("rec_type") == "response").select("url", "html")
    j = small_pages.join(back.withColumnRenamed("html", "body"), "url")
    assert j.where(F.col("body") != F.col("html")).count() == 0
    assert j.count() == 200


def test_file_bounds_and_warcinfo(spark, small_pages):
    files = warc_files(small_pages, records_per_file=25, n_buckets=4)
    rows = files.collect()
    # every file holds at most records_per_file records, total preserved
    assert all(1 <= r.n_records <= 25 for r in rows)
    assert sum(r.n_records for r in rows) == 200
    # plain files lead with a warcinfo record
    first = bytes(rows[0].content)
    hdrs, block, start, length = next(_walk_records(first))
    assert start == 0
    assert hdrs["warc-type"] == "warcinfo"
    assert b"georeader-spark" in block
    # parse surfaces warcinfo rows with NULL html
    recs = parse_warc(files)
    info = recs.where(F.col("rec_type") == "warcinfo")
    assert info.count() == len(rows)
    assert info.where(F.col("html").isNotNull()).count() == 0


def test_gzip_member_per_record(spark, small_pages):
    files = warc_files(small_pages, records_per_file=25, compress=True)
    blob = bytes(files.limit(1).collect()[0].content)
    # member-per-record: counting gzip magics at member boundaries
    members = 0
    import zlib
    buf = blob
    while buf:
        o = zlib.decompressobj(31)
        o.decompress(buf)
        members += 1
        buf = o.unused_data
    n = next(iter(_count := [files.limit(1).collect()[0].n_records]))
    assert members == n
    # deterministic bytes: mtime=0 -> same input, same output
    blob2 = bytes(files.limit(1).collect()[0].content)
    assert blob == blob2


def test_warc_record_bytes_spec(spark):
    df = spark.createDataFrame(
        [("https://x.example/a", "2024-03-01 12:00:00", b"<html>hi</html>")],
        "url string, ts string, html binary",
    ).select("url", F.col("ts").cast("timestamp").alias("ts"), "html")
    rec = bytes(
        df.select(
            warc_record_col(F.col("url"), F.col("ts"), F.col("html")).alias("r")
        ).collect()[0].r
    )
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert head.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: response" in head
    assert b"WARC-Date: 2024-03-01T12:00:00Z" in head
    # WARC Content-Length == byte length of the HTTP block
    clen = int(
        [l for l in head.split(b"\r\n") if l.startswith(b"Content-Length")][0]
        .split(b":")[1]
    )
    assert rest.endswith(b"\r\n\r\n")
    http_block = rest[:-4]
    assert len(http_block) == clen
    # HTTP Content-Length == body byte length
    hh, _, body = http_block.partition(b"\r\n\r\n")
    assert body == b"<html>hi</html>"
    assert b"Content-Length: 15" in hh


def test_walk_records_truncation_raises():
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(_walk_records(b"WARC/1.0\r\nContent-Length: 5\r\n"))
    rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 10\r\n\r\n"
           b"short")
    with pytest.raises(ValueError, match="truncated WARC block"):
        list(_walk_records(rec))
    with pytest.raises(ValueError, match="bad WARC version"):
        list(_walk_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_pages_sql_twin_byte_identity(spark):
    """The oracle foundation: DuckDB-regenerated html/text/url/ts match
    the Spark generator byte-for-byte (md5 over UTF-8 bytes)."""
    n = 500
    sp = sorted(
        tuple(r)
        for r in pages(spark, n)
        .select(
            "url", F.col("warc_ts").cast("long").alias("ts_s"), "lang",
            F.md5("html").alias("h"),
            F.md5(F.encode("text", "UTF-8")).alias("t"),
        )
        .collect()
    )
    du = sorted(
        duckdb.sql(
            f"SELECT url, ts_s, lang, md5(html) AS h, md5(text) AS t "
            f"FROM ({pages_sql(n)})"
        ).fetchall()
    )
    assert sp == du
