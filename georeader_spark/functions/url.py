"""URL canonicalization (SURT) and the CDX capture index.

SURT — Sort-friendly URI Reordering Transform (Internet Archive /
webarchive-commons, the key scheme of Common Crawl's CDX index):
scheme dropped, host lowercased, ``www`` prefixes stripped, host
labels REVERSED and comma-joined, then ``)`` + path + sorted query —
``https://www.News.Example.com/a/b?z=1&a=2`` →
``com,example,news)/a/b?a=2&z=1``. Host reversal is the point at
scale: all captures of a registered domain (and its subdomains) become
one CONTIGUOUS key range, so a domain lookup over a urlkey-sorted
index is a range scan, not a full pass.

Everything here is pure JVM expressions (parse_url / split / reverse /
array_join / array_sort / to_json) — no Python in the hot path; the
CDX writer's global order comes from ``repartitionByRange`` on
(urlkey, ts), which samples split points and yields globally sorted,
binary-searchable shards — the distributed analog of the single-node
``sort`` that builds a classic CDX file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def surt_col(url: Column) -> Column:
    """SURT key for a URL column, as pure JVM expressions.

    Rules implemented (the webarchive-commons defaults that apply to
    canonical http(s) URLs): lowercase, scheme dropped, leading
    ``www`` / ``www<digits>`` label stripped, default ports dropped
    (non-default ports kept as ``host:port``), host labels reversed
    and comma-joined, ``)`` separator, path kept verbatim (lowercased),
    query parameters sorted bytewise and re-joined with ``&`` after a
    ``?`` (empty query → no ``?``).
    """
    lower = F.lower(url)
    host = F.parse_url(lower, F.lit("HOST"))
    # strip a leading www / www2 / www13... label
    host = F.regexp_replace(host, r"^www\d*\.", "")
    # parse_url has no PORT part — take it from AUTHORITY (host[:port])
    port = F.regexp_extract(
        F.parse_url(lower, F.lit("AUTHORITY")), r":(\d+)$", 1
    )
    is_https = lower.startswith("https://")
    default_port = F.when(is_https, F.lit("443")).otherwise(F.lit("80"))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rev_port = F.when(
        (port != "") & (port != default_port),
        F.concat(rev, F.lit(":"), port),
    ).otherwise(rev)
    path = F.coalesce(F.parse_url(lower, F.lit("PATH")), F.lit(""))
    query = F.parse_url(lower, F.lit("QUERY"))
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    q_part = F.when(
        query.isNotNull() & (query != ""), F.concat(F.lit("?"), sorted_q)
    ).otherwise(F.lit(""))
    return F.concat(rev_port, F.lit(")"), path, q_part)


#: CDX timestamp format (14-digit, the classic CDX convention)
CDX_TS_FMT = "yyyyMMddHHmmss"


def cdx_records(
    parsed: DataFrame,
    digest_col: str = "html",
) -> DataFrame:
    """Captured ``response`` records → CDX index rows.

    Input is :data:`georeader_spark.sources.warc.PARSED_SCHEMA` rows
    (the output of ``parse_warc``). Output columns: ``urlkey`` (SURT),
    ``ts`` (14-digit capture timestamp), ``url``, ``mime``, ``status``,
    ``digest`` (md5 of the payload body), ``length``/``offset``/
    ``file_id`` (record location). All JVM expressions.
    """
    r = parsed.where(F.col("rec_type") == "response")
    return r.select(
        surt_col(F.col("url")).alias("urlkey"),
        F.date_format("warc_ts", CDX_TS_FMT).alias("ts"),
        "url",
        F.col("content_type").alias("mime"),
        F.col("http_status").alias("status"),
        F.md5(F.col(digest_col)).alias("digest"),
        F.col("rec_len").alias("length"),
        "offset",
        "file_id",
    )


def cdxj_lines(cdx: DataFrame, n_shards: int | None = None) -> DataFrame:
    """CDX rows → CDXJ text lines, globally sorted by (urlkey, ts).

    Line format (the CDXJ flavor Common Crawl publishes):
    ``<urlkey> <timestamp> <json>`` with the JSON carrying
    url/mime/status/digest/length/offset/filename. Global order via
    ``repartitionByRange(urlkey, ts)`` + ``sortWithinPartitions`` —
    range-partitioned shards are individually sorted AND mutually
    disjoint, so a urlkey lookup touches exactly one shard (parquet
    min/max or a shard manifest prunes the rest).
    """
    j = F.to_json(
        F.struct(
            "url", "mime", "status", "digest",
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            F.format_string("part-%05d.warc", F.col("file_id")).alias(
                "filename"
            ),
        )
    )
    out = cdx.select(
        "urlkey", "ts",
        F.concat_ws(" ", "urlkey", "ts", j).alias("line"),
    )
    if n_shards is not None:
        out = out.repartitionByRange(n_shards, "urlkey", "ts")
    else:
        out = out.repartitionByRange("urlkey", "ts")
    return out.sortWithinPartitions("urlkey", "ts").select("line")
