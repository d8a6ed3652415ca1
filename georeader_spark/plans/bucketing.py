"""Bucketed-table write/read — the shuffle-free co-located join
mechanism for repeated big-big joins at 100 TB.

Spark table bucketing (``bucketBy``) pre-hash-partitions a table into
a fixed number of sorted files per bucket; two tables bucketed on the
same key with the same bucket count join WITHOUT an exchange on
either side (SortMergeJoin over bucket-aligned scans). That converts
the per-run O(data) shuffle of a recurring join — crawl-snapshot
diffs on url, postings-vs-doclen joins on doc, cell-keyed raster
algebra — into a one-time cost at write.

Contract (Spark): the join key must equal the bucket column, bucket
counts must match (or divide evenly with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``), and
``spark.sql.sources.bucketing.enabled`` stays true (default). Sorted
buckets also elide the SortMergeJoin's per-task sort.

tests/test_bucketing.py pins the plan: the bucketed-bucketed join
contains ZERO exchanges, the unbucketed control contains two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and by
    default sorted) by ``bucket_col`` into ``n_buckets`` buckets at
    ``path``. On a cluster this is the one-time co-location pass that
    all later joins on ``bucket_col`` ride for free."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would discard it and re-shuffle)."""
    return spark.table(table)


def plan_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded) — the quantity bucketing exists to zero out."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
