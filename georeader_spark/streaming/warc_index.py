"""Streaming WARC ingestion → CDX indexing.

The production shape for a live crawl: WARC files land in object
storage as the crawler writes them; a Structured Stream picks each
file up ONCE (checkpointed file-source state — restart-safe, no
reprocessing), explodes it into capture records, and appends CDX index
rows. New-file discovery is the stream's only driver-side work; record
parsing fans out executor-side through the same Arrow ``mapInPandas``
walk the batch path uses (``sources.warc.parse_warc`` is
streaming-compatible by construction — stateless per input row).

Exactly-once notes at scale: the file source tracks processed files in
the checkpoint; ``maxFilesPerTrigger`` bounds a micro-batch so one
trigger never has to fit the whole backlog; the parquet sink's
transactional commit log makes replays idempotent. The CDX rows land
UNSORTED here (append mode can't globally re-sort an unbounded
stream); periodic compaction runs ``functions.url.cdxj_lines`` over
closed partitions to produce the sorted, range-partitioned shards —
the standard streaming-ingest + batch-compaction split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.url import cdx_records
from ..sources.warc import parse_warc


def streaming_cdx(
    spark: SparkSession,
    warc_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a directory of WARC file blobs (parquet rows of
    ``(file_id long, n_records long, content binary)`` — the
    ``warc_files`` layout) → CDX index rows."""
    reader = spark.readStream.schema(
        "file_id long, n_records long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.parquet(warc_dir)
    return cdx_records(parse_warc(files))


def run_available_now(stream_df: DataFrame, out_dir: str, ckpt_dir: str) -> None:
    """Drain once (AvailableNow) to parquet — batch-parity test hook."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
