"""SparkSession construction with scale-appropriate defaults.

Single place where shuffle/AQE/Arrow knobs are set so tests, bench and
the driver entry all run the same configuration. The settings are
chosen for the 100 TB design point and proxy-tested on local[N]:

- AQE on (runtime re-plan, skew-join backstop to our explicit salting)
- shuffle partitions sized to parallelism (driver may override)
- Arrow batches sized for tile-blocked UDFs
- broadcast threshold generous: every dimension/polygon side we join
  is small by design (FIXTURES.md §2)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "georeader-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2x cores: keeps every core busy through stragglers without
        # flooding the scheduler; on a real cluster this is set to
        # ~2-3x total executor cores or left to AQE coalescing.
        shuffle_partitions = 2 * cpus

    # Codegen-heavy workloads churn generated classes (AQE re-plans per
    # execution); the JVM default 240 MB code cache fills and the JIT
    # enters a compile storm (measured: 10-30s of compiler time per
    # repeated identical query at local[32]). 1 GB cache stabilizes it
    # — the standard Spark recommendation for long-running sessions.
    java_opts = "-XX:ReservedCodeCacheSize=1g"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Always use the sort-based (Unsafe) shuffle writer. SQL
        # exchanges carry no map-side combiner at the shuffle layer, so
        # with <= 200 reduce partitions Spark picks the bypass-merge
        # writer — R files per MAP TASK, i.e. an M x R file-creation
        # tax that dominates small shuffles on this filesystem
        # (measured: a 96-map x 64-reduce groupBy drops 1.64 s ->
        # 0.38 s). Scale-neutral: past 200 partitions (any production
        # shuffle) bypass never applies anyway.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k rows/batch: with ~1 KB rows and N concurrent tasks in ONE
        # local JVM, 64k-row batches thrash GC (measured 3-6x slowdowns
        # at local[32] under an 8g heap); production executors have
        # per-executor heaps so batch sizing is per-core there too
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local mode runs every task thread in the driver JVM: size the
        # heap for cores * in-flight batch memory (128 GiB box)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
