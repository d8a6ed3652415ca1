"""Bucketed-table co-located join: plan-pinned shuffle elision
(plans/bucketing.py). The 100 TB claim is structural — a recurring
big-big join on the bucket key must plan with ZERO exchanges — so the
test asserts the physical plan, not a timing."""

import pytest
from pyspark.sql import functions as F

from georeader_spark.plans.bucketing import (
    plan_exchanges,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    facts = spark.range(0, 20000).select(
        (F.col("id") % 997).alias("cell"),
        (F.col("id") * 31 % 1000).alias("v"),
    )
    dims = spark.range(0, 997).select(
        F.col("id").alias("cell"), (F.col("id") * 7 % 100).alias("w")
    )
    write_bucketed(facts, "t_facts", "cell", 8, str(base / "facts"))
    write_bucketed(dims, "t_dims", "cell", 8, str(base / "dims"))
    yield "t_facts", "t_dims", facts, dims
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_pair):
    ta, tb, _, _ = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, ta).join(read_table(spark, tb), "cell")
        assert plan_exchanges(j) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_control_shuffles_both_sides(spark, bucketed_pair):
    _, _, facts, dims = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = facts.join(dims, "cell")
        assert plan_exchanges(j) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_rows_match_plain_join(spark, bucketed_pair):
    ta, tb, facts, dims = bucketed_pair
    got = (
        read_table(spark, ta).join(read_table(spark, tb), "cell")
        .groupBy().agg(F.count("*"), F.sum("v"), F.sum("w")).first()
    )
    exp = (
        facts.join(dims, "cell")
        .groupBy().agg(F.count("*"), F.sum("v"), F.sum("w")).first()
    )
    assert tuple(got) == tuple(exp)


def test_bucket_pruning_on_key_filter(spark, bucketed_pair):
    """An equality filter on the bucket key scans ONE bucket, not the
    table ('SelectedBucketsCount: 1 out of 8' in the scan) — the
    point-lookup analog of partition pruning at 100 TB."""
    ta, _, _, _ = bucketed_pair
    # the planner auto-disables bucketed scans that feed no
    # bucket-aware operator; force it so the pruning path is exercised
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        q = read_table(spark, ta).where(F.col("cell") == 5)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert q.count() > 0
    finally:
        spark.conf.set(key, prev)
