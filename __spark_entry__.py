"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship pages pipeline at sf0.001 scale.
queries()    — every implemented operator (SURVEY.md §2 coverage),
               one callable per name; implementations live in
               georeader_spark/queries.py.
oracle_sql() — DuckDB ANSI-SQL twins for the SQL-expressible ones
               (same names); non-expressible ops are omitted and get
               the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end pages pipeline (extract -> cell
    encode -> PIP join -> tile assign -> per-cell counts) on synthetic
    pages at sf0.001-ish scale, exercising every core stage."""
    from georeader_spark.pipeline import pages_pipeline

    return pages_pipeline(spark, n_rows=10000)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from georeader_spark.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from georeader_spark.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
