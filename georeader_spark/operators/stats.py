"""Corpus statistics — exact per-group profiles plus the sketched
versions a 100 TB monitoring pass actually runs.

Two tiers, same shape:
- ``corpus_stats``: exact counts / distincts / sums / quartiles. One
  shuffle, map-side partials everywhere except the exact distinct and
  exact percentiles (which buffer per group — correct but memory-bound
  at extreme cardinalities; that is WHY the sketched tier exists).
- ``corpus_stats_sketched``: HyperLogLog++ distinct
  (``approx_count_distinct``) and GK-sketch quantiles
  (``percentile_approx``) — fixed-size state per group, partial-agg
  friendly, the only viable plan when a group holds 10^10 rows.
  Error is bounded, not zero: tests/test_spark_operators.py pins the
  sketches against the exact tier (HLL rsd, GK rank-error bound).

Quartile exactness note (the oracle gate): at p in {0.25, 0.5, 0.75}
over integer inputs, the interpolated percentile is an exact multiple
of 2^-2 — both interpolation shapes (a + (b-a)*f and a*(1-f) + b*f)
produce the identical exact double, so Spark's ``percentile`` and
DuckDB's ``quantile_cont`` agree to the bit. Arbitrary p (e.g. 0.9)
would put an inexact f in the product and is deliberately NOT hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(
    docs: DataFrame,
    group_col: str = "lang",
    dist_col: str = "source",
    num_col: str = "n_chars",
) -> DataFrame:
    """Exact per-group profile: doc count, distinct ``dist_col``,
    sum/min/max of ``num_col``, and its exact quartiles."""
    c = F.col(num_col)
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(dist_col).alias("n_distinct"),
        F.sum(c).alias("v_sum"),
        F.min(c).alias("v_min"),
        F.max(c).alias("v_max"),
        F.percentile(c, 0.25).alias("v_q1"),
        F.percentile(c, 0.5).alias("v_med"),
        F.percentile(c, 0.75).alias("v_q3"),
    )


def corpus_stats_sketched(
    docs: DataFrame,
    group_col: str = "lang",
    dist_col: str = "source",
    num_col: str = "n_chars",
    rsd: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketched profile: HLL++ distinct (relative std dev ``rsd``) and
    GK approximate quartiles (rank error ``1/accuracy``). Constant
    state per group regardless of group size — the 100 TB plan."""
    c = F.col(num_col)
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct(dist_col, rsd).alias("n_distinct_approx"),
        F.percentile_approx(
            c, [0.25, 0.5, 0.75], accuracy
        ).alias("v_quartiles_approx"),
    )
