"""Vector -> raster: burn geometries into a pixel grid (SURVEY.md §2.11).

Reference semantics re-expressed (/root/reference/georeader/rasterize.py):

- ``rasterize_from_geopandas`` (:303-439): burn a value per geometry;
  **later geometry wins on overlap** (deterministic order).
- center rule (``all_touched=False`` default, :37-60): a pixel is
  burned when its *center* is inside the geometry.

Two paths:
- :func:`rasterize_convex_long` — fully declarative: generate the
  pixel index relation, test pixel centers against each convex ring
  with half-plane expressions, resolve overlap with a reverse-order
  CASE (later wins). Whole-stage codegen; SQL-oracle-able.
- :func:`rasterize_any_long` — arbitrary polygons: per-tile Arrow UDF
  using the even-odd kernel over broadcast geometry (the general
  path; tiles partition the grid so each batch rasterizes locally).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geometry as kgeom
from ..kernels.affine import Affine
from .pip_join import PolyTable, _convex_contains_expr


def _pixel_centers(spark: SparkSession, transform: Affine, height: int, width: int):
    n = height * width
    df = spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 8)).select(
        F.floor(F.col("id") / F.lit(width)).cast("long").alias("row"),
        (F.col("id") % F.lit(width)).cast("long").alias("col"),
    )
    cx = F.lit(transform.c) + (F.col("col") + F.lit(0.5)) * F.lit(transform.a)
    cy = F.lit(transform.f) + (F.col("row") + F.lit(0.5)) * F.lit(transform.e)
    return df, cx, cy


def rasterize_convex_long(
    spark: SparkSession,
    geoms: Sequence[Tuple[int, float, np.ndarray]],
    transform: Affine,
    height: int,
    width: int,
    fill: float = 0.0,
) -> DataFrame:
    """Burn (geom_id, value, convex ring) triples; later entry wins.

    Pure expressions: value = CASE WHEN inside(last) THEN v_last ...
    ELSE fill — the reverse-order CASE is exactly the later-wins rule.
    """
    df, cx, cy = _pixel_centers(spark, transform, height, width)
    value = F.lit(fill)
    for _gid, v, ring in geoms:  # forward order; each later one overrides
        inside = _convex_contains_expr(np.asarray(ring, dtype=float), cx, cy)
        value = F.when(inside, F.lit(float(v))).otherwise(value)
    return df.select("row", "col", value.alias("value"))


def rasterize_convex_long_sql(
    geoms: Sequence[Tuple[int, float, np.ndarray]],
    transform: Affine,
    height: int,
    width: int,
    fill: float = 0.0,
    range_fn: str = "range",
) -> str:
    """DuckDB oracle twin of :func:`rasterize_convex_long`."""
    cx = f"({transform.c!r} + (col + 0.5) * {transform.a!r})"
    cy = f"({transform.f!r} + (row + 0.5) * {transform.e!r})"

    def contains_sql(ring: np.ndarray) -> str:
        r = np.asarray(ring, dtype=float)
        if r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
            r = r[:-1]
        n = len(r)
        pos, neg = [], []
        for i in range(n):
            ax, ay = float(r[i][0]), float(r[i][1])
            bx, by = float(r[(i + 1) % n][0]), float(r[(i + 1) % n][1])
            cross = f"(({bx - ax!r}) * ({cy} - {ay!r}) - ({by - ay!r}) * ({cx} - {ax!r}))"
            pos.append(f"({cross} > 0)")
            neg.append(f"({cross} < 0)")
        return f"(({' AND '.join(pos)}) OR ({' AND '.join(neg)}))"

    expr = repr(float(fill))
    for _gid, v, ring in geoms:
        expr = f"CASE WHEN {contains_sql(ring)} THEN {float(v)!r} ELSE {expr} END"
    return f"""
SELECT CAST(FLOOR(range / {width}) AS BIGINT) AS row,
       CAST(range % {width} AS BIGINT) AS col,
       {expr} AS value
FROM {range_fn}(0, {height * width})
"""


def rasterize_any_long(
    spark: SparkSession,
    polygons: PolyTable,
    values: dict,
    transform: Affine,
    height: int,
    width: int,
    fill: float = 0.0,
    tile: int = 128,
) -> DataFrame:
    """Arbitrary-geometry rasterize: per-tile Arrow batches evaluate the
    even-odd kernel on pixel centers against broadcast geometry; later
    polygon (higher position in ``polygons``) wins on overlap."""
    sc = spark.sparkContext
    geom_bc = sc.broadcast(
        [(int(pid), float(values[pid]), mp) for pid, mp in polygons]
    )
    df, _, _ = _pixel_centers(spark, transform, height, width)
    t = transform

    def burn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms = geom_bc.value
        for pdf in batches:
            rows = pdf["row"].to_numpy()
            cols = pdf["col"].to_numpy()
            cx = t.c + (cols + 0.5) * t.a
            cy = t.f + (rows + 0.5) * t.e
            out = np.full(len(pdf), fill, dtype=np.float64)
            for _pid, v, mp in geoms:  # forward order: later overrides
                inside = np.zeros(len(pdf), dtype=bool)
                for poly in mp:
                    inside |= kgeom.points_in_polygon(cx, cy, poly)
                out[inside] = v
            yield pd.DataFrame({"row": rows, "col": cols, "value": out})

    return df.mapInPandas(burn, "row long, col long, value double")
