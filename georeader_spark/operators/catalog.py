"""Catalog-query operators — the ee_query pipeline re-expressed
(SURVEY.md §3.3): temporal range filter, solar-day derivation,
per-(solarday, satellite) greedy set-cover dedup, overlap percentage.

The greedy set cover (readers/query_utils.py:7-44) is inherently
sequential *within* a group but embarrassingly parallel *across*
groups — exactly the applyInPandas contract (groups are small by
data layout: one day x satellite of acquisitions).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import solar_day
from ..kernels import geometry as kgeom


def filter_date(df: DataFrame, ts_col: str, start: str, end: str) -> DataFrame:
    """Temporal range filter (filterDate, ee_query.py:165-213) — plain
    predicate, pushes to the scan / prunes day partitions."""
    return df.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))


def with_solar_day(df: DataFrame, ts_col: str, lon_col: str) -> DataFrame:
    """solarday = date(utc + lon * 240 s) (query_utils.py:58-81)."""
    return df.withColumn("solarday", solar_day(F.col(ts_col), F.col(lon_col)))


def greedy_set_cover_dedup(
    products: DataFrame,
    aoi_bounds: tuple[float, float, float, float],
    group_cols: List[str] = ["solarday"],
    id_col: str = "product_id",
    bounds_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """Per-group greedy set cover over product footprints
    (select_polygons_overlap, query_utils.py:7-44 / filter_products_overlap
    :46-55): iteratively keep the footprint covering the largest
    remaining fraction of the AOI, subtract it, stop when covered or no
    progress. Footprints here are bboxes (rows carry bounds columns);
    the subtraction runs on a rasterized occupancy grid inside the
    group — deterministic and allocation-bounded, avoiding exact
    polygon boolean ops (no GEOS in this environment).
    """
    x0c, y0c, x1c, y1c = bounds_cols
    ax0, ay0, ax1, ay1 = aoi_bounds
    GRID = 128

    out_schema = ", ".join(
        [f"{c} string" for c in group_cols]
        + [f"{id_col} long", "cover_order int", "overlap_frac double"]
    )

    def cover_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # occupancy grid over the AOI
        occ = np.zeros((GRID, GRID), dtype=bool)
        xs = np.linspace(ax0, ax1, GRID, endpoint=False) + (ax1 - ax0) / GRID / 2
        ys = np.linspace(ay0, ay1, GRID, endpoint=False) + (ay1 - ay0) / GRID / 2
        cell_masks = []
        for _, r in pdf.iterrows():
            mx = (xs >= r[x0c]) & (xs <= r[x1c])
            my = (ys >= r[y0c]) & (ys <= r[y1c])
            cell_masks.append(np.outer(my, mx))
        remaining = ~occ
        chosen = []
        total = GRID * GRID
        order = 0
        ids = pdf[id_col].to_numpy()
        while remaining.any():
            gains = [int((m & remaining).sum()) for m in cell_masks]
            best = int(np.argmax(gains))
            # deterministic tie-break: smallest id among max gain
            best_gain = gains[best]
            if best_gain == 0:
                break
            cands = [i for i, g in enumerate(gains) if g == best_gain]
            best = min(cands, key=lambda i: ids[i])
            chosen.append((ids[best], order, best_gain / total))
            remaining &= ~cell_masks[best]
            cell_masks[best] = np.zeros_like(occ)  # don't repick
            order += 1
        rows = []
        for pid, orderv, frac in chosen:
            row = {c: str(pdf.iloc[0][c]) for c in group_cols}
            row[id_col] = int(pid)
            row["cover_order"] = orderv
            row["overlap_frac"] = float(frac)
            rows.append(row)
        return pd.DataFrame(
            rows,
            columns=group_cols + [id_col, "cover_order", "overlap_frac"],
        )

    return products.groupBy(*group_cols).applyInPandas(cover_group, out_schema)


def overlap_percentage(
    products: DataFrame,
    aoi_bounds: tuple[float, float, float, float],
    bounds_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """overlappercentage (ee_query.py:505-526) for bbox footprints:
    100 * area(footprint ∩ aoi) / area(aoi), pure expressions."""
    x0c, y0c, x1c, y1c = bounds_cols
    ax0, ay0, ax1, ay1 = aoi_bounds
    ix0 = F.greatest(F.col(x0c), F.lit(ax0))
    iy0 = F.greatest(F.col(y0c), F.lit(ay0))
    ix1 = F.least(F.col(x1c), F.lit(ax1))
    iy1 = F.least(F.col(y1c), F.lit(ay1))
    inter = F.greatest(ix1 - ix0, F.lit(0.0)) * F.greatest(iy1 - iy0, F.lit(0.0))
    aoi_area = (ax1 - ax0) * (ay1 - ay0)
    return products.withColumn(
        "overlappercentage", F.round(inter / F.lit(aoi_area) * 100.0, 6)
    )


def filter_degenerate_footprints(
    products: DataFrame,
    bounds_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    max_lat_span: float = 5.0,
) -> DataFrame:
    """Drop corrupt whole-globe footprints: lat span > 5 degrees is
    degenerate (the _filter_degenerate_footprints rule,
    ee_query.py:448-489)."""
    _, y0c, _, y1c = bounds_cols
    return products.where((F.col(y1c) - F.col(y0c)) <= F.lit(max_lat_span))


def catalog_query(
    products: DataFrame,
    aoi_bounds: tuple[float, float, float, float],
    date_start: str,
    date_end: str,
    ts_col: str = "ts",
    lon_col: str = "lon",
    id_col: str = "product_id",
    bounds_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    min_overlap_pct: float = 0.0,
) -> DataFrame:
    """The full ee_query.query pipeline (SURVEY.md §3.3) composed:

    ① tz/date range filter (ee_query.py:165-213)
    ② degenerate-footprint drop (lat span > 5°, :448-489)
    ③ solarday derivation (query_utils.py:58-81)
    ④ overlappercentage vs the AOI (:505-526) + optional floor
    ⑤ per-solarday greedy set-cover dedup (:302-307, query_utils.py:7-55)
    ⑥ order by acquisition time (:309-310)

    Returns the deduplicated catalog rows joined back to their cover
    order and overlap fraction.
    """
    out = filter_date(products, ts_col, date_start, date_end)
    out = filter_degenerate_footprints(out, bounds_cols)
    out = with_solar_day(out, ts_col, lon_col)
    out = overlap_percentage(out, aoi_bounds, bounds_cols)
    if min_overlap_pct > 0:
        out = out.where(F.col("overlappercentage") >= F.lit(min_overlap_pct))
    day_str = out.withColumn("solarday", F.date_format("solarday", "yyyy-MM-dd"))
    cover = greedy_set_cover_dedup(
        day_str, aoi_bounds, group_cols=["solarday"], id_col=id_col,
        bounds_cols=bounds_cols,
    )
    return (
        day_str.join(cover.drop("solarday"), id_col, "inner")
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    )
