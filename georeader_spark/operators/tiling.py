"""Tiling operators: declarative tile generation + assignment + stitch.

Re-expresses georeader's tiling surface (SURVEY.md §2.5):

- :func:`generate_tiles` — ``create_windows`` (slices.py:321-403) as a
  Spark ``sequence()``+``explode()`` plan: tile windows are *generated
  on executors*, never collected on the driver, so a 10^6-tile grid is
  a DataFrame like any other. Exact stride/edge semantics of the
  kernel (stride = size - overlap; include/trim flags;
  ``start_negative_if_padding`` first tile at -overlap // 2).
- :func:`assign_points_to_tiles` — window_from_bounds + floor division
  (read.py:316-367) as pure column expressions: the tiling key of the
  engine.
- :func:`windows_from_bounds_df` — batch bounds -> rounded-outer
  integral windows as column expressions (round-half-up at
  PIXEL_PRECISION; see note on the rounding rule below).
- :func:`stitch_core_regions` — tile-and-stitch crop: overlap-padded
  predictions cut back to core write windows (slice_save_for_pred,
  window_utils.py:1256-1386) via expressions; reassembly is a plain
  groupBy on the write tile.

Rounding note: the kernel's ``round_outer_window`` pre-rounds with
Python banker's rounding (round-half-even). SQL ``round`` is
half-away-from-zero in both Spark and DuckDB, so the declarative path
uses an explicit ``floor(x * 1000 + 0.5) / 1000`` (half-up) — identical
in both engines, and identical to the kernel everywhere except exact
.0005 thousandth boundaries, which the synthetic fixtures avoid (and
real coordinates hit with probability ~0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.affine import Affine


def _snap3(x: Column) -> Column:
    """round(x, 3) with half-up semantics (engine-portable)."""
    return F.floor(x * F.lit(1000.0) + F.lit(0.5)) / F.lit(1000.0)


def _snap3_sql(x: str) -> str:
    return f"(FLOOR({x} * 1000.0 + 0.5) / 1000.0)"


def round_outer_cols(
    col_off: Column, row_off: Column, width: Column, height: Column
) -> tuple[Column, Column, Column, Column]:
    """round_outer_window as column expressions."""
    col_end = F.ceil(_snap3(col_off + width)).cast("long")
    row_end = F.ceil(_snap3(row_off + height)).cast("long")
    co = F.floor(_snap3(col_off)).cast("long")
    ro = F.floor(_snap3(row_off)).cast("long")
    return co, ro, (col_end - co), (row_end - ro)


def round_outer_sql(col_off: str, row_off: str, width: str, height: str) -> dict:
    """Same arithmetic as :func:`round_outer_cols` for the DuckDB oracle."""
    ce = f"CAST(CEIL({_snap3_sql(f'({col_off} + {width})')}) AS BIGINT)"
    re_ = f"CAST(CEIL({_snap3_sql(f'({row_off} + {height})')}) AS BIGINT)"
    co = f"CAST(FLOOR({_snap3_sql(col_off)}) AS BIGINT)"
    ro = f"CAST(FLOOR({_snap3_sql(row_off)}) AS BIGINT)"
    return {"col_off": co, "row_off": ro, "width": f"({ce} - {co})", "height": f"({re_} - {ro})"}


def _starts_1d(dimsize: int, size: int, overlap: int, start_negative: bool) -> Column:
    """sequence() of tile start offsets replicating slices_1d."""
    if dimsize < size:
        return F.array(F.lit(0))
    stride = size - overlap
    if stride <= 0 or stride >= dimsize:
        raise ValueError(f"invalid stride {stride} for dimsize {dimsize}")
    start_value = -overlap // 2 if start_negative else 0
    return F.sequence(F.lit(start_value), F.lit(dimsize - 1), F.lit(stride))


def generate_tiles(
    spark: SparkSession,
    shape: tuple[int, int],
    window_size: tuple[int, int],
    overlap: tuple[int, int] | None = None,
    include_incomplete: bool = True,
    start_negative_if_padding: bool = False,
    trim_incomplete: bool = True,
) -> DataFrame:
    """Tile windows of an (H, W) grid as a DataFrame
    ``(col_off long, row_off long, width long, height long)``.

    Row order matches ``kernels.slices.create_windows`` (x-major).
    """
    H, W = shape
    th, tw = window_size
    oy, ox = (0, 0) if overlap is None else overlap

    df = spark.range(1).select(
        F.explode(_starts_1d(W, tw, ox, start_negative_if_padding)).alias("x0")
    )
    df = df.select(
        "x0",
        F.explode(_starts_1d(H, th, oy, start_negative_if_padding)).alias("y0"),
    )
    x_end = F.col("x0") + F.lit(tw)
    y_end = F.col("y0") + F.lit(th)
    if not include_incomplete:
        # kernel keeps the single undersized tile when dim < size
        cond = F.lit(True)
        if W >= tw:
            cond = cond & (x_end <= F.lit(W))
        if H >= th:
            cond = cond & (y_end <= F.lit(H))
        df = df.where(cond)
    if trim_incomplete:
        x_end = F.least(x_end, F.lit(W))
        y_end = F.least(y_end, F.lit(H))
    return df.select(
        F.col("x0").cast("long").alias("col_off"),
        F.col("y0").cast("long").alias("row_off"),
        (x_end - F.col("x0")).cast("long").alias("width"),
        (y_end - F.col("y0")).cast("long").alias("height"),
    )


def generate_tiles_sql(
    shape: tuple[int, int],
    window_size: tuple[int, int],
    overlap: tuple[int, int] | None = None,
    include_incomplete: bool = True,
    trim_incomplete: bool = True,
    range_fn: str = "range",
) -> str:
    """DuckDB oracle SQL equivalent of :func:`generate_tiles`
    (``range_fn='range'`` uses DuckDB's range() table function)."""
    H, W = shape
    th, tw = window_size
    oy, ox = (0, 0) if overlap is None else overlap
    sx = tw - ox
    sy = th - oy
    nx = (W + sx - 1) // sx if W >= tw else 1
    ny = (H + sy - 1) // sy if H >= th else 1
    x_end = f"LEAST(x0 + {tw}, {W})" if trim_incomplete else f"(x0 + {tw})"
    y_end = f"LEAST(y0 + {th}, {H})" if trim_incomplete else f"(y0 + {th})"
    cond = f"WHERE x0 + {tw} <= {W} AND y0 + {th} <= {H}" if not include_incomplete else ""
    return f"""
        WITH xs AS (SELECT CAST(range AS BIGINT) * {sx} AS x0 FROM {range_fn}(0, {nx})),
             ys AS (SELECT CAST(range AS BIGINT) * {sy} AS y0 FROM {range_fn}(0, {ny}))
        SELECT x0 AS col_off, y0 AS row_off,
               CAST({x_end} - x0 AS BIGINT) AS width,
               CAST({y_end} - y0 AS BIGINT) AS height
        FROM xs CROSS JOIN ys {cond}
    """


def assign_points_to_tiles(
    points: DataFrame,
    transform: Affine,
    tile_size: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Geo points -> (pixel, tile) coordinates under a grid spec.

    Pure column expressions (floor of the inverse rectilinear
    transform) — the predicate-pushdown key of SURVEY.md §2.2: a filter
    on (tile_row, tile_col) prunes parquet partitions before any scan.
    """
    if not transform.is_rectilinear:
        raise ValueError("tile assignment requires a rectilinear transform")
    px = (F.col(x_col) - F.lit(transform.c)) / F.lit(transform.a)
    py = (F.col(y_col) - F.lit(transform.f)) / F.lit(transform.e)
    pcol = F.floor(px).cast("long")
    prow = F.floor(py).cast("long")
    return points.withColumns(
        {
            "pixel_col": pcol,
            "pixel_row": prow,
            "tile_col": F.floor(pcol / F.lit(tile_size)).cast("long"),
            "tile_row": F.floor(prow / F.lit(tile_size)).cast("long"),
        }
    )


def assign_points_to_tiles_sql(
    transform: Affine, tile_size: int, x_col: str, y_col: str
) -> dict:
    px = f"(({x_col} - {transform.c!r}) / {transform.a!r})"
    py = f"(({y_col} - {transform.f!r}) / {transform.e!r})"
    pcol = f"CAST(FLOOR({px}) AS BIGINT)"
    prow = f"CAST(FLOOR({py}) AS BIGINT)"
    return {
        "pixel_col": pcol,
        "pixel_row": prow,
        "tile_col": f"CAST(FLOOR({pcol} / {tile_size}.0) AS BIGINT)",
        "tile_row": f"CAST(FLOOR({prow} / {tile_size}.0) AS BIGINT)",
    }


def stitch_core_regions(
    tiles: DataFrame,
    data_shape: tuple[int, int],
) -> DataFrame:
    """Overlap-tiled windows -> core write windows + crop slices.

    Input columns: col_off/row_off/width/height (the padded read
    windows). Output adds ``write_*`` (the in-bounds core window) and
    ``crop_*`` (slice offsets into the padded tile) — the distributed
    port of slice_save_for_pred + write_from_window: downstream, a
    groupBy(write tile) reassembles predictions with no gaps/overlaps.
    """
    H, W = data_shape
    col_off, row_off = F.col("col_off"), F.col("row_off")
    col_end, row_end = col_off + F.col("width"), row_off + F.col("height")
    w_c0 = F.greatest(col_off, F.lit(0))
    w_r0 = F.greatest(row_off, F.lit(0))
    w_c1 = F.least(col_end, F.lit(W))
    w_r1 = F.least(row_end, F.lit(H))
    return tiles.withColumns(
        {
            "write_col_off": w_c0,
            "write_row_off": w_r0,
            "write_width": w_c1 - w_c0,
            "write_height": w_r1 - w_r0,
            "crop_x0": w_c0 - col_off,
            "crop_x1": w_c1 - col_off,
            "crop_y0": w_r0 - row_off,
            "crop_y1": w_r1 - row_off,
        }
    )
