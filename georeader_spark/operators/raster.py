"""Distributed raster operators over the long (pixel-row) schema.

The reference's dense-array operators re-expressed relationally
(SURVEY.md §1.3: tile-as-row / pixel-as-row): a raster is a DataFrame
``(raster_id, band, row, col, value)`` plus a broadcastable grid-spec
(crs, transform, shape, fill). At 100 TB the long schema is the
SQL-visible view; the binary tile-blocked variant (reproject.py) holds
payloads. Both share the same window/transform planning.

Operators (reference file:line in each docstring):
- grid algebra (add/sub/mul/compare)  geotensor.py:659-1219
- validmask / fill semantics          geotensor.py:2046-2095
- aligned-grid fast-path window read  read.py:1530-1547
- nearest-neighbor reprojection as a *join*  read.py:1348-1674 (path ⑧
  for Resampling.nearest degenerates to an index gather = equi-join)
- spatial_mosaic first-valid-wins     mosaic.py:159-447
- read_out_shape block-mean decimation rasterio_reader.py:1457-1557
- per-band/per-tile reductions        geotensor.py:324-405
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..kernels.affine import Affine


def synth_raster(
    spark,
    raster_id: int,
    height: int,
    width: int,
    bands: int = 1,
    mult: int = 2654435761,
    mod: int = 10000,
    fill_value: float = 0.0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic raster in long form: value =
    pmod((band * H * W + row * W + col) * mult, mod) as double.
    Pure expressions over range() — reproducible in DuckDB SQL for the
    oracle, and scale-free.

    Partitioning derives from the cell count (~10 MB of long-form rows
    per map task), not a flat cores multiple: a 12k-cell bench raster
    in 32 range partitions fed 96-map x 64-reduce shuffles whose
    M x R block count (guide §2.2) dominated every downstream groupBy;
    giant rasters still fan out, capped at 4x parallelism."""
    n = height * width * bands
    if n_partitions is None:
        n_partitions = min(
            max(n // 262144, 1), 4 * spark.sparkContext.defaultParallelism
        )
    df = spark.range(0, n, 1, n_partitions)
    idx = F.col("id")
    band = F.floor(idx / F.lit(height * width)).cast("int")
    rem = idx % F.lit(height * width)
    return df.select(
        F.lit(raster_id).alias("raster_id"),
        band.alias("band"),
        F.floor(rem / F.lit(width)).cast("long").alias("row"),
        (rem % F.lit(width)).cast("long").alias("col"),
        F.pmod(idx * F.lit(mult), F.lit(mod)).cast("double").alias("value"),
    )


def synth_raster_sql(
    raster_id: int,
    height: int,
    width: int,
    bands: int = 1,
    mult: int = 2654435761,
    mod: int = 10000,
    range_fn: str = "range",
) -> str:
    """DuckDB CTE body generating the identical raster."""
    n = height * width * bands
    hw = height * width
    return f"""
        SELECT {raster_id} AS raster_id,
               CAST(FLOOR(range / {hw}) AS INT) AS band,
               CAST(FLOOR((range % {hw}) / {width}) AS BIGINT) AS row,
               CAST((range % {hw}) % {width} AS BIGINT) AS col,
               CAST(((range * {mult}) % {mod} + {mod}) % {mod} AS DOUBLE) AS value
        FROM {range_fn}(0, {n})
    """


def grid_algebra(
    a: DataFrame,
    b: DataFrame,
    op: str,
    keys: tuple[str, ...] = ("band", "row", "col"),
    fill_a: float = 0.0,
    fill_b: float = 0.0,
) -> DataFrame:
    """Element-wise binary op on two same-grid rasters.

    The reference *raises* unless ``same_extent`` (geotensor.py:720-728);
    callers enforce that via plans/gridspec alignment before joining —
    here the join on (band,row,col) is the distributed equivalent.
    Outer-join + fill reproduces boundless semantics: missing pixels
    take the raster's fill value (geotensor.py:2360-2373).
    """
    av = a.select(*keys, F.col("value").alias("va"))
    bv = b.select(*keys, F.col("value").alias("vb"))
    j = av.join(bv, list(keys), "full_outer").select(
        *keys,
        F.coalesce(F.col("va"), F.lit(fill_a)).alias("va"),
        F.coalesce(F.col("vb"), F.lit(fill_b)).alias("vb"),
    )
    # full operator set of the reference's GeoTensor dunder algebra
    # (geotensor.py:951-1219): arithmetic, all six comparisons, and
    # bitwise and/or (mask combination — truthiness = value != 0,
    # matching numpy bool semantics after the reference's mask casts)
    as_bool_a = F.col("va") != F.lit(0.0)
    as_bool_b = F.col("vb") != F.lit(0.0)
    ops: dict[str, Column] = {
        "add": F.col("va") + F.col("vb"),
        "sub": F.col("va") - F.col("vb"),
        "mul": F.col("va") * F.col("vb"),
        "div": F.col("va") / F.col("vb"),
        "eq": (F.col("va") == F.col("vb")).cast("int").cast("double"),
        "ne": (F.col("va") != F.col("vb")).cast("int").cast("double"),
        "lt": (F.col("va") < F.col("vb")).cast("int").cast("double"),
        "le": (F.col("va") <= F.col("vb")).cast("int").cast("double"),
        "gt": (F.col("va") > F.col("vb")).cast("int").cast("double"),
        "ge": (F.col("va") >= F.col("vb")).cast("int").cast("double"),
        "and": (as_bool_a & as_bool_b).cast("int").cast("double"),
        "or": (as_bool_a | as_bool_b).cast("int").cast("double"),
    }
    if op not in ops:
        raise ValueError(f"unsupported op {op!r}")
    return j.select(*keys, ops[op].alias("value"))


def validmask(raster: DataFrame, fill_value: float = 0.0) -> DataFrame:
    """Boolean mask of value != fill (geotensor.py:2046-2095)."""
    return raster.withColumn("valid", F.col("value") != F.lit(fill_value))


def window_read(
    raster: DataFrame,
    col_off: int,
    row_off: int,
    width: int,
    height: int,
) -> DataFrame:
    """Aligned-grid fast-path read (read.py:1530-1547): when grids
    match, "reprojection" is a pure filter + index shift — no resample
    kernel, no shuffle (filter pushes to the scan)."""
    return raster.where(
        (F.col("row") >= row_off)
        & (F.col("row") < row_off + height)
        & (F.col("col") >= col_off)
        & (F.col("col") < col_off + width)
    ).select(
        "raster_id",
        "band",
        (F.col("row") - F.lit(row_off)).alias("row"),
        (F.col("col") - F.lit(col_off)).alias("col"),
        "value",
    )


def reproject_nearest(
    src: DataFrame,
    src_transform: Affine,
    dst_transform: Affine,
    dst_height: int,
    dst_width: int,
    fill_value: float = 0.0,
) -> DataFrame:
    """Nearest-neighbor reprojection between rectilinear grids of the
    same CRS as a *gather join* (the GLT pattern, griddata.py:473-618):

    For each destination pixel, the source index is

        src_col = floor((dst_x_center - src_c) / src_a)
        src_row = floor((dst_y_center - src_f) / src_e)

    computed as column expressions over a generated destination index
    table, then an equi-join against the source pixels. Out-of-source
    pixels take the fill value (np.full allocation, read.py:1579-1585).
    Catalyst handles the join; no Python anywhere.
    """
    spark = src.sparkSession
    n = dst_height * dst_width
    dst = spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 8)).select(
        F.floor(F.col("id") / F.lit(dst_width)).cast("long").alias("row"),
        (F.col("id") % F.lit(dst_width)).cast("long").alias("col"),
    )
    # destination pixel center in geo coords
    dx = F.lit(dst_transform.c) + (F.col("col") + F.lit(0.5)) * F.lit(dst_transform.a)
    dy = F.lit(dst_transform.f) + (F.col("row") + F.lit(0.5)) * F.lit(dst_transform.e)
    s_col = F.floor((dx - F.lit(src_transform.c)) / F.lit(src_transform.a)).cast("long")
    s_row = F.floor((dy - F.lit(src_transform.f)) / F.lit(src_transform.e)).cast("long")
    dst_idx = dst.select(
        F.col("row").alias("dst_row"),
        F.col("col").alias("dst_col"),
        s_row.alias("src_row"),
        s_col.alias("src_col"),
    )
    out = dst_idx.join(
        src.select(
            F.col("band"),
            F.col("row").alias("src_row"),
            F.col("col").alias("src_col"),
            F.col("value"),
        ),
        ["src_row", "src_col"],
        "left",
    )
    return out.select(
        F.coalesce(F.col("band"), F.lit(0)).alias("band"),
        F.col("dst_row").alias("row"),
        F.col("dst_col").alias("col"),
        F.coalesce(F.col("value"), F.lit(fill_value)).alias("value"),
    )


def spatial_mosaic(
    rasters: DataFrame,
    priority_col: str = "raster_id",
    fill_value: float = 0.0,
    keys: tuple[str, ...] = ("band", "row", "col"),
    masking_function=None,
) -> DataFrame:
    """First-valid-wins coalesce of overlapping rasters
    (mosaic.py:159-447): per pixel, take the value of the
    lowest-priority raster whose pixel is valid (!= fill).

    Declarative form: filter invalid, min_by over priority per pixel —
    one shuffle on the pixel key with partial aggregation; the
    reference's early-exit (mosaic.py:443-444) is subsumed by the agg.
    Total order on candidates = priority_col (SURVEY.md §7.3 #2).

    ``masking_function``: the reference's pluggable mask hook
    (mosaic.py:335-348) — a callable ``(DataFrame) -> Column`` returning
    the per-row *invalid* predicate (e.g. a cloud mask expression or a
    Pandas-UDF column). Default: ``value == fill_value``.
    """
    invalid = (
        masking_function(rasters)
        if masking_function is not None
        else F.col("value") == F.lit(fill_value)
    )
    valid = rasters.where(~invalid)
    return valid.groupBy(*keys).agg(
        F.min_by("value", F.col(priority_col)).alias("value"),
        F.min(priority_col).alias("source_id"),
    )


def block_mean_downsample(
    raster: DataFrame, factor: int, keys: tuple[str, ...] = ("band",)
) -> DataFrame:
    """read_out_shape analog (rasterio_reader.py:1457-1557): decimate
    by block mean over factor x factor pixel groups — a pure groupBy
    with partial agg (the overview/LOD path of SURVEY.md §4.1)."""
    return (
        raster.groupBy(
            *keys,
            F.floor(F.col("row") / F.lit(factor)).cast("long").alias("row"),
            F.floor(F.col("col") / F.lit(factor)).cast("long").alias("col"),
        )
        .agg(F.avg("value").alias("value"))
    )


def build_overview_pyramid(
    raster: DataFrame, levels: int, keys: tuple[str, ...] = ("raster_id", "band")
) -> DataFrame:
    """Persisted LOD/overview pyramid (the COG overview table the
    round-1 engine lacked; reference reads pyramid levels at
    rasterio_reader.py:930-1044). Level k halves resolution k times by
    2x2 block mean, each level computed FROM the previous (one partial
    aggregation per level, exactly how COG overviews are built).
    Returns one long table with a ``level`` column; in production each
    level is written to its own partition of the pyramid table."""
    out = raster.withColumn("level", F.lit(0))
    cur = raster
    for k in range(1, levels + 1):
        cur = block_mean_downsample(cur, 2, keys=keys).localCheckpoint(eager=False)
        out = out.unionByName(cur.withColumn("level", F.lit(k)))
    return out


def save_pyramid(pyramid: DataFrame, path: str) -> None:
    """COG-style sink (save_cog analog, SURVEY §2.1 #10): the pyramid
    written level-partitioned so ``read_out_shape_pyramid``'s level
    filter becomes partition PRUNING at the source — a 12x12 read of a
    10^12-pixel raster touches only the deepest level's files."""
    pyramid.write.mode("overwrite").partitionBy("level").parquet(path)


def select_overview_level(
    src_h: int, src_w: int, out_h: int, out_w: int, max_level: int
) -> int:
    """Resolution-aware level choice (rasterio's overview selection in
    read_out_shape, rasterio_reader.py:1457-1557): the deepest level
    still at least as fine as the requested output."""
    import math

    f = min(src_h / out_h, src_w / out_w)
    if f <= 1.0:
        return 0
    return max(0, min(max_level, int(math.floor(math.log2(f)))))


def read_out_shape_pyramid(
    pyramid: DataFrame,
    src_h: int,
    src_w: int,
    out_h: int,
    out_w: int,
    max_level: int,
    keys: tuple[str, ...] = ("raster_id", "band"),
) -> DataFrame:
    """``read_out_shape`` against the pyramid: select the appropriate
    overview level (partition-pruned scan — ``level`` is the partition
    key in production), then block-mean the residual factor. Reading
    1/64 of the pixels instead of decimating the base level is the
    whole point of the pyramid at 100 TB."""
    lvl = select_overview_level(src_h, src_w, out_h, out_w, max_level)
    scale = 1 << lvl
    lh, lw = src_h // scale, src_w // scale
    fh = max(lh // out_h, 1)
    sel = pyramid.where(F.col("level") == F.lit(lvl)).drop("level")
    if fh == 1:
        return sel
    return block_mean_downsample(sel, fh, keys=keys)


def band_stats(raster: DataFrame) -> DataFrame:
    """Per-band reductions (ufunc-reduction analog, geotensor.py:324-405)."""
    return raster.groupBy("band").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.round(F.sum("value"), 4).alias("sum"),
    )


def srf_band_integration(
    spectra: DataFrame,
    bands: list,
    wavelength_col: str = "wavelength",
    value_col: str = "value",
    keys: tuple[str, ...] = ("row", "col"),
) -> DataFrame:
    """Hyperspectral -> multispectral band integration
    (transform_to_srf, /root/reference/georeader/reflectance.py:820+):
    per output band, the SRF-weighted mean over wavelengths:

        out_b = sum_w srf_b(w) * value(w) / sum_w srf_b(w)

    ``bands``: [(name, center_nm, fwhm_nm), ...]. The weighted sums are
    a plain groupBy aggregation over the long spectral table — partial
    aggregation native; weights are JVM expressions.
    """
    from ..functions.reflectance import srf_gaussian_weight

    parts = []
    for name, center, fwhm in bands:
        w = srf_gaussian_weight(F.col(wavelength_col), center, fwhm)
        parts.append(
            spectra.select(
                *keys,
                F.lit(name).alias("dst_band"),
                (w * F.col(value_col)).alias("wv"),
                w.alias("w"),
            )
        )
    allb = parts[0]
    for p in parts[1:]:
        allb = allb.unionByName(p)
    return allb.groupBy(*keys, "dst_band").agg(
        (F.sum("wv") / F.sum("w")).alias("value")
    )


# ---------------------------------------------------------------------------
# RPC georeferencing (read_rpcs) — the warp gather with a rational-
# polynomial camera model instead of an affine grid-to-grid map
# ---------------------------------------------------------------------------

def _rpc_poly_cols(coefs, L: Column, P: Column, H: Column) -> Column:
    """20-term RPC00B polynomial as a JVM column expression, factor
    order and accumulation order identical to kernels.rpc.poly20 and
    its SQL twin so all three produce bit-identical doubles."""
    from ..kernels.rpc import TERM_EXPONENTS

    expr = None
    for c, (el, ep, eh) in zip(coefs, TERM_EXPONENTS):
        if c == 0.0:
            continue
        term = F.lit(float(c))
        for _ in range(el):
            term = term * L
        for _ in range(ep):
            term = term * P
        for _ in range(eh):
            term = term * H
        expr = term if expr is None else expr + term
    return expr if expr is not None else F.lit(0.0)


def rpc_image_cols(rpc, lon: Column, lat: Column, height: Column | None = None
                   ) -> tuple[Column, Column]:
    """FORWARD RPC model (ground -> image) as column expressions:
    fractional (row, col) for a (lon, lat[, height]) point. Pure JVM
    arithmetic — whole-stage codegen, no UDF."""
    if height is None:
        height = F.lit(0.0)
    L = (lon - F.lit(rpc.lon_off)) / F.lit(rpc.lon_scale)
    P = (lat - F.lit(rpc.lat_off)) / F.lit(rpc.lat_scale)
    H = (height - F.lit(rpc.height_off)) / F.lit(rpc.height_scale)
    rn = _rpc_poly_cols(rpc.line_num, L, P, H) / _rpc_poly_cols(rpc.line_den, L, P, H)
    cn = _rpc_poly_cols(rpc.samp_num, L, P, H) / _rpc_poly_cols(rpc.samp_den, L, P, H)
    row = rn * F.lit(rpc.line_scale) + F.lit(rpc.line_off)
    col = cn * F.lit(rpc.samp_scale) + F.lit(rpc.samp_off)
    return row, col


def read_rpcs(
    src: DataFrame,
    rpc,
    dst_transform: Affine,
    dst_height: int,
    dst_width: int,
    fill_value: float = 0.0,
    height: float = 0.0,
) -> DataFrame:
    """Georeference an unprojected sensor array with its RPC camera
    model (reference read_rpcs, /root/reference/georeader/read.py:
    1870-1976, which hands the model to rasterio.warp; the public
    RPC00B math is re-derived in kernels/rpc.py).

    Spark-first shape — the same GLT gather as reproject_nearest, with
    the affine index map replaced by the rational-polynomial forward
    model, still 100% JVM expressions:

      1. generate the destination grid (row, col) via range(),
      2. destination pixel center -> ground (lon, lat) via the dst
         affine transform (RPCs are defined over EPSG:4326),
      3. ground -> source (row, col) via the FORWARD RPC polynomials
         (rpc_image_cols; codegen, no Python),
      4. nearest source pixel = floor(x + 0.5) (pixel centers at
         integers), LEFT equi-join against the source pixel table,
         fill for off-image pixels (read.py:1579-1585 semantics).

    At 100 TB the join shuffles on the source pixel key exactly like
    reproject_nearest — AQE-coalesced, no skew (the RPC map is near-
    bijective), and the polynomial evaluation is embarrassingly
    parallel over destination partitions.
    """
    spark = src.sparkSession
    n = dst_height * dst_width
    dst = spark.range(0, n, 1, max(spark.sparkContext.defaultParallelism, 8)).select(
        F.floor(F.col("id") / F.lit(dst_width)).cast("long").alias("row"),
        (F.col("id") % F.lit(dst_width)).cast("long").alias("col"),
    )
    lon = F.lit(dst_transform.c) + (F.col("col") + F.lit(0.5)) * F.lit(dst_transform.a)
    lat = F.lit(dst_transform.f) + (F.col("row") + F.lit(0.5)) * F.lit(dst_transform.e)
    r_img, c_img = rpc_image_cols(rpc, lon, lat, F.lit(float(height)))
    dst_idx = dst.select(
        F.col("row").alias("dst_row"),
        F.col("col").alias("dst_col"),
        F.floor(r_img + F.lit(0.5)).cast("long").alias("src_row"),
        F.floor(c_img + F.lit(0.5)).cast("long").alias("src_col"),
    )
    out = dst_idx.join(
        src.select(
            F.col("band"),
            F.col("row").alias("src_row"),
            F.col("col").alias("src_col"),
            F.col("value"),
        ),
        ["src_row", "src_col"],
        "left",
    )
    return out.select(
        F.coalesce(F.col("band"), F.lit(0)).alias("band"),
        F.col("dst_row").alias("row"),
        F.col("dst_col").alias("col"),
        F.coalesce(F.col("value"), F.lit(float(fill_value))).alias("value"),
    )


def valid_footprint_mask(
    src: DataFrame,
    fill_value: float = 0.0,
    method: str = "all",
    keys: tuple[str, ...] = ("raster_id",),
) -> DataFrame:
    """Channel-aggregated valid mask (valid_footprint step 1,
    geotensor.py:1600-1633): pixel valid iff its value differs from
    fill in ALL bands (method='all') or ANY band (method='any').

    One groupBy on the pixel key — partial aggregation (bool_and /
    bool_or combine map-side), so at 100 TB the shuffle carries one
    boolean per pixel, never the band values. The output mask feeds
    the same vectorize path the reference uses (CCL + polygonize) or
    the bbox summary in valid_footprint_bounds.
    """
    agg = {"all": F.bool_and, "any": F.bool_or}
    if method not in agg:
        raise NotImplementedError(f"Method {method} to aggregate channels not implemented")
    return src.groupBy(*keys, "row", "col").agg(
        agg[method](F.col("value") != F.lit(fill_value)).alias("valid")
    )


def valid_footprint_bounds(
    mask: DataFrame, keys: tuple[str, ...] = ("raster_id",)
) -> DataFrame:
    """Bounding window + count of the valid region (the footprint's
    grid-space extent; the polygon form goes through vectorize.polygonize).
    Single partial-agg shuffle on the raster key."""
    return mask.where(F.col("valid")).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.min("row").alias("row_min"),
        F.max("row").alias("row_max"),
        F.min("col").alias("col_min"),
        F.max("col").alias("col_max"),
    )
