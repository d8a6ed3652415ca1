"""GeoTIFF bytes <-> long-form raster tables as Spark operators — the
distributed surface over kernels/geotiff:

- :func:`long_to_geotiff` is the ``save_cog``/``save_tiled_geotiff``
  analog (/root/reference/georeader/save.py:327-449): one COG-laid-out
  GeoTIFF payload per raster_id, assembled per group with
  ``applyInPandas`` (sequential within a raster, parallel across
  rasters — the same grain the reference writes files at).
- :func:`geotiff_to_long` is the ``GeoTensor.load_bytes`` analog
  (/root/reference/georeader/geotensor.py:2165-2214): an Arrow-batched
  ``mapInPandas`` decode of a binary GeoTIFF column into long
  (raster_id, band, row, col, value) rows — the form every raster
  operator in this engine consumes.

At 100 TB the bytes stay executor-side end-to-end: encode shuffles
only each raster's own pixels (keyed by raster_id), decode is a
map-only pass over the payload column; nothing touches the driver.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..kernels.affine import Affine
from ..kernels.geotiff import decode_geotiff, encode_geotiff

_TIF_SCHEMA = StructType(
    [
        StructField("raster_id", IntegerType()),
        StructField("n_bands", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("tif", BinaryType()),
    ]
)


def long_to_geotiff(
    raster: DataFrame,
    height: int,
    width: int,
    transform: Affine,
    crs_epsg: Optional[int] = None,
    tile: int = 256,
    compress: bool = True,
    nodata: Optional[float] = None,
    overview_levels: int = 0,
    dtype: str = "float64",
) -> DataFrame:
    """(raster_id, band, row, col, value) -> one GeoTIFF payload row
    per raster_id. ``overview_levels`` > 0 emits COG pyramids. Pixels
    absent from the long form take ``nodata`` (or 0)."""
    fill = 0.0 if nodata is None else float(nodata)
    np_dtype = np.dtype(dtype)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (raster_id,) = key
        nb = int(pdf["band"].max()) + 1
        arr = np.full((nb, height, width), fill, dtype=np_dtype)
        arr[
            pdf["band"].to_numpy(),
            pdf["row"].to_numpy(),
            pdf["col"].to_numpy(),
        ] = pdf["value"].to_numpy().astype(np_dtype)
        buf = encode_geotiff(
            arr, transform, crs_epsg=crs_epsg, tile=tile, compress=compress,
            nodata=nodata, overview_levels=overview_levels,
        )
        return pd.DataFrame(
            {
                "raster_id": [raster_id],
                "n_bands": [nb],
                "height": [height],
                "width": [width],
                "tif": [buf],
            }
        )

    return raster.groupBy("raster_id").applyInPandas(assemble, _TIF_SCHEMA)


def geotiff_to_long(
    tifs: DataFrame,
    overview: int = 0,
    drop_nodata: bool = False,
) -> DataFrame:
    """(raster_id, tif binary) -> long (raster_id, band, row, col,
    value) rows; ``overview`` selects a pyramid level (LOD read path),
    ``drop_nodata`` filters fill pixels during decode (predicate
    applied inside the Arrow batch — pushdown for free)."""

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for rid, buf in zip(pdf["raster_id"].to_numpy(), pdf["tif"]):
                arr, _t, _epsg, nodata = decode_geotiff(bytes(buf), overview=overview)
                nb, h, w = arr.shape
                bb, rr, cc = np.meshgrid(
                    np.arange(nb), np.arange(h), np.arange(w), indexing="ij"
                )
                vals = arr.ravel().astype(np.float64)
                keep = slice(None)
                if drop_nodata and nodata is not None:
                    # NaN != NaN is elementwise True, so a NaN-fill
                    # raster would keep every fill pixel (ADVICE r3)
                    keep = (
                        ~np.isnan(vals) if np.isnan(nodata) else vals != nodata
                    )
                outs.append(
                    pd.DataFrame(
                        {
                            "raster_id": np.full(vals.shape, rid, dtype=np.int32)[keep],
                            "band": bb.ravel().astype(np.int32)[keep],
                            "row": rr.ravel().astype(np.int64)[keep],
                            "col": cc.ravel().astype(np.int64)[keep],
                            "value": vals[keep],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = "raster_id int, band int, row long, col long, value double"
    return tifs.mapInPandas(explode, schema)
