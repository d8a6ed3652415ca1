"""Point-in-polygon join — filter-and-refine, Spark-first.

Re-expresses the reference's geometric joins (SURVEY.md §2.3):
``footprint.intersects(polygon)`` pruning (/root/reference/georeader/
read.py:1593-1596) and ``gpd.sjoin`` (readers/ee_query.py:434-446) as:

1. **coarse filter** — polygon cell-cover (GridCell analog of an H3
   cover) built driver-side for the small polygon table, broadcast,
   equi-joined to the points' cell column. Pure JVM hash join against
   a broadcast relation: no shuffle of the big side at any scale.
2. **exact refine** — even-odd PIP in an Arrow-batched pandas UDF over
   only the surviving (point, polygon) candidate pairs; polygon
   geometry is shipped once per executor via a Spark broadcast.

At 100 TB the coarse join prunes all but the cover cells' rows before
any Python runs; the refine UDF sees only candidates. Cover resolution
trades false-positive rate against cover size — pick so that
``len(cover) * n_polygons`` stays broadcastable (it is, by the
FIXTURES.md §2 contract of a small polygon side).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions.geo import cell_encode
from ..kernels import cells as kcells
from ..kernels import geometry as kgeom

PolyTable = Sequence[Tuple[int, List[kgeom.PolygonT]]]  # (poly_id, multipolygon)


def polygon_cover(
    polygons: PolyTable, r: int, exact: bool = True
) -> List[Tuple[int, int]]:
    """(cell, poly_id) cover rows at resolution r.

    ``exact=True`` keeps only cells whose bbox intersects the polygon
    exactly (corner/center PIP + edge test via polygons_intersect);
    ``exact=False`` keeps the full bbox cover (cheaper to build, more
    refine work). Either is correct — refine removes false positives.
    """
    out: List[Tuple[int, int]] = []
    for poly_id, mp in polygons:
        seen = set()
        for poly in mp:
            bb = kgeom.polygon_bbox(poly)
            for cell in kcells.cover_bbox(bb[0], bb[1], bb[2], bb[3], r):
                if cell in seen:
                    continue
                if exact:
                    cb = kcells.cell_bounds(cell)
                    cell_ring = [kgeom.box_ring(cb[0], cb[1], cb[2], cb[3])]
                    if not kgeom.polygons_intersect(cell_ring, poly):
                        continue
                seen.add(cell)
                out.append((cell, poly_id))
    return out


def pip_join(
    points: DataFrame,
    polygons: PolyTable,
    lon_col: str = "lon",
    lat_col: str = "lat",
    r: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join points to the polygons containing them.

    Returns ``points`` columns + ``poly_id``. ``how='inner'`` drops
    unmatched points (sjoin inner semantics, ee_query.py:434-446).
    """
    spark = points.sparkSession
    cover = polygon_cover(polygons, r)
    cover_df = spark.createDataFrame(cover, "_cover_cell long, poly_id int")

    # geometry broadcast once per executor for the refine UDF
    sc = spark.sparkContext
    geom_bc = sc.broadcast({int(pid): mp for pid, mp in polygons})

    @F.pandas_udf(BooleanType())
    def pip_refine(lon: pd.Series, lat: pd.Series, poly_id: pd.Series) -> pd.Series:
        geoms: Dict[int, List[kgeom.PolygonT]] = geom_bc.value
        xs = lon.to_numpy(dtype=np.float64)
        ys = lat.to_numpy(dtype=np.float64)
        pid = poly_id.to_numpy()
        out = np.zeros(len(xs), dtype=bool)
        for p in np.unique(pid):
            sel = pid == p
            inside = np.zeros(int(sel.sum()), dtype=bool)
            for poly in geoms[int(p)]:
                inside |= kgeom.points_in_polygon(xs[sel], ys[sel], poly)
            out[sel] = inside
        return pd.Series(out)

    candidates = points.withColumn(
        "_cover_cell", cell_encode(F.col(lon_col), F.col(lat_col), r)
    ).join(F.broadcast(cover_df), "_cover_cell", "inner")

    matched = candidates.where(
        pip_refine(F.col(lon_col), F.col(lat_col), F.col("poly_id"))
    ).drop("_cover_cell")

    if how == "inner":
        return matched
    raise ValueError(f"unsupported how={how!r}")


def boxes_to_polytable(
    boxes: Sequence[Tuple[int, float, float, float, float]]
) -> PolyTable:
    """(poly_id, xmin, ymin, xmax, ymax) rows -> PolyTable of boxes."""
    return [
        (pid, [[kgeom.box_ring(x0, y0, x1, y1)]]) for pid, x0, y0, x1, y1 in boxes
    ]


def wkb_to_polytable(rows: Sequence[Tuple[int, bytes]]) -> PolyTable:
    """(poly_id, wkb) rows -> PolyTable (polygon or multipolygon WKB)."""
    return [(pid, kgeom.wkb_polygons(buf)) for pid, buf in rows]
