"""Raster -> vector: distributed connected components + polygonization
(SURVEY.md §2.11, the reference's ``vectorize.get_polygons``,
/root/reference/georeader/vectorize.py:151-268 — global-mask there;
the distributed cross-tile merge is the hard part called out at
SURVEY.md §7.3 #2).

Pipeline:
1. per-tile labeling — grouped-map Arrow UDF runs a pure-numpy two-pass
   union-find CCL inside each tile (4-connectivity); local labels get a
   globally unique prefix (tile id).
2. boundary exchange — each tile emits only its edge strips
   (label, row, col): O(perimeter) rows, tiny next to O(area).
3. driver union-find over adjacent edge pixels of neighboring tiles —
   the strips are small by construction, so this is a metadata join,
   not a data shuffle.
4. relabel + component stats (pixel count, bbox, area) via broadcast
   mapping; min-area filtering mirrors the reference's
   ``min_area=25.5`` default (vectorize.py:258-266).

Polygonization: bbox rings by default. The reference's exact
boundary-tracing + simplify(tolerance=1) applies per component in a
final gather (components are small after min-area filtering); bbox
output keeps v1 deterministic and testable.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_tile(mask: np.ndarray) -> np.ndarray:
    """Two-pass 4-connectivity CCL, pure numpy/python union-find.
    Returns int64 labels (0 = background, labels start at 1)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int64)
    parent: List[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for i in range(h):
        for j in range(w):
            if not mask[i, j]:
                continue
            up = labels[i - 1, j] if i > 0 else 0
            left = labels[i, j - 1] if j > 0 else 0
            if up == 0 and left == 0:
                parent.append(nxt)
                labels[i, j] = nxt
                nxt += 1
            elif up != 0 and left != 0:
                labels[i, j] = min(up, left)
                union(up, left)
            else:
                labels[i, j] = max(up, left)
    # resolve
    lut = np.arange(nxt, dtype=np.int64)
    for k in range(1, nxt):
        lut[k] = find(k)
    return lut[labels]


def connected_components(
    raster: DataFrame,
    height: int,
    width: int,
    tile: int = 128,
    min_area: float = 0.0,
    predicate_col: str = "value",
    fill: float = 0.0,
) -> DataFrame:
    """Label connected regions of ``value != fill`` across the whole
    grid; returns per-component stats
    ``(component long, n_pixels long, min_row, min_col, max_row, max_col)``.
    """
    spark = raster.sparkSession
    keyed = raster.where(F.col(predicate_col) != F.lit(fill)).withColumns(
        {
            "tile_row": F.floor(F.col("row") / F.lit(tile)).cast("long"),
            "tile_col": F.floor(F.col("col") / F.lit(tile)).cast("long"),
        }
    )

    n_tcols = (width + tile - 1) // tile
    out_schema = (
        "label long, row long, col long, on_edge boolean"
    )

    def label_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        trow, tcol = int(key[0]), int(key[1])
        h = min(tile, height - trow * tile)
        w = min(tile, width - tcol * tile)
        mask = np.zeros((h, w), dtype=bool)
        rr = pdf["row"].to_numpy() - trow * tile
        cc = pdf["col"].to_numpy() - tcol * tile
        mask[rr, cc] = True
        labels = _label_tile(mask)
        # globally unique label: tile_index * tile*tile + local label
        tidx = trow * n_tcols + tcol
        base = np.int64(tidx) * (tile * tile + 1)
        ys, xs = np.nonzero(labels)
        glob = base + labels[ys, xs]
        abs_r = ys + trow * tile
        abs_c = xs + tcol * tile
        on_edge = (ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1)
        return pd.DataFrame(
            {"label": glob, "row": abs_r, "col": abs_c, "on_edge": on_edge}
        )

    labeled = keyed.groupBy("tile_row", "tile_col").applyInPandas(
        label_group, out_schema
    )
    labeled = labeled.persist()

    # boundary strips only: O(perimeter) rows to the driver
    edges = labeled.where(F.col("on_edge")).select("label", "row", "col").collect()
    pix = {(r["row"], r["col"]): r["label"] for r in edges}
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for (r, c), lab in pix.items():
        find(lab)
        # only cross-tile adjacencies matter; same-tile ones were merged
        for dr, dc in ((1, 0), (0, 1)):
            other = pix.get((r + dr, c + dc))
            if other is not None and other != lab:
                union(lab, other)

    mapping = {lab: find(lab) for lab in parent}
    if mapping:
        map_df = raster.sparkSession.createDataFrame(
            list(mapping.items()), "label long, component long"
        )
        merged = labeled.join(F.broadcast(map_df), "label", "left").select(
            F.coalesce("component", "label").alias("component"), "row", "col"
        )
    else:
        merged = labeled.select(F.col("label").alias("component"), "row", "col")

    stats = merged.groupBy("component").agg(
        F.count("*").alias("n_pixels"),
        F.min("row").alias("min_row"),
        F.min("col").alias("min_col"),
        F.max("row").alias("max_row"),
        F.max("col").alias("max_col"),
    )
    if min_area > 0:
        stats = stats.where(F.col("n_pixels") >= F.lit(min_area))
    labeled.unpersist()
    return stats
