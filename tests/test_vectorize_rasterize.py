"""Rasterize + distributed CCL vs single-process numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels import geometry as kgeom
from georeader_spark.kernels.affine import Affine
from georeader_spark.operators import raster as R
from georeader_spark.operators.rasterize import (
    rasterize_any_long,
    rasterize_convex_long,
)
from georeader_spark.operators.vectorize import _label_tile, connected_components


def flood_fill_components(mask: np.ndarray):
    """Single-process CCL oracle (BFS, 4-connectivity)."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    comps = []
    for i in range(h):
        for j in range(w):
            if mask[i, j] and not seen[i, j]:
                stack = [(i, j)]
                seen[i, j] = True
                pix = []
                while stack:
                    y, x = stack.pop()
                    pix.append((y, x))
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < h and 0 <= xx < w and mask[yy, xx] and not seen[yy, xx]:
                            seen[yy, xx] = True
                            stack.append((yy, xx))
                comps.append(pix)
    return comps


class TestLabelTile:
    def test_simple_shapes(self):
        mask = np.zeros((10, 10), dtype=bool)
        mask[1:4, 1:4] = True
        mask[6:9, 6:9] = True
        mask[0, 9] = True
        labels = _label_tile(mask)
        assert len(np.unique(labels[labels > 0])) == 3
        assert (labels[1:4, 1:4] == labels[1, 1]).all()
        assert labels[1, 1] != labels[6, 6]

    def test_u_shape_merges(self):
        # U shape forces a union between the two arms
        mask = np.zeros((5, 5), dtype=bool)
        mask[0:4, 0] = True
        mask[0:4, 4] = True
        mask[4, 0:5] = True
        labels = _label_tile(mask)
        assert len(np.unique(labels[labels > 0])) == 1

    def test_matches_floodfill_random(self):
        rng = np.random.default_rng(42)
        for _ in range(5):
            mask = rng.random((40, 40)) < 0.45
            labels = _label_tile(mask)
            comps = flood_fill_components(mask)
            assert len(np.unique(labels[labels > 0])) == len(comps)
            for pix in comps:
                vals = {labels[y, x] for y, x in pix}
                assert len(vals) == 1


class TestDistributedCCL:
    def test_matches_floodfill(self, spark):
        H, W = 96, 96
        src = R.synth_raster(spark, 1, H, W, bands=1).withColumn(
            "value",
            F.when(F.col("value") < 7000, F.lit(0.0)).otherwise(F.col("value")),
        )
        got = connected_components(src, H, W, tile=32).collect()

        idx = np.arange(H * W, dtype=np.int64)
        vals = ((idx * 2654435761) % 10000).reshape(H, W)
        mask = vals >= 7000
        comps = flood_fill_components(mask)
        # same number of components, same sorted size+bbox multiset
        def bbox(pix):
            ys = [p[0] for p in pix]
            xs = [p[1] for p in pix]
            return (len(pix), min(ys), min(xs), max(ys), max(xs))

        expect = sorted(bbox(p) for p in comps)
        got_stats = sorted(
            (r["n_pixels"], r["min_row"], r["min_col"], r["max_row"], r["max_col"])
            for r in got
        )
        assert got_stats == expect

    def test_min_area_filter(self, spark):
        src = R.synth_raster(spark, 1, 64, 64, bands=1).withColumn(
            "value",
            F.when(F.col("value") < 7000, F.lit(0.0)).otherwise(F.col("value")),
        )
        all_c = connected_components(src, 64, 64, tile=32, min_area=0).collect()
        big_c = connected_components(src, 64, 64, tile=32, min_area=5).collect()
        assert len(big_c) == sum(1 for r in all_c if r["n_pixels"] >= 5)


class TestRasterize:
    GEOMS = [
        (1, 10.0, np.array([[2.0, 2.0], [20.0, 2.0], [20.0, 20.0], [2.0, 20.0]])),
        (2, 20.0, np.array([[10.0, 10.0], [30.0, 10.0], [30.0, 28.0], [10.0, 28.0]])),
    ]
    T = Affine.from_origin(0.0, 32.0, 1.0, 1.0)

    def _oracle(self):
        out = np.zeros((32, 32))
        cc, rr = np.meshgrid(np.arange(32), np.arange(32))
        cx = 0.0 + (cc + 0.5) * 1.0
        cy = 32.0 + (rr + 0.5) * -1.0
        for _g, v, ring in self.GEOMS:  # later wins
            closed = np.vstack([ring, ring[:1]])
            inside = kgeom.points_in_polygon(cx.ravel(), cy.ravel(), [closed])
            out.ravel()[inside] = v
        return out

    def test_convex_exprs_matches_oracle(self, spark):
        got_rows = rasterize_convex_long(spark, self.GEOMS, self.T, 32, 32).collect()
        got = np.zeros((32, 32))
        for r in got_rows:
            got[r["row"], r["col"]] = r["value"]
        np.testing.assert_array_equal(got, self._oracle())

    def test_udf_path_matches_exprs(self, spark):
        polys = [
            (g, [[np.vstack([ring, ring[:1]])]]) for g, _v, ring in self.GEOMS
        ]
        values = {g: v for g, v, _ in self.GEOMS}
        got_rows = rasterize_any_long(spark, polys, values, self.T, 32, 32).collect()
        got = np.zeros((32, 32))
        for r in got_rows:
            got[r["row"], r["col"]] = r["value"]
        np.testing.assert_array_equal(got, self._oracle())

    def test_later_wins(self, spark):
        got_rows = rasterize_convex_long(spark, self.GEOMS, self.T, 32, 32).collect()
        got = {(r["row"], r["col"]): r["value"] for r in got_rows}
        # overlap region (12..19 x, 12..19 y geo) must hold the LATER value
        assert got[(32 - 15, 15)] == 20.0
