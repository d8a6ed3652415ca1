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


def _mask_to_df(spark, mask: np.ndarray):
    """bool mask -> long-form raster DataFrame (value 1.0 where on)."""
    ys, xs = np.nonzero(mask)
    rows = [(int(y), int(x), 1.0) for y, x in zip(ys, xs)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _oracle_stats(mask: np.ndarray, min_area: int = 0):
    """flood-fill oracle -> sorted (component, n, bbox) with canonical
    component id = min linear pixel index."""
    w = mask.shape[1]
    out = []
    for pix in flood_fill_components(mask):
        if len(pix) < min_area:
            continue
        ys = [p[0] for p in pix]
        xs = [p[1] for p in pix]
        comp = min(y * w + x for y, x in pix)
        out.append((comp, len(pix), min(ys), min(xs), max(ys), max(xs)))
    return sorted(out)


class TestDistributedCCL:
    def _blob_mask(self, H, W, block=6):
        """Block-quantized field thresholded at 7000 — real multi-tile
        blobs (the round-1 per-pixel hash fixture had only singletons)."""
        rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        blk = (rr // block) * (W // block) + (cc // block)
        vals = (blk.astype(np.int64) * 2654435761) % 10000
        return vals >= 7000

    def test_matches_floodfill_blobs(self, spark):
        H, W = 96, 96
        mask = self._blob_mask(H, W)
        assert mask.sum() > 500  # fixture sanity: real foreground
        got = connected_components(_mask_to_df(spark, mask), H, W, tile=32).collect()
        expect = _oracle_stats(mask)
        # multi-pixel components exist and at least one spans >= 3 tiles
        assert any(n > 36 for _, n, *_ in expect)
        assert any(
            (mxr // 32 - mnr // 32) + (mxc // 32 - mnc // 32) >= 2
            for _, _, mnr, mnc, mxr, mxc in expect
        )
        got_stats = sorted(
            (r["component"], r["n_pixels"], r["min_row"], r["min_col"],
             r["max_row"], r["max_col"])
            for r in got
        )
        assert got_stats == expect

    def test_component_spanning_many_tiles(self, spark):
        # one snake crossing a 4x4 tile grid (>= 3 tiles in each leg)
        H = W = 128
        mask = np.zeros((H, W), dtype=bool)
        mask[5, 2:126] = True      # horizontal across all 4 tile columns
        mask[5:120, 125] = True    # then down across all 4 tile rows
        mask[60, 60:64] = True     # separate small blob
        got = connected_components(_mask_to_df(spark, mask), H, W, tile=32).collect()
        expect = _oracle_stats(mask)
        got_stats = sorted(
            (r["component"], r["n_pixels"], r["min_row"], r["min_col"],
             r["max_row"], r["max_col"])
            for r in got
        )
        assert got_stats == expect
        assert len(expect) == 2

    def test_min_area_filter(self, spark):
        mask = self._blob_mask(64, 64)
        df = _mask_to_df(spark, mask)
        all_c = connected_components(df, 64, 64, tile=32, min_area=0).collect()
        big_c = connected_components(df, 64, 64, tile=32, min_area=40).collect()
        assert len(big_c) == sum(1 for r in all_c if r["n_pixels"] >= 40)
        assert 0 < len(big_c) < len(all_c)


class TestTracing:
    def test_known_shapes(self):
        from georeader_spark.kernels.tracing import component_rings, shoelace_area

        # square
        r = component_rings([(0, 0)])
        assert len(r) == 1
        assert r[0].tolist() == [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
        # donut: exterior 9, hole -1
        pix = [(i, j) for i in range(3) for j in range(3) if (i, j) != (1, 1)]
        rings = component_rings(pix)
        assert sorted(round(shoelace_area(x)) for x in rings) == [-1, 9]
        # diagonal self-touch pinches into ONE ring (GDAL behavior)
        c_shape = [(0, 1), (0, 2), (1, 2), (2, 2), (2, 1), (2, 0), (1, 0)]
        rings = component_rings(c_shape)
        assert len(rings) == 1 and round(shoelace_area(rings[0])) == 7

    def test_area_invariant_random(self):
        from georeader_spark.kernels.tracing import component_rings, shoelace_area

        rng = np.random.default_rng(5)
        for _ in range(5):
            mask = rng.random((20, 20)) < 0.5
            for pix in flood_fill_components(mask):
                rings = component_rings(pix)
                total = sum(shoelace_area(r) for r in rings)
                assert round(total) == len(pix)

    def test_douglas_peucker(self):
        from georeader_spark.kernels.tracing import douglas_peucker

        # staircase within tolerance 1 collapses to its endpoints' chord
        pts = np.array([[0, 0], [1, 0], [1, 1], [2, 1], [2, 2], [3, 2], [3, 3]],
                       dtype=float)
        out = douglas_peucker(pts, 1.0)
        assert out.tolist() == [[0, 0], [3, 3]]
        out = douglas_peucker(pts, 0.1)
        assert len(out) > 2


class TestPolygonize:
    def test_matches_kernel_and_transform(self, spark):
        from georeader_spark.kernels.affine import Affine
        from georeader_spark.kernels.tracing import component_rings, simplify_ring
        from georeader_spark.operators.vectorize import polygonize

        H = W = 64
        mask = np.zeros((H, W), dtype=bool)
        mask[10:20, 10:40] = True       # rectangle across 2 tiles
        mask[30:45, 5:15] = True
        mask[33:40, 8:11] = False       # hole
        mask[50, 50] = True             # singleton below min_area
        t = Affine.from_origin(0.0, 64.0, 0.5, 0.5)
        got = polygonize(
            _mask_to_df(spark, mask), H, W, transform=t, tile=32,
            min_area=4, tolerance=1.0,
        ).collect()
        comps = {}
        for r in got:
            comps.setdefault(r["component"], {}).setdefault(
                r["ring"], []
            ).append((r["vtx"], r["x"], r["y"], r["is_hole"]))
        # singleton filtered, two components survive
        assert len(comps) == 2
        # oracle: same kernel over flood-fill components
        expect = {}
        for pix in flood_fill_components(mask):
            if len(pix) < 4:
                continue
            comp = min(y * W + x for y, x in pix)
            rings = [simplify_ring(r, 1.0) for r in component_rings(pix)]
            expect[comp] = rings
        assert set(comps) == set(expect)
        for comp, rings in expect.items():
            got_rings = comps[comp]
            assert len(got_rings) == len(rings)
            for ri, ring in enumerate(rings):
                verts = [(x, y) for _, x, y, _ in sorted(got_rings[ri])]
                gx = 0.0 + ring[:, 0] * 0.5
                gy = 64.0 + ring[:, 1] * -0.5
                np.testing.assert_allclose(verts, np.column_stack([gx, gy]))
        # the holed component reports exactly one hole ring
        holed = [c for c in comps.values() if len(c) > 1]
        assert len(holed) == 1
        assert any(v[3] for ring in holed[0].values() for v in ring)


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
