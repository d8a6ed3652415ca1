"""Delaunay kernel + distributed griddata-linear vs analytic oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels.affine import Affine
from georeader_spark.kernels.delaunay import delaunay, linear_interpolate


class TestDelaunayKernel:
    def test_triangle_count_formula(self):
        # t = 2n - h - 2 for any Delaunay triangulation (n points,
        # h on convex hull)
        rng = np.random.default_rng(11)
        pts = rng.random((40, 2)) * 10
        tris = delaunay(pts)
        # hull size via gift wrapping on the fly
        from math import atan2

        def hull_size(p):
            p = p[np.lexsort((p[:, 1], p[:, 0]))]
            def half(pp):
                out = []
                for q in pp:
                    while len(out) >= 2 and np.cross(
                        out[-1] - out[-2], q - out[-2]
                    ) <= 0:
                        out.pop()
                    out.append(q)
                return out
            lower, upper = half(p), half(p[::-1])
            return len(lower) + len(upper) - 2

        h = hull_size(pts)
        assert len(tris) == 2 * len(pts) - h - 2

    def test_empty_circumcircle(self):
        rng = np.random.default_rng(3)
        pts = rng.random((25, 2))
        tris = delaunay(pts)
        for t in tris:
            a, b, c = pts[t]
            ax, ay = a; bx, by = b; cx, cy = c
            d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
            ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
                  + (cx**2 + cy**2) * (ay - by)) / d
            uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
                  + (cx**2 + cy**2) * (bx - ax)) / d
            r2 = (ax - ux) ** 2 + (ay - uy) ** 2
            d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
            others = np.ones(len(pts), dtype=bool)
            others[t] = False
            assert (d2[others] >= r2 * (1 - 1e-9)).all()

    def test_linear_field_exact(self):
        rng = np.random.default_rng(7)
        pts = rng.random((60, 2)) * 20
        vals = 3.0 + 0.5 * pts[:, 0] - 1.25 * pts[:, 1]
        qx = rng.uniform(5, 15, 200)
        qy = rng.uniform(5, 15, 200)
        got = linear_interpolate(pts, vals, qx, qy)
        expect = 3.0 + 0.5 * qx - 1.25 * qy
        inside = ~np.isnan(got)
        assert inside.mean() > 0.95
        np.testing.assert_allclose(got[inside], expect[inside], rtol=1e-9)

    def test_outside_hull_fill(self):
        pts = np.array([[0.0, 0], [1, 0], [0, 1], [1, 1]])
        got = linear_interpolate(pts, np.ones(4), np.array([5.0]),
                                 np.array([5.0]), fill=-7.0)
        assert got[0] == -7.0

    def test_at_point_exact(self):
        rng = np.random.default_rng(9)
        pts = rng.random((30, 2))
        vals = rng.random(30)
        got = linear_interpolate(pts, vals, pts[:, 0], pts[:, 1])
        np.testing.assert_allclose(got, vals, atol=1e-9)


class TestGriddataLinearSpark:
    def test_linear_field_exact_distributed(self, spark):
        from georeader_spark.operators.reproject import griddata_interpolate

        rng = np.random.default_rng(13)
        n = 400
        x = rng.uniform(-10.0, 30.0, n)
        y = rng.uniform(35.0, 60.0, n)
        v = 2.0 + 0.25 * x + 0.5 * y
        pts = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)],
            "x double, y double, value double",
        )
        t = Affine.from_origin(-10.0, 60.0, 0.5, 0.3125)
        H, W = 80, 80
        out = griddata_interpolate(pts, t, (H, W), method="linear", tile=32,
                                   margin_px=40)
        rows = out.collect()
        assert len(rows) == H * W
        n_in = 0
        for r in rows:
            gx = -10.0 + (r["col"] + 0.5) * 0.5
            gy = 60.0 + (r["row"] + 0.5) * -0.3125
            # outside-hull fill: NaN becomes SQL null through Arrow
            if r["value"] is not None and not np.isnan(r["value"]):
                n_in += 1
                assert abs(r["value"] - (2.0 + 0.25 * gx + 0.5 * gy)) < 1e-6
        assert n_in > 0.8 * H * W

    def test_nearest_matches_kernel(self, spark):
        from georeader_spark.operators.reproject import griddata_interpolate

        rng = np.random.default_rng(17)
        n = 100
        x = rng.uniform(0.0, 32.0, n)
        y = rng.uniform(-32.0, 0.0, n)
        v = rng.random(n) * 10
        pts = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)],
            "x double, y double, value double",
        )
        t = Affine.from_origin(0.0, 0.0, 1.0, 1.0)
        out = griddata_interpolate(pts, t, (32, 32), method="nearest",
                                   tile=32, margin_px=64)
        got = {(r["row"], r["col"]): r["value"] for r in out.collect()}
        for (rr, cc), val in list(got.items())[:50]:
            gx, gy = 0.0 + (cc + 0.5) * 1.0, 0.0 + (rr + 0.5) * -1.0
            d2 = (x - gx) ** 2 + (y - gy) ** 2
            assert val == pytest.approx(float(v[np.argmin(d2)]))
