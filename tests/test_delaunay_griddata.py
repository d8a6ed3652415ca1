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


class TestCloughTocherKernel:
    """Reduced-HCT cubic kernel (kernels/delaunay.ct_interpolate) —
    reference griddata.py:328-330 (scipy CloughTocher2DInterpolator
    semantics; scipy absent, kernel is self-carried)."""

    def _pts(self, n=60, seed=2):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.uniform(0.0, 10.0, (n, 2)), rng

    def test_interpolates_nodes_exactly(self):
        import numpy as np

        from georeader_spark.kernels.delaunay import ct_interpolate

        pts, rng = self._pts()
        vals = rng.normal(0, 1, len(pts))
        got = ct_interpolate(pts, vals, pts[:, 0], pts[:, 1])
        assert np.abs(got - vals).max() == 0.0

    def test_linear_reproduction_estimated_gradients(self):
        import numpy as np

        from georeader_spark.kernels.delaunay import ct_interpolate

        pts, rng = self._pts()
        q = rng.uniform(1, 9, (400, 2))
        f = lambda p: 1.0 + 3.0 * p[:, 0] - 2.0 * p[:, 1]
        got = ct_interpolate(pts, f(pts), q[:, 0], q[:, 1])
        assert np.nanmax(np.abs(got - f(q))) < 1e-10

    def test_quadratic_reproduction_exact_gradients(self):
        """The reduced-HCT element reproduces quadratics given exact
        gradients — this uniquely pins every ordinate formula."""
        import numpy as np

        from georeader_spark.kernels.delaunay import ct_interpolate

        pts, rng = self._pts()
        q = rng.uniform(1, 9, (400, 2))

        def f(p):
            return (2.0 + 0.5 * p[:, 0] - 1.2 * p[:, 1] + 0.3 * p[:, 0] ** 2
                    - 0.2 * p[:, 0] * p[:, 1] + 0.15 * p[:, 1] ** 2)

        def g(p):
            import numpy as np

            return np.column_stack([
                0.5 + 0.6 * p[:, 0] - 0.2 * p[:, 1],
                -1.2 - 0.2 * p[:, 0] + 0.3 * p[:, 1],
            ])

        got = ct_interpolate(pts, f(pts), q[:, 0], q[:, 1], gradients=g(pts))
        assert np.nanmax(np.abs(got - f(q))) < 1e-10

    def test_c1_across_shared_edge(self):
        """One-sided normal derivatives agree across a macro edge and
        across internal micro edges; the mismatch must shrink as O(h^2)
        (finite-difference truncation, not a derivative jump)."""
        import numpy as np

        from georeader_spark.kernels.delaunay import ct_interpolate

        pts = np.array([[0.0, 0.0], [1.0, 0.2], [0.4, 1.0], [0.6, -1.0]])
        rng = np.random.default_rng(1)
        vals = rng.normal(0, 1, 4)
        grads = rng.normal(0, 1, (4, 2))

        def F(p):
            return ct_interpolate(pts, vals, np.array([p[0]]),
                                  np.array([p[1]]), gradients=grads)[0]

        e = pts[1] - pts[0]
        e = e / np.linalg.norm(e)
        n = np.array([-e[1], e[0]])
        jumps = {}
        for h in (1e-3, 1e-4):
            worst = 0.0
            for lam in (0.2, 0.5, 0.8):
                m = pts[0] * (1 - lam) + pts[1] * lam
                dp = (-3 * F(m) + 4 * F(m + h * n) - F(m + 2 * h * n)) / (2 * h)
                dm = (-3 * F(m) + 4 * F(m - h * n) - F(m - 2 * h * n)) / (2 * h)
                worst = max(worst, abs(dp + dm))
            jumps[h] = worst
        assert jumps[1e-3] < 1e-3
        assert jumps[1e-4] < jumps[1e-3] / 50.0  # ~O(h^2) decay

    def test_smoother_than_linear_on_smooth_field(self):
        import numpy as np

        from georeader_spark.kernels.delaunay import (ct_interpolate,
                                                      linear_interpolate)

        pts, rng = self._pts(n=120, seed=11)
        q = rng.uniform(2, 8, (500, 2))
        f = lambda p: np.sin(p[:, 0] / 2.0) * np.cos(p[:, 1] / 3.0)
        lin = linear_interpolate(pts, f(pts), q[:, 0], q[:, 1])
        cub = ct_interpolate(pts, f(pts), q[:, 0], q[:, 1])
        rmse = lambda a: float(np.sqrt(np.nanmean((a - f(q)) ** 2)))
        assert rmse(cub) < rmse(lin)


class TestGriddataCubicOperator:
    def test_tiled_equals_single_tile(self, spark):
        """Tile-blocked CT == whole-grid CT when the margin covers the
        local triangulation (same guarantee as method='linear')."""
        import math

        import numpy as np

        from georeader_spark.kernels.affine import Affine
        from georeader_spark.operators.reproject import griddata_interpolate

        rng = np.random.default_rng(8)
        x = rng.uniform(0.0, 40.0, 400)
        y = rng.uniform(0.0, 40.0, 400)
        v = np.sin(x / 7.0) * np.cos(y / 9.0) + 0.05 * x
        t = Affine.from_origin(0.0, 40.0, 1.0, 1.0)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)],
            "x double, y double, value double",
        )
        big = griddata_interpolate(df, t, (40, 40), method="cubic", tile=64,
                                   margin_px=64,
                                   gradient_radius=8.0).toPandas()
        small = griddata_interpolate(df, t, (40, 40), method="cubic", tile=16,
                                     margin_px=24,
                                     gradient_radius=8.0).toPandas()
        bg = {(r.row, r.col): r.value for r in big.itertuples()}
        sg = {(r.row, r.col): r.value for r in small.itertuples()}
        n_real = 0
        for k, bv in bg.items():
            sv = sg[k]
            if math.isnan(bv) and math.isnan(sv):
                continue
            n_real += 1
            assert abs(bv - sv) <= 1e-6, (k, bv, sv)
        assert n_real > 1000  # non-vacuous: most of the grid interpolated

    def test_kernel_golden_through_operator(self, spark):
        """Operator output == direct kernel evaluation on the same
        points (single tile, so the gather is the identity)."""
        import numpy as np

        from georeader_spark.kernels.affine import Affine
        from georeader_spark.kernels.delaunay import ct_interpolate
        from georeader_spark.operators.reproject import griddata_interpolate

        rng = np.random.default_rng(3)
        x = rng.uniform(0.0, 40.0, 200)
        y = rng.uniform(0.0, 40.0, 200)
        v = 0.1 * x * x - 0.05 * x * y + np.cos(y / 4.0)
        t = Affine.from_origin(0.0, 40.0, 1.0, 1.0)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, v)],
            "x double, y double, value double",
        )
        got = (
            griddata_interpolate(df, t, (40, 40), method="cubic", tile=64,
                                 margin_px=64)
            .toPandas().sort_values(["row", "col"])["value"].to_numpy()
            .reshape(40, 40)
        )
        rr, cc = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
        gx = (cc + 0.5) * 1.0
        gy = 40.0 + (rr + 0.5) * -1.0
        want = ct_interpolate(np.column_stack([x, y]), v, gx.ravel(),
                              gy.ravel()).reshape(40, 40)
        both = ~(np.isnan(got) | np.isnan(want))
        assert np.isnan(got).sum() == np.isnan(want).sum()
        assert np.abs(got[both] - want[both]).max() < 1e-9
