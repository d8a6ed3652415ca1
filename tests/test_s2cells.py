"""S2-style cell index property tests (kernels/s2cells).

No s2 library exists in this sandbox, so the tests pin the properties
the engine relies on rather than id-for-id parity: cube-face
round-trips, hierarchy nesting, subtree-contiguous ranges, Hilbert
adjacency (consecutive curve cells share an edge), and cover
conservativeness.
"""

import numpy as np
import pytest

from georeader_spark.kernels import s2cells as s2
from georeader_spark.kernels.s2cells import (
    MAX_LEVEL, cell_center, cell_id, cell_id_np, cell_level, children,
    contains, cover_bbox, parent, range_max, range_min,
)

rng = np.random.default_rng(99)
LON = rng.uniform(-180, 180, 500)
LAT = rng.uniform(-89.9, 89.9, 500)


class TestProjection:
    def test_face_uv_roundtrip(self):
        face, u, v = s2._face_uv(LON, LAT)
        assert set(np.unique(face)) <= set(range(6))
        x, y, z = s2._uv_to_xyz(face, u, v)
        n = np.sqrt(x * x + y * y + z * z)
        lon2 = np.degrees(np.arctan2(y, x))
        lat2 = np.degrees(np.arctan2(z, np.hypot(x, y)))
        np.testing.assert_allclose(lat2, LAT, atol=1e-9)
        dl = (lon2 - LON + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(dl, 0.0, atol=1e-9)

    def test_all_faces_hit(self):
        # poles, equator axes
        pts = [(0, 0, 0), (90, 0, 1), (180, 0, 3), (-90, 0, 4),
               (0, 89.9, 2), (0, -89.9, 5)]
        for lon, lat, want in pts:
            face, _, _ = s2._face_uv(np.float64(lon), np.float64(lat))
            assert int(face) == want, (lon, lat)

    def test_st_transform_inverse(self):
        u = rng.uniform(-1, 1, 1000)
        np.testing.assert_allclose(s2._uv_from_st(s2._st_from_uv(u)), u,
                                   atol=1e-12)


class TestHilbert:
    def test_bijective_small(self):
        level = 5
        n = 1 << level
        ii, jj = np.meshgrid(np.arange(n), np.arange(n))
        d = s2._xy_to_hilbert(ii.ravel(), jj.ravel(), level)
        assert len(np.unique(d)) == n * n
        i2, j2 = s2._hilbert_to_xy(d, level)
        np.testing.assert_array_equal(i2, ii.ravel())
        np.testing.assert_array_equal(j2, jj.ravel())

    def test_adjacency(self):
        # consecutive curve positions are edge-neighbors (|di|+|dj|=1)
        level = 6
        d = np.arange(4 ** level)
        i, j = s2._hilbert_to_xy(d, level)
        step = np.abs(np.diff(i)) + np.abs(np.diff(j))
        np.testing.assert_array_equal(step, np.ones(len(d) - 1))

    def test_full_depth_roundtrip(self):
        i = rng.integers(0, s2._N, 200)
        j = rng.integers(0, s2._N, 200)
        d = s2._xy_to_hilbert(i, j)
        i2, j2 = s2._hilbert_to_xy(d)
        np.testing.assert_array_equal(i2, i)
        np.testing.assert_array_equal(j2, j)


class TestIds:
    def test_positive_int64_and_level(self):
        for level in (0, 1, 7, 12, MAX_LEVEL):
            ids = cell_id_np(LON, LAT, level)
            assert ids.dtype == np.int64 and (ids > 0).all()
            assert all(cell_level(int(c)) == level for c in ids[:20])

    def test_parent_child_nesting(self):
        for level in (3, 9, 15):
            c = cell_id(5.3, 47.2, level)
            p = parent(c)
            assert cell_level(p) == level - 1
            assert contains(p, c)
            kids = children(p)
            assert c in kids
            # children partition the parent's range contiguously
            los = sorted(int(range_min(k)) for k in kids)
            his = sorted(int(range_max(k)) for k in kids)
            assert los[0] == int(range_min(p))
            assert his[-1] == int(range_max(p))
            # leaf ids are odd -> sibling ranges sit exactly 2 apart
            for a, b in zip(his[:-1], los[1:]):
                assert b == a + 2

    def test_subtree_range_is_contiguous(self):
        # every descendant leaf id of a cell lies in [rmin, rmax], and
        # points outside the cell do not
        c = cell_id(5.3, 47.2, 8)
        lon = rng.uniform(5.29, 5.31, 300)
        lat = rng.uniform(47.19, 47.21, 300)
        leaves = cell_id_np(lon, lat, MAX_LEVEL)
        inside = contains(c, leaves)
        same_cell = cell_id_np(lon, lat, 8) == c
        np.testing.assert_array_equal(inside, same_cell)

    def test_ancestor_chain_via_ranges(self):
        c = cell_id(-58.4, -34.6, MAX_LEVEL)
        for level in range(MAX_LEVEL):
            a = parent(c, level)
            assert contains(a, c)
            assert cell_id(-58.4, -34.6, level) == a

    def test_center_roundtrip(self):
        for level in (4, 10, 16, 24):
            c = cell_id(139.7, 35.7, level)
            lon, lat = cell_center(c)
            assert cell_id(lon, lat, level) == c


class TestCover:
    def test_cover_conservative_and_merged(self):
        bbox = (5.0, 45.0, 9.0, 48.0)
        ranges = cover_bbox(*bbox, level=8)
        assert ranges == sorted(ranges)
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert lo2 > hi1 + 2  # merged: no adjacent/overlapping
        lon = rng.uniform(bbox[0], bbox[2], 500)
        lat = rng.uniform(bbox[1], bbox[3], 500)
        leaves = cell_id_np(lon, lat, MAX_LEVEL)
        ok = np.zeros(len(leaves), bool)
        for lo, hi in ranges:
            ok |= (leaves >= lo) & (leaves <= hi)
        assert ok.all()

    def test_cover_prunes(self):
        # a far-away point falls outside every range
        ranges = cover_bbox(5.0, 45.0, 9.0, 48.0, level=8)
        far = int(cell_id(139.7, 35.7, MAX_LEVEL))
        assert not any(lo <= far <= hi for lo, hi in ranges)


class TestSparkRangeScan:
    def test_s2_range_pruning(self, spark, tmp_path):
        """The 100 TB story: leaf ids stored + range-partition-sorted
        -> a bbox cover's BETWEEN predicates reach the parquet scan as
        pushed filters (file/row-group min-max pruning), and the
        prefilter+refine result equals the direct bbox filter."""
        import pandas as pdl
        from pyspark.sql import functions as F

        rng2 = np.random.default_rng(5)
        lon = rng2.uniform(-20, 30, 20000)
        lat = rng2.uniform(30, 65, 20000)
        ids = cell_id_np(lon, lat, MAX_LEVEL)
        pdf = pdl.DataFrame({"lon": lon, "lat": lat, "s2": ids})
        path = str(tmp_path / "s2pts.parquet")
        (spark.createDataFrame(pdf)
         .repartitionByRange(8, "s2").sortWithinPartitions("s2")
         .write.parquet(path))

        pts = spark.read.parquet(path)
        bbox = (2.0, 44.0, 9.0, 52.0)
        ranges = cover_bbox(*bbox, level=7)
        pred = None
        for lo, hi in ranges:
            leg = F.col("s2").between(F.lit(lo), F.lit(hi))
            pred = leg if pred is None else (pred | leg)
        pre = pts.where(pred)
        plan = pre._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "s2" in plan

        refined = pre.where(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3]))
        direct = pts.where(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3]))
        n_direct = direct.count()
        assert refined.count() == n_direct > 0
        # the prefilter alone already drops most of the table (the
        # pruning benefit), while remaining a superset of the bbox
        n_pre = pre.count()
        assert n_direct <= n_pre < 20000 * 0.5


class TestCoverCompleteness:
    """cover_bbox must never miss a cell containing an in-bbox point —
    a miss makes the range prefilter silently drop rows. Round-4 fix:
    exact cross-face neighbor expansion (a pure density raise missed
    sliver cells where the bbox crosses a cube-face edge)."""

    def _check(self, level, lon0, lat0, dlon, dlat, rng):
        import numpy as np

        from georeader_spark.kernels.s2cells import cell_id_np, cover_bbox

        ranges = cover_bbox(lon0, lat0, lon0 + dlon, lat0 + dlat, level)
        pl = rng.uniform(lon0, lon0 + dlon, 300)
        pa = rng.uniform(lat0, lat0 + dlat, 300)
        ids = cell_id_np(pl, pa, 29)
        los = np.array([r[0] for r in ranges])
        his = np.array([r[1] for r in ranges])
        inr = ((ids[:, None] >= los[None, :])
               & (ids[:, None] <= his[None, :])).any(axis=1)
        assert inr.all(), (level, lon0, lat0, dlon, dlat)

    def test_known_face_crossing_miss(self):
        """The exact fuzz counterexample that motivated the fix: a bbox
        straddling the +y/-z face edge at level 4."""
        import numpy as np

        rng = np.random.default_rng(3)
        self._check(4, 123.01085428439717, -45.13005209680841,
                    7.123158900925082, 7.901011552910407, rng)

    def test_random_and_face_edge_biased_covers(self):
        import numpy as np

        rng = np.random.default_rng(11)
        for _ in range(12):
            self._check(int(rng.integers(3, 9)),
                        float(rng.uniform(-175, 170)),
                        float(rng.uniform(-85, 80)),
                        float(rng.uniform(0.1, 4)),
                        float(rng.uniform(0.1, 4)), rng)
        # cube-face edge bands (lat ~±35.26 and lon multiples of 45)
        for _ in range(12):
            lon0 = float(rng.choice([-135, -90, -45, 0, 45, 90, 135])
                         + rng.uniform(-2, 0.5))
            lat0 = float(rng.choice([-35.3, 35.3, -45, 45])
                         + rng.uniform(-2, 0.5))
            self._check(int(rng.integers(3, 9)), lon0, lat0,
                        float(rng.uniform(0.5, 3)),
                        float(rng.uniform(0.5, 3)), rng)

    def test_too_fine_level_raises(self):
        import pytest as _pytest

        from georeader_spark.kernels.s2cells import cover_bbox

        with _pytest.raises(ValueError, match="coarser level"):
            cover_bbox(-10, -10, 10, 10, 16)
