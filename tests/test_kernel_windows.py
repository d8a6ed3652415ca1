"""Window-algebra exactness tests.

Ports the assertion *values* of the reference's window tests
(/root/reference/tests/test_window_utils.py, and the worked examples in
window_utils.py docstrings) against our pure-numpy kernels — the
"smallest testable unit" of SURVEY.md §7.1 step 1.
"""

import numpy as np
import pytest

from georeader_spark.kernels.affine import Affine, res, transform_to_resolution_dst
from georeader_spark.kernels.slices import create_slices, create_windows, slices_1d
from georeader_spark.kernels.windows import (
    Window,
    figure_out_transform,
    get_slice_pad,
    normalize_bounds,
    pad_window,
    pad_window_to_size,
    round_outer_window,
    round_outer_window_np,
    slice_save_for_pred,
    window_bounds,
    window_from_bounds,
    window_from_bounds_np,
    window_from_center_coords,
    window_from_polygon_coords,
    window_polygon,
    window_transform,
)


class TestAffine:
    def test_apply_and_invert(self):
        t = Affine.from_origin(537430, 7844180, 10, 10)
        assert t * (0, 0) == (537430.0, 7844180.0)
        assert t * (10, 5) == (537530.0, 7844130.0)
        assert (~t) * (t * (10, 5)) == pytest.approx((10.0, 5.0))

    def test_res_north_up(self):
        assert res(Affine(10, 0, 0, 0, -10, 1000)) == (10.0, 10.0)

    def test_res_rotated(self):
        import math

        ang = math.radians(30)
        t = Affine(
            10 * math.cos(ang), 10 * math.sin(ang), 0,
            -10 * math.sin(ang), -10 * math.cos(ang), 1000,
        )
        rx, ry = res(t)
        assert rx == pytest.approx(10.0)
        assert ry == pytest.approx(10.0)

    def test_compose(self):
        t = Affine.from_origin(0, 100, 1, 1)
        t2 = t * Affine.scale(2, 2)
        assert res(t2) == (2.0, 2.0)
        assert t2 * (0, 0) == (0.0, 100.0)

    def test_transform_to_resolution_dst(self):
        t10 = Affine(10.0, 0.0, 500000, 0.0, -10.0, 4500000)
        t30 = transform_to_resolution_dst(t10, 30.0)
        assert res(t30) == (30.0, 30.0)
        assert t30 * (0, 0) == (500000.0, 4500000.0)
        taniso = transform_to_resolution_dst(t10, (20.0, 40.0))
        assert res(taniso) == (20.0, 40.0)


class TestRoundOuterWindow:
    # worked examples from window_utils.py:560-572
    def test_basic(self):
        assert round_outer_window(Window(10.3, 20.7, 100.5, 50.2)) == Window(10, 20, 101, 51)

    def test_precision_snap(self):
        assert round_outer_window(Window(5.0000001, 10.9999999, 20.0, 30.0)) == Window(5, 11, 20, 30)

    def test_precision_keeps_real_fraction(self):
        # 3.001 is NOT snapped at precision 3 -> floor 3 / end ceil
        w = round_outer_window(Window(3.001, 0.0, 10.0, 10.0))
        assert w == Window(3, 0, 11, 10)

    def test_already_integral(self):
        assert round_outer_window(Window(5, 7, 20, 30)) == Window(5, 7, 20, 30)

    def test_np_matches_scalar(self):
        rng = np.random.default_rng(42)
        co = rng.uniform(-50, 50, 500)
        ro = rng.uniform(-50, 50, 500)
        w = rng.uniform(0.1, 300, 500)
        h = rng.uniform(0.1, 300, 500)
        c2, r2, w2, h2 = round_outer_window_np(co, ro, w, h)
        for i in range(500):
            exp = round_outer_window(Window(co[i], ro[i], w[i], h[i]))
            assert (c2[i], r2[i], w2[i], h2[i]) == exp.to_tuple()


class TestPadWindows:
    def test_pad_window(self):
        assert pad_window(Window(10, 20, 100, 50), (5, 10)) == Window(0, 15, 120, 60)
        assert pad_window(Window(128, 256, 256, 256), (32, 32)) == Window(96, 224, 320, 320)

    def test_pad_window_to_size_expand(self):
        assert pad_window_to_size(Window(500, 500, 100, 100), (256, 256)) == Window(422, 422, 256, 256)

    def test_pad_window_to_size_crop(self):
        assert pad_window_to_size(Window(0, 0, 1000, 800), (512, 512)) == Window(244, 144, 512, 512)

    def test_pad_window_to_size_mixed(self):
        assert pad_window_to_size(Window(100, 100, 80, 120), (100, 100)) == Window(90, 110, 100, 100)


class TestGetSlicePad:
    # worked examples from window_utils.py:649-694
    def test_inside(self):
        s, p = get_slice_pad(Window(0, 0, 1000, 1000), Window(100, 100, 200, 200))
        assert s == {"x": slice(100, 300), "y": slice(100, 300)}
        assert p == {"x": (0, 0), "y": (0, 0)}

    def test_top_left(self):
        s, p = get_slice_pad(Window(0, 0, 1000, 1000), Window(-50, -30, 200, 200))
        assert s == {"x": slice(0, 150), "y": slice(0, 170)}
        assert p == {"x": (50, 0), "y": (30, 0)}

    def test_bottom_right(self):
        s, p = get_slice_pad(Window(0, 0, 1000, 1000), Window(900, 850, 200, 200))
        assert s == {"x": slice(900, 1000), "y": slice(850, 1000)}
        assert p == {"x": (0, 100), "y": (0, 50)}

    def test_all_sides(self):
        s, p = get_slice_pad(Window(0, 0, 1000, 1000), Window(-10, -20, 1050, 1080))
        assert s == {"x": slice(0, 1000), "y": slice(0, 1000)}
        assert p == {"x": (10, 40), "y": (20, 60)}

    def test_disjoint_raises(self):
        with pytest.raises(ValueError):
            get_slice_pad(Window(0, 0, 100, 100), Window(200, 200, 10, 10))

    def test_shape_invariant(self):
        rng = np.random.default_rng(7)
        data = Window(0, 0, 500, 400)
        for _ in range(200):
            wr = Window(
                int(rng.integers(-100, 450)), int(rng.integers(-100, 380)),
                int(rng.integers(1, 200)), int(rng.integers(1, 200)),
            )
            if not data.intersects(wr):
                continue
            s, p = get_slice_pad(data, wr)
            w_out = (s["x"].stop - s["x"].start) + p["x"][0] + p["x"][1]
            h_out = (s["y"].stop - s["y"].start) + p["y"][0] + p["y"][1]
            assert (w_out, h_out) == (wr.width, wr.height)


class TestWindowGeoMath:
    def test_window_bounds_north_up(self):
        t = Affine.from_origin(0, 100, 1, 1)
        b = window_bounds(Window(10, 20, 30, 40), t)
        assert b == (10.0, 40.0, 40.0, 80.0)

    def test_window_polygon_closed(self):
        t = Affine.from_origin(0, 100, 1, 1)
        poly = window_polygon(Window(0, 0, 10, 10), t)
        assert poly[0] == poly[-1]
        assert (0.0, 100.0) in poly and (10.0, 90.0) in poly

    def test_window_from_bounds_roundtrip(self):
        t = Affine.from_origin(537430, 7844180, 10, 10)
        w0 = Window(12, 34, 56, 78)
        b = window_bounds(w0, t)
        w1 = round_outer_window(window_from_bounds(t, b))
        assert w1 == w0

    def test_window_from_bounds_np_matches_scalar(self):
        t = Affine.from_origin(0, 1000, 2.5, 2.5)
        rng = np.random.default_rng(3)
        xmin = rng.uniform(-100, 800, 300)
        xmax = xmin + rng.uniform(1, 500, 300)
        ymin = rng.uniform(-100, 800, 300)
        ymax = ymin + rng.uniform(1, 500, 300)
        co, ro, w, h = window_from_bounds_np(t, xmin, ymin, xmax, ymax)
        for i in range(300):
            exp = window_from_bounds(t, (xmin[i], ymin[i], xmax[i], ymax[i]))
            assert co[i] == pytest.approx(exp.col_off)
            assert ro[i] == pytest.approx(exp.row_off)
            assert w[i] == pytest.approx(exp.width)
            assert h[i] == pytest.approx(exp.height)

    def test_window_from_center_coords(self):
        t = Affine.from_origin(0, 100, 1, 1)
        w = window_from_center_coords(t, (50.0, 50.0), (10, 10))
        # center pixel (50, 50) -> ul (45, 45)
        assert w == Window(45, 45, 10, 10)

    def test_window_from_polygon_coords(self):
        t = Affine.from_origin(0, 100, 1, 1)
        coords = np.array([[10.0, 90.0], [20.0, 90.0], [20.0, 80.0], [10.0, 80.0]])
        w = window_from_polygon_coords(t, coords)
        assert round_outer_window(w) == Window(10, 10, 10, 10)
        w1 = window_from_polygon_coords(t, coords, window_surrounding=True)
        assert round_outer_window(w1) == Window(10, 10, 11, 11)

    def test_window_transform(self):
        t = Affine.from_origin(0, 100, 1, 1)
        t2 = window_transform(Window(10, 20, 5, 5), t)
        assert t2 * (0, 0) == (10.0, 80.0)

    def test_normalize_bounds(self):
        assert normalize_bounds((10, 5, 0, 20)) == (0, 5, 10, 20)
        b = normalize_bounds((5, 5, 5, 20))
        assert b[0] == pytest.approx(4.9995) and b[2] == pytest.approx(5.0005)

    def test_figure_out_transform_from_bounds_res(self):
        t = figure_out_transform(bounds=(0, 0, 100, 100), resolution_dst=10)
        assert t.to_tuple() == (10.0, 0.0, 0.0, 0.0, -10.0, 100.0)

    def test_figure_out_transform_rescale(self):
        t = Affine.from_origin(0, 100, 1, 1)
        t2 = figure_out_transform(transform=t, resolution_dst=2)
        assert res(t2) == (2.0, 2.0)

    def test_figure_out_transform_snap_to_bounds(self):
        t = Affine.from_origin(0, 100, 1, 1)
        t2 = figure_out_transform(transform=t, bounds=(10.3, 20.0, 50.0, 80.6))
        # origin snaps onto the source pixel lattice covering the bounds
        assert t2 * (0, 0) == (10.0, 81.0)

    def test_slice_save_for_pred(self):
        # 256-tile read with 32 halo at the image corner
        s, write = slice_save_for_pred(Window(-32, -32, 320, 320), Window(0, 0, 1000, 1000))
        assert s == {"x": slice(32, 320), "y": slice(32, 320)}
        assert write == Window(0, 0, 288, 288)


class TestSlices:
    def test_basic(self):
        assert slices_1d(1000, 256, 0) == [(0, 256), (256, 512), (512, 768), (768, 1024)]

    def test_overlap(self):
        assert slices_1d(1000, 256, 32) == [(0, 256), (224, 480), (448, 704), (672, 928), (896, 1152)]

    def test_exclude_incomplete(self):
        assert slices_1d(1000, 256, 0, include_incomplete=False) == [(0, 256), (256, 512), (512, 768)]

    def test_trim(self):
        assert slices_1d(1000, 256, 0, trim_incomplete=True)[-1] == (768, 1000)

    def test_negative_start(self):
        assert slices_1d(100, 64, 16, start_negative_if_padding=True) == [(-8, 56), (40, 104), (88, 152)]

    def test_small_dim(self):
        assert slices_1d(100, 256, 0) == [(0, 256)]
        assert slices_1d(100, 256, 0, trim_incomplete=True) == [(0, 100)]

    def test_create_slices_cartesian(self):
        tiles = create_slices({"x": 500, "y": 400}, {"x": 256, "y": 256})
        assert len(tiles) == 4
        assert tiles[0] == {"x": (0, 256), "y": (0, 256)}

    def test_create_windows_count(self):
        ws = create_windows((1000, 1200), (256, 256))
        assert len(ws) == 20
        assert ws[0] == Window(0, 0, 256, 256)
        # trim_incomplete=True default: edge tiles trimmed
        assert all(w.col_off + w.width <= 1200 and w.row_off + w.height <= 1000 for w in ws)

    def test_create_windows_cover_exactly(self):
        ws = create_windows((1000, 1200), (256, 256))
        cover = np.zeros((1000, 1200), dtype=np.int32)
        for w in ws:
            cover[w.row_off : w.row_off + w.height, w.col_off : w.col_off + w.width] += 1
        assert (cover == 1).all()  # no gaps, no overlaps at overlap=0
