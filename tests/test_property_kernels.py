"""Property-based tests (hypothesis) over the window/cell kernels —
the invariants the distributed operators rely on."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georeader_spark.kernels import cells
from georeader_spark.kernels.affine import Affine, res
from georeader_spark.kernels.windows import (
    Window,
    get_slice_pad,
    pad_window,
    pad_window_to_size,
    round_outer_window,
    window_bounds,
    window_from_bounds,
)

coord = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)
size_f = st.floats(1e-3, 1e5, allow_nan=False, allow_infinity=False)


class TestWindowProperties:
    @given(coord, coord, size_f, size_f)
    @settings(max_examples=200, deadline=None)
    def test_round_outer_contains_original(self, co, ro, w, h):
        win = Window(co, ro, w, h)
        r = round_outer_window(win)
        eps = 1.5e-3  # PIXEL_PRECISION snap may pull in up to 5e-4 + fp
        assert r.col_off <= co + eps
        assert r.row_off <= ro + eps
        assert r.col_end >= win.col_end - eps
        assert r.row_end >= win.row_end - eps
        assert isinstance(r.col_off, int) and isinstance(r.width, int)

    @given(st.integers(-500, 500), st.integers(-500, 500),
           st.integers(1, 400), st.integers(1, 400),
           st.integers(0, 50), st.integers(0, 50))
    @settings(max_examples=200, deadline=None)
    def test_pad_window_roundtrip(self, co, ro, w, h, pr, pc):
        win = Window(co, ro, w, h)
        padded = pad_window(win, (pr, pc))
        assert padded.width == w + 2 * pc
        assert padded.height == h + 2 * pr
        # center preserved
        assert padded.col_off + padded.width / 2 == co + w / 2
        assert padded.row_off + padded.height / 2 == ro + h / 2

    @given(st.integers(-500, 500), st.integers(-500, 500),
           st.integers(1, 400), st.integers(1, 400),
           st.integers(1, 512), st.integers(1, 512))
    @settings(max_examples=200, deadline=None)
    def test_pad_to_size_exact(self, co, ro, w, h, th, tw):
        out = pad_window_to_size(Window(co, ro, w, h), (th, tw))
        assert (out.height, out.width) == (th, tw)

    @given(st.integers(-200, 900), st.integers(-200, 900),
           st.integers(1, 400), st.integers(1, 400))
    @settings(max_examples=300, deadline=None)
    def test_slice_pad_shape_invariant(self, co, ro, w, h):
        data = Window(0, 0, 1000, 800)
        read = Window(co, ro, w, h)
        if not data.intersects(read):
            return
        sl, pad = get_slice_pad(data, read)
        out_w = (sl["x"].stop - sl["x"].start) + pad["x"][0] + pad["x"][1]
        out_h = (sl["y"].stop - sl["y"].start) + pad["y"][0] + pad["y"][1]
        assert (out_w, out_h) == (w, h)
        assert sl["x"].start >= 0 and sl["x"].stop <= 1000
        assert sl["y"].start >= 0 and sl["y"].stop <= 800

    @given(st.integers(-1000, 1000), st.integers(-1000, 1000),
           st.integers(1, 500), st.integers(1, 500))
    @settings(max_examples=200, deadline=None)
    def test_window_bounds_roundtrip(self, co, ro, w, h):
        t = Affine.from_origin(537430, 7844180, 10, 10)
        win = Window(co, ro, w, h)
        b = window_bounds(win, t)
        back = round_outer_window(window_from_bounds(t, b))
        assert back == win


class TestCellProperties:
    lon = st.floats(-179.999, 179.999, allow_nan=False)
    lat = st.floats(-89.999, 89.999, allow_nan=False)
    r = st.integers(0, 20)

    @given(lon, lat, r)
    @settings(max_examples=300, deadline=None)
    def test_point_inside_own_cell(self, lon, lat, r):
        # Containment holds up to one float-rounding step: encode() is
        # deliberately the pure IEEE formula (bit-identical to the SQL
        # oracle twin), so a point within ~ulp(180) of a cell edge may
        # land on the neighbouring cell (e.g. lon=-1.4e-45: lon+180.0
        # rounds to 180.0 exactly). 1e-9 >> that rounding (≈1.4e-14) and
        # << the finest cell width tested (360/2**21 ≈ 1.7e-4).
        c = cells.encode(lon, lat, r)
        b = cells.cell_bounds(c)
        assert b[0] - 1e-9 <= lon <= b[2] + 1e-9
        assert b[1] - 1e-9 <= lat <= b[3] + 1e-9

    @given(lon, lat, st.integers(1, 20))
    @settings(max_examples=300, deadline=None)
    def test_parent_consistency(self, lon, lat, r):
        c = cells.encode(lon, lat, r)
        p = cells.parent(c)
        # parent computed structurally == parent computed by re-encoding
        assert p == cells.encode(*cells.cell_center(c), r - 1) or \
            cells.decode(p)[0] == r - 1
        # the point's own parent-resolution cell equals parent(cell)
        assert cells.encode(lon, lat, r - 1) == p

    @given(lon, lat, st.integers(0, 12), st.integers(1, 3))
    @settings(max_examples=200, deadline=None)
    def test_ring_contains_center_and_is_unique(self, lon, lat, r, k):
        c = cells.encode(lon, lat, r)
        ring = cells.ring(c, k)
        assert c in ring
        assert len(ring) == len(set(ring))
        assert len(ring) <= (2 * k + 1) ** 2

    @given(lon, lat)
    @settings(max_examples=200, deadline=None)
    def test_encode_np_matches_scalar(self, lon, lat):
        v = cells.encode_np(np.array([lon]), np.array([lat]), 9)
        assert int(v[0]) == cells.encode(lon, lat, 9)


class TestAffineProperties:
    @given(coord, coord, size_f, size_f, coord, coord)
    @settings(max_examples=200, deadline=None)
    def test_invert_roundtrip(self, c, f, a, e, x, y):
        t = Affine(a, 0, c, 0, -e, f)
        px = (~t) * (t * (x, y))
        assert math.isclose(px[0], x, rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(px[1], y, rel_tol=1e-9, abs_tol=1e-6)

    @given(size_f, size_f)
    @settings(max_examples=100, deadline=None)
    def test_res_positive(self, a, e):
        t = Affine(a, 0, 0, 0, -e, 0)
        rx, ry = res(t)
        assert rx > 0 and ry > 0
        assert math.isclose(rx, a, rel_tol=1e-12)
        assert math.isclose(ry, e, rel_tol=1e-12)


class TestKeysKernelProperties:
    """Invariants of the bicubic (Keys a=-0.5) tap weights the
    distributed warp relies on (operators/reproject._keys_weights)."""

    @given(st.floats(0.0, 1.0, allow_nan=False))
    @settings(max_examples=300, deadline=None)
    def test_partition_of_unity(self, t):
        from georeader_spark.operators.reproject import _keys_weights

        ws = _keys_weights(np.asarray([t]))
        assert abs(sum(float(w[0]) for w in ws) - 1.0) < 1e-12

    @given(st.floats(0.0, 1.0, allow_nan=False),
           st.floats(-3.0, 3.0, allow_nan=False),
           st.floats(-2.0, 2.0, allow_nan=False),
           st.floats(-0.5, 0.5, allow_nan=False))
    @settings(max_examples=300, deadline=None)
    def test_quadratic_reproduction_1d(self, t, a, b, c):
        """Σ w_m · q(m) == q(t) for any quadratic q over taps
        m ∈ {-1, 0, 1, 2} — Keys 1981's third-order accuracy, the
        property that makes bicubic resampling exact on quadratic
        fields."""
        from georeader_spark.operators.reproject import _keys_weights

        ws = _keys_weights(np.asarray([t]))

        def q(x):
            return a + b * x + c * x * x

        got = sum(float(w[0]) * q(m) for w, m in zip(ws, (-1, 0, 1, 2)))
        assert abs(got - q(t)) < 1e-9

    @given(st.floats(0.0, 1.0, allow_nan=False))
    @settings(max_examples=200, deadline=None)
    def test_weights_bounded(self, t):
        """Keys a=-0.5 weights stay in [-2/27 - eps, 1 + eps]: the
        kernel's minimum is -2/27 (outer taps at |s| = 4/3), so a warp
        of data in [lo, hi] cannot blow past the known overshoot
        envelope."""
        from georeader_spark.operators.reproject import _keys_weights

        ws = _keys_weights(np.asarray([t]))
        for w in ws:
            assert -2.0 / 27.0 - 1e-12 <= float(w[0]) <= 1.0 + 1e-12
