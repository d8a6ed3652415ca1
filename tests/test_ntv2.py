"""NTv2 grid-shift kernel + ``+nadgrids=`` integration tests.

The reference reaches grid-shift datums through pyproj/PROJ's
installed NTv2 files; here the format, interpolation, subgrid
selection and inverse are implemented from the public spec
(kernels/ntv2.py).  Fixtures are synthesized with write_ntv2 and the
interpolation is checked against closed forms (a bilinear interpolant
reproduces any shift field linear in lat/lon exactly), so the tests
do not merely round-trip the writer through the reader.
"""

import numpy as np
import pytest

from georeader_spark.kernels import ntv2
from georeader_spark.kernels.ntv2 import (
    Ntv2Subgrid, ntv2_forward, ntv2_inverse, read_ntv2, write_ntv2,
)
from georeader_spark.kernels.proj import (
    from_wgs84, parse_proj4, to_wgs84, transform_points,
)

rng = np.random.default_rng(1234)


def linear_grid(name="LINEAR", parent="NONE",
                s_lat=-38.0, n_lat=-34.0, e_lonw=-152.0, w_lonw=-148.0,
                inc_sec=360.0, a=(0.4, 1e-3, -2e-4), b=(-3.0, 5e-4, 8e-4)):
    """Subgrid whose shifts are linear in (lat_sec, lonw_sec):
    dlat = a0 + a1*lat + a2*lonw, dlonw = b0 + b1*lat + b2*lonw —
    bilinear interpolation is exact for this field."""
    s, n = s_lat * 3600.0, n_lat * 3600.0
    e, w = e_lonw * 3600.0, w_lonw * 3600.0
    nlat = int(round((n - s) / inc_sec)) + 1
    nlon = int(round((w - e) / inc_sec)) + 1
    lat = s + np.arange(nlat)[:, None] * inc_sec
    lonw = e + np.arange(nlon)[None, :] * inc_sec
    sh = np.empty((nlat, nlon, 2), np.float32)
    sh[:, :, 0] = a[0] + a[1] * lat + a[2] * lonw
    sh[:, :, 1] = b[0] + b[1] * lat + b[2] * lonw
    return Ntv2Subgrid(name=name, parent=parent, s_lat=s, n_lat=n,
                       e_lon=e, w_lon=w, lat_inc=inc_sec, lon_inc=inc_sec,
                       shifts=sh), a, b


def expected_linear(lon, lat, a, b):
    lat_sec = lat * 3600.0
    lonw_sec = -lon * 3600.0
    dlat = a[0] + a[1] * lat_sec + a[2] * lonw_sec
    dlonw = b[0] + b[1] * lat_sec + b[2] * lonw_sec
    return lon - dlonw / 3600.0, lat + dlat / 3600.0


class TestFormat:
    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_write_read_roundtrip(self, endian):
        g, _, _ = linear_grid()
        child = Ntv2Subgrid(
            name="CHILD", parent="LINEAR",
            s_lat=g.s_lat + g.lat_inc, n_lat=g.s_lat + 5 * g.lat_inc,
            e_lon=g.e_lon + g.lon_inc, w_lon=g.e_lon + 5 * g.lon_inc,
            lat_inc=g.lat_inc / 4, lon_inc=g.lon_inc / 4,
            shifts=np.full((17, 17, 2), 1.25, np.float32))
        data = write_ntv2([g, child], endian=endian)
        back = read_ntv2(data)
        assert [s.name for s in back] == ["LINEAR", "CHILD"]
        for orig, rt in zip([g, child], back):
            assert rt.parent == (orig.parent or "NONE")
            np.testing.assert_allclose(
                [rt.s_lat, rt.n_lat, rt.e_lon, rt.w_lon,
                 rt.lat_inc, rt.lon_inc],
                [orig.s_lat, orig.n_lat, orig.e_lon, orig.w_lon,
                 orig.lat_inc, orig.lon_inc])
            np.testing.assert_array_equal(rt.shifts, orig.shifts)

    def test_malformed_raises(self):
        g, _, _ = linear_grid()
        data = write_ntv2([g])
        with pytest.raises(ValueError, match="NUM_OREC"):
            read_ntv2(b"GARBAGE!" + data[8:])
        with pytest.raises(ValueError, match="shorter"):
            read_ntv2(data[:100])
        bad = Ntv2Subgrid(name="B", parent="NONE", s_lat=0, n_lat=3600,
                          e_lon=0, w_lon=3600, lat_inc=3600, lon_inc=3600,
                          shifts=np.zeros((3, 3, 2), np.float32))
        with pytest.raises(ValueError, match="shape"):
            write_ntv2([bad])


class TestShift:
    def test_sign_conventions(self):
        # constant +3.6" lat shift, +7.2" positive-WEST lon shift:
        # latitude grows by 0.001 deg, east-longitude SHRINKS by 0.002
        g = Ntv2Subgrid(name="CONST", parent="NONE",
                        s_lat=0.0, n_lat=36000.0, e_lon=0.0, w_lon=36000.0,
                        lat_inc=36000.0, lon_inc=36000.0,
                        shifts=np.broadcast_to(
                            np.array([3.6, 7.2], np.float32),
                            (2, 2, 2)).copy())
        lon, lat = ntv2_forward(np.array([-5.0]), np.array([5.0]), [g])
        np.testing.assert_allclose(lat, [5.001], atol=1e-12)
        np.testing.assert_allclose(lon, [-5.002], atol=1e-12)

    def test_bilinear_exact_on_linear_field(self):
        g, a, b = linear_grid()
        lon = rng.uniform(148.2, 151.8, 200)     # east-positive inside
        lat = rng.uniform(-37.8, -34.2, 200)
        got_lon, got_lat = ntv2_forward(lon, lat, [g])
        exp_lon, exp_lat = expected_linear(lon, lat, a, b)
        # float32 node storage bounds the error, not the interpolation
        np.testing.assert_allclose(got_lat, exp_lat, atol=2e-7)
        np.testing.assert_allclose(got_lon, exp_lon, atol=2e-7)
        assert np.max(np.abs(got_lat - lat)) > 1e-5  # it DID shift

    def test_densest_subgrid_wins(self):
        parent = Ntv2Subgrid(
            name="PARENT", parent="NONE",
            s_lat=0.0, n_lat=7200.0, e_lon=0.0, w_lon=7200.0,
            lat_inc=3600.0, lon_inc=3600.0,
            shifts=np.full((3, 3, 2), 10.0, np.float32))
        child = Ntv2Subgrid(
            name="CHILD", parent="PARENT",
            s_lat=0.0, n_lat=3600.0, e_lon=0.0, w_lon=3600.0,
            lat_inc=900.0, lon_inc=900.0,
            shifts=np.full((5, 5, 2), 2.0, np.float32))
        lon = np.array([-0.5, -1.5])   # first inside child, second only parent
        lat = np.array([0.5, 1.5])
        _, got_lat = ntv2_forward(lon, lat, [parent, child])
        np.testing.assert_allclose(got_lat - lat, [2.0 / 3600, 10.0 / 3600],
                                   atol=1e-9)

    def test_outside_passthrough_and_strict(self):
        g, _, _ = linear_grid()
        lon, lat = np.array([10.0]), np.array([10.0])   # far outside
        got_lon, got_lat = ntv2_forward(lon, lat, [g])
        np.testing.assert_array_equal(got_lon, lon)
        np.testing.assert_array_equal(got_lat, lat)
        with pytest.raises(ValueError, match="outside"):
            ntv2_forward(lon, lat, [g], strict=True)

    def test_inverse_roundtrip(self):
        g, _, _ = linear_grid()
        lon = rng.uniform(148.2, 151.8, 100)
        lat = rng.uniform(-37.8, -34.2, 100)
        f_lon, f_lat = ntv2_forward(lon, lat, [g])
        b_lon, b_lat = ntv2_inverse(f_lon, f_lat, [g])
        np.testing.assert_allclose(b_lon, lon, atol=1e-11)
        np.testing.assert_allclose(b_lat, lat, atol=1e-11)


class TestProjIntegration:
    @pytest.fixture()
    def grid_file(self, tmp_path):
        g, a, b = linear_grid()
        path = tmp_path / "shift.gsb"
        path.write_bytes(write_ntv2([g]))
        return str(path), a, b

    def test_longlat_nadgrids(self, grid_file):
        path, a, b = grid_file
        fam, p = parse_proj4(f"+proj=longlat +ellps=clrk66 +nadgrids={path}")
        assert fam == "geographic" and p["nadgrids"] == path
        lon = rng.uniform(148.5, 151.5, 50)
        lat = rng.uniform(-37.5, -34.5, 50)
        got_lon, got_lat = to_wgs84(
            lon, lat, f"+proj=longlat +ellps=clrk66 +nadgrids={path}")
        exp_lon, exp_lat = expected_linear(lon, lat, a, b)
        np.testing.assert_allclose(got_lat, exp_lat, atol=2e-7)
        np.testing.assert_allclose(got_lon, exp_lon, atol=2e-7)
        # inverse direction through from_wgs84
        back_lon, back_lat = from_wgs84(
            got_lon, got_lat,
            f"+proj=longlat +ellps=clrk66 +nadgrids={path}")
        np.testing.assert_allclose(back_lon, lon, atol=1e-9)
        np.testing.assert_allclose(back_lat, lat, atol=1e-9)

    def test_grid_wins_over_towgs84(self, grid_file):
        path, a, b = grid_file
        lon = np.array([150.0]); lat = np.array([-36.0])
        spec = (f"+proj=longlat +ellps=aust_SA +nadgrids={path} "
                "+towgs84=-120,-40,90")
        got_lon, got_lat = to_wgs84(lon, lat, spec)
        exp_lon, exp_lat = expected_linear(lon, lat, a, b)
        np.testing.assert_allclose(got_lat, exp_lat, atol=2e-7)
        np.testing.assert_allclose(got_lon, exp_lon, atol=2e-7)

    def test_optional_chain_and_null(self, grid_file, tmp_path):
        path, a, b = grid_file
        lon = np.array([150.0]); lat = np.array([-36.0])
        # @missing optional entries are skipped; real grid then applies
        chain = f"@{tmp_path}/nope.gsb,{path}"
        got_lon, got_lat = to_wgs84(
            lon, lat, f"+proj=longlat +ellps=clrk66 +nadgrids={chain}")
        exp_lon, exp_lat = expected_linear(lon, lat, a, b)
        np.testing.assert_allclose(got_lat, exp_lat, atol=2e-7)
        # null -> identity
        same = to_wgs84(lon, lat, "+proj=longlat +ellps=clrk66 +nadgrids=null")
        np.testing.assert_array_equal(same[0], lon)
        # required missing grid raises
        with pytest.raises(ValueError, match="cannot load"):
            to_wgs84(lon, lat,
                     f"+proj=longlat +ellps=clrk66 +nadgrids={tmp_path}/no.gsb")

    def test_projected_nadgrids_composition(self, grid_file):
        """UTM(aust_SA)+nadgrids == tm-inverse then grid shift — the
        AGD66 -> GDA94/WGS84 shape; also exercised through
        transform_points to EPSG:4326."""
        path, a, b = grid_file
        spec = f"+proj=utm +zone=56 +south +ellps=aust_SA +nadgrids={path}"
        fam, p = parse_proj4(spec)
        assert fam == "tm" and p["nadgrids"] == path
        # forward-project known geographic points with the plain spec,
        # then transform back to WGS84 with the nadgrids spec
        lon = rng.uniform(150.5, 151.5, 20)
        lat = rng.uniform(-37.0, -35.0, 20)
        x, y = from_wgs84(lon, lat,
                          "+proj=utm +zone=56 +south +ellps=aust_SA "
                          "+nadgrids=null")
        got_lon, got_lat = transform_points(x, y, spec, "EPSG:4326")
        exp_lon, exp_lat = expected_linear(lon, lat, a, b)
        np.testing.assert_allclose(got_lat, exp_lat, atol=3e-7)
        np.testing.assert_allclose(got_lon, exp_lon, atol=3e-7)

    def test_grid_cache(self, grid_file):
        path, _, _ = grid_file
        g1 = ntv2.load_grid(path)
        assert ntv2.load_grid(path) is g1
