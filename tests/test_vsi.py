"""VSI-shaped ranged ingestion: vsi_path parity, range merging, local
and HTTP ByteSources, lazy-header windowed GeoTIFF reads, and the
Spark scan_windows operator."""

import threading
import warnings

import numpy as np
import pytest

from georeader_spark.kernels.affine import Affine
from georeader_spark.kernels.geotiff import decode_geotiff, encode_geotiff
from georeader_spark.sources.vsi import (
    HTTPRangeSource,
    LocalFileSource,
    MemoryByteSource,
    RangedGeoTiff,
    merge_ranges,
    open_byte_source,
    vsi_path,
)


class TestVsiPath:
    """Mapping parity with reference geotensor.py:194-219."""

    def test_http(self):
        assert vsi_path("https://host/a.tif") == "/vsicurl/https://host/a.tif"
        assert vsi_path("http://host/a.tif") == "/vsicurl/http://host/a.tif"

    def test_cloud_schemes(self):
        assert vsi_path("s3://bucket/k.tif") == "/vsis3/bucket/k.tif"
        assert vsi_path("gs://bucket/k.tif") == "/vsigs/bucket/k.tif"
        assert vsi_path("az://c/k.tif") == "/vsiaz/c/k.tif"
        assert vsi_path("oss://b/k.tif") == "/vsioss/b/k.tif"

    def test_local_passthrough(self):
        assert vsi_path("/data/a.tif") == "/data/a.tif"

    def test_unknown_warns_and_passes_through(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert vsi_path("ftp://h/a.tif") == "ftp://h/a.tif"
            assert any("not recognized" in str(x.message) for x in w)


class TestMergeRanges:
    def test_empty(self):
        assert merge_ranges([]) == []

    def test_adjacent_and_gap(self):
        # touching, within-gap, and beyond-gap
        assert merge_ranges([(0, 10), (10, 10)], max_gap=0) == [(0, 20)]
        assert merge_ranges([(0, 10), (14, 10)], max_gap=4) == [(0, 24)]
        assert merge_ranges([(0, 10), (15, 10)], max_gap=4) == [(0, 10), (15, 10)]

    def test_unsorted_and_overlapping(self):
        assert merge_ranges([(50, 10), (0, 10), (55, 20)], max_gap=0) == [
            (0, 10),
            (50, 25),
        ]

    def test_contained(self):
        assert merge_ranges([(0, 100), (10, 5)], max_gap=0) == [(0, 100)]


@pytest.fixture(scope="module")
def tif_file(tmp_path_factory):
    """3-band 200x300 int16 tiled (64px) deflate GeoTIFF with one
    overview, written to disk; returns (path, array, transform)."""
    rng = np.random.default_rng(7)
    arr = rng.integers(-500, 500, size=(3, 200, 300)).astype(np.int16)
    t = Affine(10.0, 0.0, 1000.0, 0.0, -10.0, 5000.0)
    buf = encode_geotiff(arr, t, crs_epsg=32630, tile=64, compress=True,
                         nodata=-999, overview_levels=1)
    p = tmp_path_factory.mktemp("vsi") / "ranged.tif"
    p.write_bytes(buf)
    return str(p), arr, t


class _RangeHTTPServer:
    """Minimal localhost HTTP server honoring Range (what /vsicurl
    assumes of object-store front-ends)."""

    def __init__(self, payload: bytes):
        import http.server

        payload_ref = payload
        counters = {"range_reqs": 0}

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_HEAD(self):
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload_ref)))
                self.send_header("Accept-Ranges", "bytes")
                self.end_headers()

            def do_GET(self):
                rng_h = self.headers.get("Range")
                if rng_h and rng_h.startswith("bytes="):
                    counters["range_reqs"] += 1
                    a, b = rng_h[len("bytes="):].split("-")
                    a, b = int(a), int(b)
                    chunk = payload_ref[a : b + 1]
                    self.send_response(206)
                    self.send_header(
                        "Content-Range", f"bytes {a}-{a+len(chunk)-1}/{len(payload_ref)}"
                    )
                    self.send_header("Content-Length", str(len(chunk)))
                    self.end_headers()
                    self.wfile.write(chunk)
                else:
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(payload_ref)))
                    self.end_headers()
                    self.wfile.write(payload_ref)

        import http.server as hs

        self.httpd = hs.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.counters = counters
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url(self):
        h, p = self.httpd.server_address
        return f"http://{h}:{p}/obj.tif"

    def stop(self):
        self.httpd.shutdown()


class TestRangedGeoTiff:
    def test_local_window_parity_and_byte_savings(self, tif_file):
        path, arr, t = tif_file
        full, _, _, _ = decode_geotiff(open(path, "rb").read())
        src = LocalFileSource(path)
        rd = RangedGeoTiff(src)
        assert rd.shape == (3, 200, 300)
        assert rd.epsg == 32630
        assert rd.nodata == -999
        assert rd.n_overviews == 1
        win = rd.read_window(70, 33, 100, 177)
        np.testing.assert_array_equal(win, full[:, 70:170, 33:210])
        # the point of ranged reads: a ~1/6-of-image window must not
        # fetch the whole file
        assert src.bytes_fetched < src.size() * 0.6
        rd.close()

    def test_boundless_fill_and_clip(self, tif_file):
        path, arr, _ = tif_file
        rd = RangedGeoTiff(LocalFileSource(path))
        win = rd.read_window(-10, -10, 30, 30)
        assert (win[:, :10, :] == -999).all() and (win[:, :, :10] == -999).all()
        np.testing.assert_array_equal(win[:, 10:, 10:], arr[:, :20, :20])
        with pytest.raises(ValueError, match="boundless"):
            rd.read_window(-1, 0, 10, 10, boundless=False)
        # fully-outside window: all fill
        assert (rd.read_window(-50, -50, 20, 20) == -999).all()
        rd.close()

    def test_sparse_tile_reads_as_fill(self, tif_file):
        # COG sparse-tile convention: offset=0, bytecount=0 means the
        # tile was never written; readers return the fill/nodata value
        # and must not issue a byte-range for it.
        from georeader_spark.sources.vsi import (
            _T_TILE_BYTE_COUNTS,
            _T_TILE_OFFSETS,
        )

        path, arr, _ = tif_file
        src = LocalFileSource(path)
        rd = RangedGeoTiff(src)
        tags = rd.ifds[0]
        # band 0 (planar=2), tile row 0 col 0 → flat index 0
        tags[_T_TILE_OFFSETS][0] = 0
        tags[_T_TILE_BYTE_COUNTS][0] = 0
        win = rd.read_window(0, 0, 80, 80)
        assert (win[0, :64, :64] == -999).all()  # sparse → nodata
        np.testing.assert_array_equal(win[0, 64:, :], arr[0, 64:80, :80])
        np.testing.assert_array_equal(win[0, :64, 64:], arr[0, :64, 64:80])
        np.testing.assert_array_equal(win[1:], arr[1:, :80, :80])
        # all-sparse window: zero data tiles fetched is legal
        for k in range(len(tags[_T_TILE_BYTE_COUNTS])):
            tags[_T_TILE_BYTE_COUNTS][k] = 0
        assert (rd.read_window(0, 0, 200, 300) == -999).all()
        rd.close()

    def test_overview_window(self, tif_file):
        path, _, _ = tif_file
        full = decode_geotiff(open(path, "rb").read(), overview=1)[0]
        rd = RangedGeoTiff(LocalFileSource(path))
        win = rd.read_window(10, 20, 40, 50, overview=1)
        np.testing.assert_array_equal(win, full[:, 10:50, 20:70])
        rd.close()

    def test_memory_source(self, tif_file):
        path, arr, _ = tif_file
        buf = open(path, "rb").read()
        rd = RangedGeoTiff(MemoryByteSource(buf))
        np.testing.assert_array_equal(
            rd.read_window(0, 0, 64, 64), arr[:, :64, :64]
        )

    def test_http_range_source(self, tif_file):
        path, arr, _ = tif_file
        srv = _RangeHTTPServer(open(path, "rb").read())
        try:
            src = open_byte_source(srv.url)
            assert isinstance(src, HTTPRangeSource)
            rd = RangedGeoTiff(src)
            win = rd.read_window(70, 33, 100, 177)
            np.testing.assert_array_equal(win, arr[:, 70:170, 33:210])
            assert srv.counters["range_reqs"] == src.n_requests > 0
            assert src.bytes_fetched < src.size() * 0.6
        finally:
            srv.stop()

    def test_range_merging_cuts_requests(self, tif_file):
        path, _, _ = tif_file
        # adjacent tiles of one band row: with a large merge gap the 3
        # payload fetches collapse into fewer requests than tiles
        src_nogap = LocalFileSource(path)
        RangedGeoTiff(src_nogap, max_gap=0).read_window(0, 0, 64, 192)
        src_gap = LocalFileSource(path)
        RangedGeoTiff(src_gap, max_gap=1 << 20).read_window(0, 0, 64, 192)
        assert src_gap.n_requests < src_nogap.n_requests

    def test_cloud_scheme_gate(self):
        try:
            import fsspec  # noqa: F401

            has_fsspec = True
        except ImportError:
            has_fsspec = False
        if not has_fsspec:
            with pytest.raises(NotImplementedError, match="fsspec"):
                open_byte_source("s3://bucket/key.tif")
        with pytest.raises(ValueError, match="scheme"):
            open_byte_source("ftp://h/a.tif")


class TestScanWindows:
    def test_scan_windows_parity(self, spark, tif_file, tmp_path):
        from georeader_spark.sources.vsi import scan_windows

        path, arr, t = tif_file
        # second file with distinct content to prove per-path routing
        arr2 = (arr[::-1] * 2).astype(np.int16)
        p2 = str(tmp_path / "second.tif")
        open(p2, "wb").write(
            encode_geotiff(arr2, t, crs_epsg=32630, tile=64, compress=True)
        )
        reqs = spark.createDataFrame(
            [
                (0, path, 70, 33, 20, 30, 0),
                (1, path, 0, 0, 10, 10, 0),
                (2, p2, 100, 200, 25, 40, 0),
            ],
            "window_id int, path string, row_off int, col_off int, "
            "height int, width int, overview int",
        ).repartition(3, "window_id")
        out = scan_windows(spark, reqs).toPandas()
        assert len(out) == 3 * (20 * 30 + 10 * 10 + 25 * 40)
        w0 = out[out.window_id == 0]
        got = np.zeros((3, 20, 30))
        got[w0.band, w0.row, w0.col] = w0.value
        np.testing.assert_array_equal(got, arr[:, 70:90, 33:63].astype(float))
        w2 = out[out.window_id == 2]
        got2 = np.zeros((3, 25, 40))
        got2[w2.band, w2.row, w2.col] = w2.value
        np.testing.assert_array_equal(
            got2, arr2[:, 100:125, 200:240].astype(float)
        )
