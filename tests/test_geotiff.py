"""Real GeoTIFF byte I/O (kernels/geotiff + operators/geotiff_io) —
the load_bytes / save_cog parity gate. The primary fixture mirrors the
reference's session fixture (tests/conftest.py:17-66): 15 bands,
200x250 px, int16, EPSG:32738, 10 m pixels, seed 42."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels.affine import Affine
from georeader_spark.kernels.geotiff import decode_geotiff, encode_geotiff


def _ref_fixture():
    rng = np.random.default_rng(42)
    arr = rng.integers(-1000, 3000, size=(15, 200, 250)).astype(np.int16)
    t = Affine.from_origin(523500.0, 8095000.0, 10.0, 10.0)
    return arr, t


class TestGeoTiffKernel:
    def test_reference_fixture_roundtrip_bit_exact(self):
        arr, t = _ref_fixture()
        buf = encode_geotiff(arr, t, crs_epsg=32738, tile=128,
                             compress=True, nodata=-999.0)
        out, t2, epsg, nodata = decode_geotiff(buf)
        assert np.array_equal(out, arr)
        assert out.dtype == np.int16
        assert t2 == t
        assert epsg == 32738
        assert nodata == -999.0

    def test_cog_overviews_are_blockmeans(self):
        arr, t = _ref_fixture()
        buf = encode_geotiff(arr, t, crs_epsg=32738, tile=64,
                             overview_levels=2)
        ov, t_ov, _, _ = decode_geotiff(buf, overview=1)
        exp = (
            arr[:, :200, :250]
            .reshape(15, 100, 2, 125, 2)
            .astype(np.float64)
            .mean(axis=(2, 4))
            .astype(np.int16)
        )
        assert np.array_equal(ov, exp)
        # overview transform: 2x pixel size, same origin
        assert t_ov.a == 2 * t.a and t_ov.e == 2 * t.e and t_ov.c == t.c

    def test_uncompressed_and_float_dtypes(self):
        rng = np.random.default_rng(7)
        for dt in ("uint8", "uint16", "int32", "float32", "float64"):
            a = (rng.random((2, 33, 47)) * 100).astype(dt)
            buf = encode_geotiff(a, Affine.identity(), tile=32, compress=False)
            out, _, _, _ = decode_geotiff(buf)
            assert np.array_equal(out, a), dt
            assert out.dtype == np.dtype(dt)

    def test_rotated_transform_roundtrip(self):
        a = np.arange(30 * 20, dtype=np.float64).reshape(1, 30, 20)
        t = Affine(2.0, 0.5, 100.0, 0.3, -2.0, 500.0)
        buf = encode_geotiff(a, t, crs_epsg=4326, tile=16)
        _, t2, epsg, _ = decode_geotiff(buf)
        assert t2 == t and epsg == 4326

    def test_sparse_tile_reads_as_nodata(self):
        # COG sparse-block convention (offset=0, bytecount=0): GDAL
        # returns nodata (or 0 without one). Patch tile 0's entries in
        # the real byte stream — the on-disk form a sparse writer emits.
        import struct

        a = np.arange(2 * 40 * 40, dtype=np.int16).reshape(2, 40, 40)
        a[a == -999] = 0
        buf = bytearray(encode_geotiff(a, Affine.identity(), tile=32,
                                       compress=True, nodata=-999))

        def _patch_first(tag):
            (ifd_off,) = struct.unpack_from("<I", buf, 4)
            (n,) = struct.unpack_from("<H", buf, ifd_off)
            for i in range(n):
                t, ftype, count = struct.unpack_from(
                    "<HHI", buf, ifd_off + 2 + 12 * i)
                if t == tag:
                    vpos = ifd_off + 2 + 12 * i + 8
                    if count * 4 > 4:
                        (vpos,) = struct.unpack_from("<I", buf, vpos)
                    struct.pack_into("<I", buf, vpos, 0)
                    return
            raise AssertionError(f"tag {tag} not found")

        _patch_first(324)  # TileOffsets[0] = 0
        _patch_first(325)  # TileByteCounts[0] = 0
        out, _, _, nodata = decode_geotiff(bytes(buf))
        assert nodata == -999
        assert (out[0, :32, :32] == -999).all()  # sparse band-0 tile
        assert np.array_equal(out[0, 32:, :], a[0, 32:, :])
        assert np.array_equal(out[0, :32, 32:], a[0, :32, 32:])
        assert np.array_equal(out[1], a[1])

    def test_magic_rejects_non_tiff(self):
        with pytest.raises(ValueError):
            decode_geotiff(b"MM\x00*garbage")


class TestGeoTiffSpark:
    def test_spark_roundtrip_bit_exact(self, spark):
        from georeader_spark.operators import raster as R
        from georeader_spark.operators.geotiff_io import (
            geotiff_to_long,
            long_to_geotiff,
        )

        src = R.synth_raster(spark, 1, 100, 120, bands=3)
        t = Affine.from_origin(0.0, 100.0, 1.0, 1.0)
        tifs = long_to_geotiff(src, 100, 120, t, crs_epsg=32630, tile=64,
                               overview_levels=1)
        rows = tifs.collect()
        assert len(rows) == 1 and rows[0]["n_bands"] == 3
        assert bytes(rows[0]["tif"])[:4] == b"II*\x00"
        back = geotiff_to_long(tifs).drop("raster_id")
        a = sorted(map(tuple, src.select("band", "row", "col", "value").collect()))
        b = sorted(map(tuple, back.collect()))
        assert a == b

    def test_drop_nodata_nan_fill(self, spark):
        """drop_nodata must drop NaN-fill pixels when the declared
        nodata is NaN (NaN != NaN kept everything — ADVICE r3) and
        still drop finite sentinels."""
        import pandas as pd
        from georeader_spark.operators.geotiff_io import geotiff_to_long

        for nd in (float("nan"), -999.0):
            arr = np.arange(12, dtype=np.float64).reshape(1, 3, 4)
            arr[0, 0, :2] = nd
            buf = encode_geotiff(arr, Affine.from_origin(0, 3, 1, 1),
                                 crs_epsg=4326, tile=16, nodata=nd)
            tifs = spark.createDataFrame(
                pd.DataFrame({"raster_id": [0], "tif": [bytearray(buf)]})
            )
            kept = geotiff_to_long(tifs, drop_nodata=True).count()
            assert kept == 10, (nd, kept)

    def test_spark_overview_read(self, spark):
        from georeader_spark.operators import raster as R
        from georeader_spark.operators.geotiff_io import (
            geotiff_to_long,
            long_to_geotiff,
        )

        src = R.synth_raster(spark, 1, 64, 64, bands=1)
        t = Affine.from_origin(0.0, 64.0, 1.0, 1.0)
        tifs = long_to_geotiff(src, 64, 64, t, tile=32, overview_levels=1)
        lod = geotiff_to_long(tifs, overview=1)
        assert lod.count() == 32 * 32


def _write_tiff(arrays, *, layout="strips", planar=1, compress=False,
                predictor=1, rps=16):
    """Minimal test-side TIFF writer for layouts OUR encoder does not
    emit (strips, chunky interleave, predictor) — exercises the
    decoder's compatibility surface against independently-built bytes."""
    import struct
    import zlib as _z

    from georeader_spark.kernels.geotiff import _IfdBuilder

    nb, h, w = arrays.shape
    dt = arrays.dtype
    bits = dt.itemsize * 8
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]

    def diff(a2d):
        if predictor != 2:
            return a2d
        d = a2d.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        return d.astype(dt)

    payloads = []
    if layout == "strips":
        n_strips = (h + rps - 1) // rps
        if planar == 2:
            for b in range(nb):
                for s in range(n_strips):
                    rows = arrays[b, s * rps : s * rps + rps]
                    payloads.append(diff(rows).tobytes())
        else:
            for s in range(n_strips):
                rows = arrays[:, s * rps : s * rps + rps]  # (nb, r, w)
                inter = np.stack([diff(rows[b]) for b in range(nb)], axis=2)
                payloads.append(inter.tobytes())
    else:
        raise ValueError(layout)
    if compress:
        payloads = [_z.compress(p, 6) for p in payloads]

    ifd = _IfdBuilder()
    ifd.add(256, 4, w)
    ifd.add(257, 4, h)
    ifd.add(258, 3, [bits] * nb)
    ifd.add(259, 3, 8 if compress else 1)
    ifd.add(262, 3, 1)
    ifd.add(277, 3, nb)
    ifd.add(284, 3, planar)
    ifd.add(339, 3, [fmt] * nb)
    ifd.add(278, 4, rps)
    if predictor == 2:
        ifd.add(317, 3, 2)
    ifd.add(273, 4, [0] * len(payloads))
    ifd.add(279, 4, [len(p) for p in payloads])
    ifd_off = 8
    data_off = ifd_off + ifd.size() + (ifd.size() & 1)
    offs = []
    for p in payloads:
        offs.append(data_off)
        data_off += len(p) + (len(p) & 1)
    for k, e in enumerate(ifd.entries):
        if e[0] == 273:
            ifd.entries[k] = (273, 4, len(offs),
                              struct.pack(f"<{len(offs)}I", *offs))
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += ifd.render(ifd_off, 0)
    out += b"\x00" * ((ifd_off + ifd.size() + (ifd.size() & 1)) - len(out))
    for p in payloads:
        out += p
        if len(p) & 1:
            out += b"\x00"
    return bytes(out)


class TestGeoTiffReaderCompat:
    """Layouts the encoder never writes but real GeoTIFFs use: strips,
    chunky interleave, horizontal-differencing predictor (GDAL's
    deflate default)."""

    def test_stripped_planar_deflate_predictor(self):
        rng = np.random.default_rng(5)
        a = rng.integers(-500, 500, size=(2, 45, 37)).astype(np.int16)
        buf = _write_tiff(a, planar=2, compress=True, predictor=2, rps=8)
        out, _, _, _ = decode_geotiff(buf)
        assert np.array_equal(out, a)

    def test_stripped_chunky_uncompressed(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 255, size=(3, 30, 21)).astype(np.uint8)
        buf = _write_tiff(a, planar=1, compress=False, rps=7)
        out, _, _, _ = decode_geotiff(buf)
        assert np.array_equal(out, a)

    def test_stripped_chunky_deflate_float(self):
        # predictor=2 is integer-only per the TIFF spec (floats use
        # predictor 3) — float strips ship undifferenced
        rng = np.random.default_rng(8)
        a = rng.random((2, 19, 23)).astype(np.float64)
        buf = _write_tiff(a, planar=1, compress=True, rps=5)
        out, _, _, _ = decode_geotiff(buf)
        np.testing.assert_allclose(out, a, rtol=0, atol=0)

    def test_stripped_chunky_deflate_predictor_int(self):
        rng = np.random.default_rng(9)
        a = rng.integers(0, 60000, size=(2, 19, 23)).astype(np.uint16)
        buf = _write_tiff(a, planar=1, compress=True, predictor=2, rps=5)
        out, _, _, _ = decode_geotiff(buf)
        assert np.array_equal(out, a)

    def test_single_band_single_strip(self):
        a = np.arange(12 * 9, dtype=np.int32).reshape(1, 12, 9)
        buf = _write_tiff(a, planar=1, compress=False, rps=12)
        out, _, _, _ = decode_geotiff(buf)
        assert np.array_equal(out, a)
