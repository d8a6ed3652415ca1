"""RPC camera model (kernels/rpc.py + raster.read_rpcs) — reference
read_rpcs (/root/reference/georeader/read.py:1870-1976)."""

import numpy as np
import pytest

from georeader_spark.kernels.rpc import (
    RPC,
    ground_from_image,
    image_from_ground,
    poly20,
    poly20_sql,
    rpc_from_affine,
)


def _fixture_rpc():
    from georeader_spark.queries import _RPC_FIXTURE

    return _RPC_FIXTURE


class TestRpcKernel:
    def test_affine_degenerate_exact(self):
        # RPC built from col = 2*lon + 0.5*lat + 10, row = -lat*4 + 80
        rpc = rpc_from_affine(a=2.0, b=0.5, c=10.0, d=0.0, e=-4.0, f=80.0,
                              lon_off=5.0, lon_scale=3.0, lat_off=1.0, lat_scale=2.0)
        rng = np.random.default_rng(7)
        lon = rng.uniform(2.0, 8.0, 200)
        lat = rng.uniform(-1.0, 3.0, 200)
        row, col = image_from_ground(rpc, lon, lat)
        np.testing.assert_allclose(col, 2.0 * lon + 0.5 * lat + 10.0, rtol=0, atol=1e-9)
        np.testing.assert_allclose(row, -4.0 * lat + 80.0, rtol=0, atol=1e-9)

    def test_newton_inverse_roundtrip(self):
        rpc = _fixture_rpc()
        rng = np.random.default_rng(11)
        lon = rng.uniform(0.05, 0.55, 100)
        lat = rng.uniform(0.45, 0.95, 100)
        row, col = image_from_ground(rpc, lon, lat)
        lon2, lat2 = ground_from_image(rpc, row, col)
        np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-10)

    def test_poly20_matches_duckdb_sql_bitwise(self):
        """The numpy kernel and the generated SQL twin must agree
        bit-for-bit (same factor/accumulation order, no libm)."""
        duckdb = pytest.importorskip("duckdb")
        rpc = _fixture_rpc()
        rng = np.random.default_rng(3)
        L = rng.uniform(-1, 1, 50)
        P = rng.uniform(-1, 1, 50)
        H = np.zeros(50)
        want = poly20(rpc.line_num, L, P, H)
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame({"L": L, "P": P, "H": H}))
        got = con.execute(
            f"SELECT {poly20_sql(rpc.line_num, 'L', 'P', 'H')} AS v FROM t"
        ).fetchnumpy()["v"]
        assert (want == got).all()

    def test_coeff_length_validated(self):
        with pytest.raises(ValueError):
            RPC(0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
                line_num=(1.0,) * 19, line_den=(1.0,) * 20,
                samp_num=(1.0,) * 20, samp_den=(1.0,) * 20)


class TestReadRpcsOperator:
    def test_matches_kernel_golden(self, spark):
        """read_rpcs (JVM expressions + join) == dense numpy gather
        through the same kernel, including off-image fill."""
        from georeader_spark.kernels.affine import Affine
        from georeader_spark.operators import raster as R

        rpc = _fixture_rpc()
        h, w = 100, 120
        src = R.synth_raster(spark, 1, h, w, bands=1)
        t = Affine.from_origin(0.0, 1.0, 0.01, 0.01)
        dh = dw = 60
        got = {
            (r["row"], r["col"]): r["value"]
            for r in R.read_rpcs(src, rpc, t, dh, dw, fill_value=-1.0).collect()
        }

        dense = ((np.arange(h * w) * 2654435761) % 10000).astype(np.float64).reshape(h, w)
        rr, cc = np.meshgrid(np.arange(dh), np.arange(dw), indexing="ij")
        lon = t.c + (cc + 0.5) * t.a
        lat = t.f + (rr + 0.5) * t.e
        srow, scol = image_from_ground(rpc, lon, lat)
        si = np.floor(srow + 0.5).astype(np.int64)
        sj = np.floor(scol + 0.5).astype(np.int64)
        inside = (si >= 0) & (si < h) & (sj >= 0) & (sj < w)
        want = np.full((dh, dw), -1.0)
        want[inside] = dense[si[inside], sj[inside]]

        assert len(got) == dh * dw
        assert (~inside).sum() > 0, "fixture must exercise the fill path"
        for i in range(dh):
            for j in range(dw):
                assert got[(i, j)] == want[i, j]
