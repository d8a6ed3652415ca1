"""Bicubic (Keys a=-0.5) resampling + the composed anti-aliased resize
(reference GeoTensor.resize, geotensor.py:1850-1975 / ORDERS map
geotensor.py:178-182), pinned by analytic goldens and a direct
single-process numpy oracle (scipy/skimage are not in this container,
so parity is proven from the kernel's defining properties instead:
interpolating at samples, partition of unity, exact reproduction of
quadratic fields — Keys 1981, the properties skimage/GDAL cubic share).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels.affine import Affine
from georeader_spark.operators import raster as R
from georeader_spark.operators.reproject import (
    _keys_weights,
    gaussian_blur_tiles,
    resample_tiles,
    resize_tiles,
    tile_blocked_from_long,
    tile_blocked_to_long,
)


def keys_kernel(s: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Direct piecewise Keys cubic-convolution kernel (Keys 1981 eq. 15
    with a=-0.5) — the independent form the Horner weights must match."""
    s = np.abs(s)
    return np.where(
        s <= 1.0,
        (a + 2.0) * s**3 - (a + 3.0) * s**2 + 1.0,
        np.where(s < 2.0, a * s**3 - 5.0 * a * s**2 + 8.0 * a * s - 4.0 * a, 0.0),
    )


def bicubic_numpy(arr: np.ndarray, fr: np.ndarray, fc: np.ndarray) -> np.ndarray:
    """Reference bicubic at fractional pixel-center coords (interior)."""
    fr2, fc2 = fr - 0.5, fc - 0.5
    r0 = np.floor(fr2).astype(int)
    c0 = np.floor(fc2).astype(int)
    ty, tx = fr2 - r0, fc2 - c0
    out = np.zeros_like(fr2)
    for m in range(4):
        for n in range(4):
            out += (
                keys_kernel(ty - (m - 1))
                * keys_kernel(tx - (n - 1))
                * arr[r0 - 1 + m, c0 - 1 + n]
            )
    return out


def collect_grid(out_tiles, h, w, tile):
    rows = tile_blocked_to_long(out_tiles, tile=tile).collect()
    got = np.full((h, w), np.nan)
    for r in rows:
        got[r["row"], r["col"]] = r["value"]
    assert not np.isnan(got).any()
    return got


class TestKeysWeights:
    def test_matches_piecewise_kernel(self):
        t = np.linspace(0.0, 1.0, 101)
        ws = _keys_weights(t)
        for m, w in zip((-1, 0, 1, 2), ws):
            np.testing.assert_allclose(w, keys_kernel(t - m), atol=1e-15)

    def test_partition_of_unity_and_interpolating(self):
        t = np.linspace(0.0, 1.0, 1001)
        ws = _keys_weights(t)
        np.testing.assert_allclose(sum(ws), np.ones_like(t), atol=1e-14)
        w_at_0 = [w[0] for w in ws]
        np.testing.assert_allclose(w_at_0, [0.0, 1.0, 0.0, 0.0], atol=1e-15)


class TestBicubicResample:
    def test_quadratic_reproduction(self, spark):
        """Keys a=-0.5 is 3rd-order accurate: a quadratic field must
        come back EXACTLY (up to float noise) at any sample points —
        the analytic golden that pins the kernel, not just a
        regression value."""
        H, W = 48, 48

        def f(r, c):
            return 3.0 + 0.25 * c - 0.125 * r + 0.01 * c * c - 0.007 * r * c + 0.004 * r * r

        src = R.synth_raster(spark, 1, H, W, bands=1).withColumn(
            "value",
            F.lit(3.0) + 0.25 * F.col("col") - 0.125 * F.col("row")
            + 0.01 * F.col("col") * F.col("col")
            - 0.007 * F.col("row") * F.col("col")
            + 0.004 * F.col("row") * F.col("row"),
        )
        tiles = tile_blocked_from_long(src, H, W, tile=16)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)
        # dst grid: interior, non-integer sample positions (res 1.6)
        dst_t = Affine.from_origin(5.0, float(H) - 5.0, 1.6, 1.6)
        dH = dW = 20
        out = resample_tiles(
            tiles, src_t, (H, W), dst_t, (dH, dW), method="bicubic", tile=16
        )
        got = collect_grid(out, dH, dW, 16)
        rr, cc = np.meshgrid(np.arange(dH), np.arange(dW), indexing="ij")
        # dst pixel centers in src fractional pixel coords
        fr = 5.0 + (rr + 0.5) * 1.6
        fc = 5.0 + (cc + 0.5) * 1.6
        # the quadratic evaluated at (fr, fc) pixel centers: sample i
        # sits at coordinate i + 0.5
        expect = f(fr - 0.5, fc - 0.5)
        np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-9)

    def test_exact_at_sample_points_and_numpy_parity(self, spark):
        H, W = 64, 64
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)
        idx = np.arange(H * W, dtype=np.int64)
        arr = ((idx * 2654435761) % 10000).reshape(H, W).astype(float)

        # identity grid (interior crop): interpolating kernel returns
        # the samples themselves
        dst_t = Affine.from_origin(8.0, float(H) - 8.0, 1.0, 1.0)
        out = resample_tiles(
            tiles, src_t, (H, W), dst_t, (16, 16), method="bicubic", tile=32
        )
        got = collect_grid(out, 16, 16, 32)
        np.testing.assert_allclose(got, arr[8:24, 8:24], atol=1e-9)

        # fractional grid vs the direct numpy oracle
        dst_t = Affine.from_origin(6.25, float(H) - 7.75, 1.9, 2.3)
        dH = dW = 18
        out = resample_tiles(
            tiles, src_t, (H, W), dst_t, (dH, dW), method="bicubic", tile=32
        )
        got = collect_grid(out, dH, dW, 32)
        rr, cc = np.meshgrid(np.arange(dH), np.arange(dW), indexing="ij")
        fr = 7.75 + (rr + 0.5) * 2.3
        fc = 6.25 + (cc + 0.5) * 1.9
        expect = bicubic_numpy(arr, fr, fc)
        np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-8)

    def test_tile_seam_invariance(self, spark):
        """Same warp at tile=16 and tile=64 (single tile) must agree
        bit-for-bit — the halo gather supplies every tap a seam pixel
        needs."""
        H, W = 64, 64
        src = R.synth_raster(spark, 1, H, W, bands=1)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)
        dst_t = Affine.from_origin(4.0, float(H) - 4.0, 1.7, 1.7)
        dH = dW = 32
        grids = []
        for tile in (16, 64):
            tiles = tile_blocked_from_long(src, H, W, tile=tile)
            out = resample_tiles(
                tiles, src_t, (H, W), dst_t, (dH, dW), method="bicubic",
                tile=tile,
            )
            grids.append(collect_grid(out, dH, dW, tile))
        np.testing.assert_array_equal(grids[0], grids[1])

    def test_cubic_alias(self, spark):
        H, W = 32, 32
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)
        dst_t = Affine.from_origin(4.0, float(H) - 4.0, 2.0, 2.0)
        a = resample_tiles(tiles, src_t, (H, W), dst_t, (8, 8),
                           method="cubic", tile=32)
        b = resample_tiles(tiles, src_t, (H, W), dst_t, (8, 8),
                           method="bicubic", tile=32)
        np.testing.assert_array_equal(
            collect_grid(a, 8, 8, 32), collect_grid(b, 8, 8, 32)
        )


class TestComposedResize:
    def test_equals_blur_then_resample(self, spark):
        """resize_tiles == gaussian_blur_tiles(sigma=(s-1)/2) then
        resample onto the scaled grid — the composition contract."""
        H, W = 96, 96
        s = 4
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)

        rz, dst_t = resize_tiles(
            tiles, src_t, (H, W), (H // s, W // s), method="bilinear", tile=32
        )
        got = collect_grid(rz, H // s, W // s, 32)

        sigma = (s - 1) / 2.0
        blurred = gaussian_blur_tiles(tiles, (H, W), sigma, tile=32)
        manual_t = src_t * Affine.scale(float(s), float(s))
        assert dst_t == manual_t
        manual = resample_tiles(
            blurred, src_t, (H, W), manual_t, (H // s, W // s),
            method="bilinear", tile=32,
        )
        expect = collect_grid(manual, H // s, W // s, 32)
        np.testing.assert_array_equal(got, expect)

    def test_anisotropic_sigma_and_upsample_skips_blur(self, spark):
        H, W = 48, 96
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)

        # H upsampled (s_y=0.5 -> no blur on rows), W downsampled by 4
        # (s_x=4 -> sigma_x=1.5): per-axis sigma must match a manual
        # x-only blur
        rz, dst_t = resize_tiles(
            tiles, src_t, (H, W), (2 * H, W // 4), method="bilinear", tile=32
        )
        got = collect_grid(rz, 2 * H, W // 4, 32)
        blurred = gaussian_blur_tiles(tiles, (H, W), (0.0, 1.5), tile=32)
        manual = resample_tiles(
            blurred, src_t, (H, W),
            src_t * Affine.scale(4.0, 0.5), (2 * H, W // 4),
            method="bilinear", tile=32,
        )
        expect = collect_grid(manual, 2 * H, W // 4, 32)
        np.testing.assert_array_equal(got, expect)

        # pure upsample: no blur at all -> identical to plain resample
        rz2, dst_t2 = resize_tiles(
            tiles, src_t, (H, W), (2 * H, 2 * W), method="nearest", tile=32
        )
        plain = resample_tiles(
            tiles, src_t, (H, W), src_t * Affine.scale(0.5, 0.5),
            (2 * H, 2 * W), method="nearest", tile=32,
        )
        np.testing.assert_array_equal(
            collect_grid(rz2, 2 * H, 2 * W, 32),
            collect_grid(plain, 2 * H, 2 * W, 32),
        )

    def test_constant_field_preserved(self, spark):
        H, W = 64, 64
        src = R.synth_raster(spark, 1, H, W, bands=1).withColumn(
            "value", F.lit(7.0)
        )
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        src_t = Affine.from_origin(0.0, float(H), 1.0, 1.0)
        rz, _ = resize_tiles(tiles, src_t, (H, W), (16, 16),
                             method="bicubic", tile=32)
        got = collect_grid(rz, 16, 16, 32)
        np.testing.assert_allclose(got, 7.0, atol=1e-12)
