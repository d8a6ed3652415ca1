"""Gaussian anti-alias blur (halo exchange) + SRF band integration vs
single-process numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.operators import raster as R
from georeader_spark.operators.reproject import (
    gaussian_blur_tiles,
    tile_blocked_from_long,
    tile_blocked_to_long,
)


def gaussian_blur_numpy(arr: np.ndarray, sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter(mode='reflect', truncate=4)
    equivalent in pure numpy. NB: scipy's 'reflect' repeats the edge
    sample ((d c b a | a b c d)) — that is numpy's 'symmetric', NOT
    numpy's 'reflect' (which is scipy's 'mirror')."""
    radius = int(np.ceil(4.0 * sigma))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    kern = np.exp(-0.5 * (xs / sigma) ** 2)
    kern /= kern.sum()
    padded = np.pad(arr, radius, mode="symmetric")
    tmp = np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 0, padded)
    out = np.apply_along_axis(lambda m: np.convolve(m, kern, mode="same"), 1, padded * 0 + tmp)
    return out[radius:-radius, radius:-radius]


class TestGaussianBlur:
    @pytest.mark.parametrize("sigma", [0.8, 1.5])
    def test_matches_numpy(self, spark, sigma):
        H, W = 96, 96
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        out = gaussian_blur_tiles(tiles, (H, W), sigma=sigma, tile=32)
        rows = tile_blocked_to_long(out, tile=32).collect()
        got = np.zeros((H, W))
        for r in rows:
            got[r["row"], r["col"]] = r["value"]

        idx = np.arange(H * W, dtype=np.int64)
        arr = ((idx * 2654435761) % 10000).reshape(H, W).astype(float)
        expect = gaussian_blur_numpy(arr, sigma)
        np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-8)

    @pytest.mark.parametrize("sigma", [0.8, 1.5])
    def test_constant_mode_matches_numpy(self, spark, sigma):
        """mode='constant' (cval=0 — GeoTensor.resize's mode_pad
        default) vs a zero-padded numpy reference."""
        H, W = 96, 96
        src = R.synth_raster(spark, 1, H, W, bands=1)
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        out = gaussian_blur_tiles(
            tiles, (H, W), sigma=sigma, tile=32, mode="constant"
        )
        rows = tile_blocked_to_long(out, tile=32).collect()
        got = np.zeros((H, W))
        for r in rows:
            got[r["row"], r["col"]] = r["value"]

        idx = np.arange(H * W, dtype=np.int64)
        arr = ((idx * 2654435761) % 10000).reshape(H, W).astype(float)
        radius = int(np.ceil(4.0 * sigma))
        xs = np.arange(-radius, radius + 1, dtype=np.float64)
        kern = np.exp(-0.5 * (xs / sigma) ** 2)
        kern /= kern.sum()
        padded = np.pad(arr, radius, mode="constant")
        tmp = np.apply_along_axis(
            lambda m: np.convolve(m, kern, mode="same"), 0, padded)
        expect = np.apply_along_axis(
            lambda m: np.convolve(m, kern, mode="same"), 1, tmp
        )[radius:-radius, radius:-radius]
        np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-8)

    def test_unknown_mode_raises(self, spark):
        src = R.synth_raster(spark, 1, 32, 32, bands=1)
        tiles = tile_blocked_from_long(src, 32, 32, tile=32)
        with pytest.raises(NotImplementedError):
            gaussian_blur_tiles(tiles, (32, 32), sigma=1.0, mode="wrap")

    def test_preserves_constant_field(self, spark):
        H, W = 64, 64
        src = R.synth_raster(spark, 1, H, W, bands=1).withColumn("value", F.lit(7.0))
        tiles = tile_blocked_from_long(src, H, W, tile=32)
        out = gaussian_blur_tiles(tiles, (H, W), sigma=1.2, tile=32)
        rows = tile_blocked_to_long(out, tile=32).collect()
        vals = np.array([r["value"] for r in rows])
        np.testing.assert_allclose(vals, 7.0, rtol=1e-12)


class TestSrfIntegration:
    def test_matches_numpy(self, spark):
        # spectral table: 4 pixels x 200 wavelengths
        n_wl = 200
        df = spark.range(0, 4 * n_wl).select(
            (F.col("id") % 2).alias("row"),
            (F.floor(F.col("id") / 2) % 2).cast("long").alias("col"),
            (F.floor(F.col("id") / 4) + 400).cast("double").alias("wavelength"),
            (F.pmod(F.col("id") * 48271, 1000)).cast("double").alias("value"),
        )
        bands = [("red", 480.0, 30.0), ("nir", 560.0, 60.0)]
        out = R.srf_band_integration(df, bands)
        got = {
            (r["row"], r["col"], r["dst_band"]): r["value"] for r in out.collect()
        }

        rows = df.collect()
        import math

        for name, center, fwhm in bands:
            sigma = fwhm / (2 * math.sqrt(2 * math.log(2)))
            for py in (0, 1):
                for px in (0, 1):
                    num = den = 0.0
                    for r in rows:
                        if r["row"] == py and r["col"] == px:
                            w = math.exp(-0.5 * ((r["wavelength"] - center) / sigma) ** 2)
                            num += w * r["value"]
                            den += w
                    assert got[(py, px, name)] == pytest.approx(num / den, rel=1e-9)
