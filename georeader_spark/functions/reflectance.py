"""Radiometric conversion functions (SURVEY.md §2.8) as JVM column
expressions with ANSI-SQL twins.

Re-expressed semantics (reference /root/reference/georeader/reflectance.py):

- ``earth_sun_distance_correction_factor``:
  d = 1 - 0.01673 * cos(0.0172 * (day_of_year - 4))          (:238)
- ``observation_date_correction_factor``:
  obfactor = pi * d^2 / cos(sza * pi / 180)                  (:302)
- ``radiance_to_reflectance``:
  rho = L * pi * d^2 / (E_sun * cos(theta_z))                (:322)
  with the reference's unit normalization factor applied by the caller
  (reflectance.py:336-361 divides E_sun by 1000 for uW/cm^2/nm inputs).
- ``reflectance_to_radiance``: the exact inverse (:747-818).
- ``srf_gaussian`` weight: Gaussian spectral response from center+FWHM
  (reflectance.py:490): w = exp(-(lambda-center)^2 / (2*sigma^2)),
  sigma = fwhm / (2*sqrt(2*ln 2)) — used by the band-integration
  aggregation (hyperspectral -> multispectral as a groupBy dot product).

All pure arithmetic + cos/exp — per-band column math, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

PI = math.pi
_FWHM_TO_SIGMA = 2.0 * math.sqrt(2.0 * math.log(2.0))


def earth_sun_distance(day_of_year: Column) -> Column:
    return F.lit(1.0) - F.lit(0.01673) * F.cos(
        F.lit(0.0172) * (day_of_year.cast("double") - F.lit(4.0))
    )


def earth_sun_distance_sql(day_of_year: str) -> str:
    return f"(1.0 - 0.01673 * COS(0.0172 * (CAST({day_of_year} AS DOUBLE) - 4.0)))"


def observation_date_correction_factor(day_of_year: Column, sza_deg: Column) -> Column:
    d = earth_sun_distance(day_of_year)
    return F.lit(PI) * d * d / F.cos(sza_deg * F.lit(PI / 180.0))


def observation_date_correction_factor_sql(day_of_year: str, sza_deg: str) -> str:
    d = earth_sun_distance_sql(day_of_year)
    return f"({PI!r} * {d} * {d} / COS({sza_deg} * {PI / 180.0!r}))"


def radiance_to_reflectance(
    radiance: Column, e_sun: Column, day_of_year: Column, sza_deg: Column
) -> Column:
    """rho = L * pi * d^2 / (E_sun * cos(theta_z))."""
    return radiance * observation_date_correction_factor(day_of_year, sza_deg) / e_sun


def radiance_to_reflectance_sql(
    radiance: str, e_sun: str, day_of_year: str, sza_deg: str
) -> str:
    ob = observation_date_correction_factor_sql(day_of_year, sza_deg)
    return f"({radiance} * {ob} / {e_sun})"


def reflectance_to_radiance(
    reflectance: Column, e_sun: Column, day_of_year: Column, sza_deg: Column
) -> Column:
    return reflectance * e_sun / observation_date_correction_factor(day_of_year, sza_deg)


def srf_gaussian_weight(wavelength: Column, center: float, fwhm: float) -> Column:
    """Gaussian SRF weight for band integration (hyperspectral ->
    multispectral: groupBy(dst_band).agg(sum(w*value)/sum(w)))."""
    sigma = fwhm / _FWHM_TO_SIGMA
    z = (wavelength - F.lit(center)) / F.lit(sigma)
    return F.exp(F.lit(-0.5) * z * z)


def srf_gaussian_weight_sql(wavelength: str, center: float, fwhm: float) -> str:
    sigma = fwhm / _FWHM_TO_SIGMA
    z = f"(({wavelength} - {center!r}) / {sigma!r})"
    return f"EXP(-0.5 * {z} * {z})"
