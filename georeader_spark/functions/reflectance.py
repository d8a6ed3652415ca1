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


def _sza_parts(doy, frac_hour, lon, lat, *, is_sql: bool):
    """Shared NOAA solar-position formula text/tree builder. The
    reference's compute_sza (reflectance.py:241-303) defers to pysolar
    (SPA); this is NOAA's general solar position approximation (NOAA
    Global Monitoring Division solar calculator, public domain) as pure
    column arithmetic — within ~0.2 deg of SPA, no per-row Python. Both
    engines run the identical formula (cols/sql twins)."""
    if is_sql:
        g = f"({2.0 * PI / 365.0!r} * (CAST({doy} AS DOUBLE) - 1.0 + ({frac_hour} - 12.0) / 24.0))"
        eqtime = (
            f"(229.18 * (0.000075 + 0.001868 * COS({g}) - 0.032077 * SIN({g})"
            f" - 0.014615 * COS(2.0 * {g}) - 0.040849 * SIN(2.0 * {g})))"
        )
        decl = (
            f"(0.006918 - 0.399912 * COS({g}) + 0.070257 * SIN({g})"
            f" - 0.006758 * COS(2.0 * {g}) + 0.000907 * SIN(2.0 * {g})"
            f" - 0.002697 * COS(3.0 * {g}) + 0.00148 * SIN(3.0 * {g}))"
        )
        ha = f"RADIANS((({frac_hour} * 60.0 + {eqtime} + 4.0 * {lon}) / 4.0) - 180.0)"
        cos_sza = (
            f"(SIN(RADIANS({lat})) * SIN({decl})"
            f" + COS(RADIANS({lat})) * COS({decl}) * COS({ha}))"
        )
        return f"DEGREES(ACOS(LEAST(GREATEST({cos_sza}, -1.0), 1.0)))"
    g = F.lit(2.0 * PI / 365.0) * (
        doy.cast("double") - F.lit(1.0) + (frac_hour - F.lit(12.0)) / F.lit(24.0)
    )
    eqtime = F.lit(229.18) * (
        F.lit(0.000075)
        + F.lit(0.001868) * F.cos(g)
        - F.lit(0.032077) * F.sin(g)
        - F.lit(0.014615) * F.cos(F.lit(2.0) * g)
        - F.lit(0.040849) * F.sin(F.lit(2.0) * g)
    )
    decl = (
        F.lit(0.006918)
        - F.lit(0.399912) * F.cos(g)
        + F.lit(0.070257) * F.sin(g)
        - F.lit(0.006758) * F.cos(F.lit(2.0) * g)
        + F.lit(0.000907) * F.sin(F.lit(2.0) * g)
        - F.lit(0.002697) * F.cos(F.lit(3.0) * g)
        + F.lit(0.00148) * F.sin(F.lit(3.0) * g)
    )
    ha = F.radians((frac_hour * F.lit(60.0) + eqtime + F.lit(4.0) * lon) / F.lit(4.0) - F.lit(180.0))
    cos_sza = F.sin(F.radians(lat)) * F.sin(decl) + F.cos(F.radians(lat)) * F.cos(
        decl
    ) * F.cos(ha)
    return F.degrees(F.acos(F.least(F.greatest(cos_sza, F.lit(-1.0)), F.lit(1.0))))


def compute_sza(ts: Column, lon: Column, lat: Column) -> Column:
    """Solar zenith angle (degrees) from UTC timestamp + lon/lat — the
    reference compute_sza (reflectance.py:241-303) re-expressed as
    whole-stage-codegen column arithmetic (no pysolar, no UDF)."""
    frac_hour = (
        F.hour(ts).cast("double")
        + F.minute(ts).cast("double") / F.lit(60.0)
        + F.second(ts).cast("double") / F.lit(3600.0)
    )
    return _sza_parts(F.dayofyear(ts), frac_hour, lon, lat, is_sql=False)


def compute_sza_sql(ts: str, lon: str, lat: str) -> str:
    """The identical NOAA arithmetic as ANSI SQL (DuckDB twin)."""
    frac_hour = (
        f"(CAST(hour({ts}) AS DOUBLE) + CAST(minute({ts}) AS DOUBLE) / 60.0"
        f" + CAST(second({ts}) AS DOUBLE) / 3600.0)"
    )
    return _sza_parts(f"dayofyear({ts})", frac_hour, lon, lat, is_sql=True)
