"""Pure-math CRS support: WGS84, Web Mercator, UTM (Transverse Mercator).

No pyproj/GDAL in this environment, so the engine carries its own
projection kernels (vectorized numpy, run inside Arrow UDF batches):

- ``compare_crs``        — normalized string equality, semantics of
  /root/reference/georeader/__init__.py:12-60.
- ``get_utm_epsg``       — lon/lat -> UTM EPSG,
  ``floor((lon+180)/6) % 60 + 1``, N/S by lat
  (/root/reference/georeader/__init__.py:63-127). Pure arithmetic —
  also emitted as a Spark/DuckDB SQL expression (functions/geo.py).
- ``wgs84_to_web_mercator`` / inverse — spherical EPSG:3857 formulas.
- ``wgs84_to_utm`` / inverse — Karney/Krüger 6th-order series
  (public formulas, e.g. Karney 2011 "Transverse Mercator with an
  accuracy of a few nanometers"), the same series GeographicLib uses;
  accurate to far below the reference's 1e-3 transform tolerance.
- ``distance_meters``    — midpoint-UTM Euclidean distance, the
  reference's semantics (/root/reference/georeader/__init__.py:277-330).
- ``solar_datetime_offset_seconds`` — ``longitude * 240 s`` shift
  (/root/reference/georeader/readers/query_utils.py:58-81:
  utc + longitude*12/180 hours).
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WEB_MERCATOR_R = 6378137.0

ArrayLike = Union[float, np.ndarray]


def _normalize_crs(a_crs) -> str:
    a_crs = str(a_crs)
    if "+init=" in a_crs:
        a_crs = a_crs.replace("+init=", "")
    return a_crs.lower()


def compare_crs(a_crs, b_crs) -> bool:
    return _normalize_crs(a_crs) == _normalize_crs(b_crs)


def get_utm_epsg(lon: float, lat: float) -> str:
    utm_band = str((math.floor((lon + 180) / 6) % 60) + 1)
    if len(utm_band) == 1:
        utm_band = "0" + utm_band
    return ("EPSG:326" if lat >= 0 else "EPSG:327") + utm_band


def utm_zone_epsg_np(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized get_utm_epsg -> int EPSG codes (32601..32760)."""
    zone = (np.floor((np.asarray(lon) + 180.0) / 6.0).astype(np.int64) % 60) + 1
    north = np.asarray(lat) >= 0
    return np.where(north, 32600 + zone, 32700 + zone)


def get_utm_from_mgrs_zone(mgrs_tile: str) -> Tuple[int, bool]:
    """MGRS tile string -> (zone, south). Band letters C-M are south
    (/root/reference/georeader/__init__.py:130-172)."""
    return int(mgrs_tile[:2]), mgrs_tile[2] < "N"


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857) — spherical formulas
# ---------------------------------------------------------------------------

def wgs84_to_web_mercator(lon: ArrayLike, lat: ArrayLike) -> Tuple[ArrayLike, ArrayLike]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WEB_MERCATOR_R * np.radians(lon)
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def web_mercator_to_wgs84(x: ArrayLike, y: ArrayLike) -> Tuple[ArrayLike, ArrayLike]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# UTM — Karney/Krüger series (order n^6)
# ---------------------------------------------------------------------------

_N = WGS84_F / (2.0 - WGS84_F)
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6

# Rectifying radius A (meridian quarter-length * 2/pi)
_A_CAP = WGS84_A / (1.0 + _N) * (1.0 + _N2 / 4.0 + _N4 / 64.0 + _N6 / 256.0)

# Forward series coefficients alpha_j (Krüger, to n^6)
_ALPHA = (
    _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288 + 7891 * _N6 / 37800,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630 - 1983433 * _N6 / 1935360,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880 + 167603 * _N6 / 181440,
    49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
    34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
    212378941 * _N6 / 319334400,
)

# Inverse series coefficients beta_j
_BETA = (
    _N / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - _N4 / 360 - 81 * _N5 / 512 + 96199 * _N6 / 604800,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105 - 1118711 * _N6 / 3870720,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480 + 5569 * _N6 / 90720,
    4397 * _N4 / 161280 - 11 * _N5 / 504 - 830251 * _N6 / 7257600,
    4583 * _N5 / 161280 - 108847 * _N6 / 3991680,
    20648693 * _N6 / 638668800,
)

_K0 = 0.9996
_E0 = 500000.0
_N0_SOUTH = 10000000.0
_E_ECC = math.sqrt(WGS84_F * (2.0 - WGS84_F))  # first eccentricity


def utm_central_meridian(zone: int) -> float:
    return float(zone * 6 - 183)


def wgs84_to_utm(
    lon: ArrayLike, lat: ArrayLike, zone: int, south: bool = False
) -> Tuple[ArrayLike, ArrayLike]:
    """Forward transverse-Mercator projection onto a UTM zone."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - utm_central_meridian(zone))
    phi = np.radians(lat)

    sphi = np.sin(phi)
    # conformal latitude
    t = np.sinh(
        np.arctanh(sphi) - _E_ECC * np.arctanh(_E_ECC * sphi)
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta = eta + a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    easting = _E0 + _K0 * _A_CAP * eta
    northing = _K0 * _A_CAP * xi
    if south:
        northing = northing + _N0_SOUTH
    return easting, northing


def utm_to_wgs84(
    easting: ArrayLike, northing: ArrayLike, zone: int, south: bool = False
) -> Tuple[ArrayLike, ArrayLike]:
    """Inverse UTM -> lon/lat."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    if south:
        northing = northing - _N0_SOUTH
    xi = northing / (_K0 * _A_CAP)
    eta = (easting - _E0) / (_K0 * _A_CAP)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p = eta_p - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    # conformal latitude: sin(chi) = sin(xi') / cosh(eta')
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))

    # fixed-point iterate geodetic latitude from conformal latitude
    phi = chi.copy()
    for _ in range(8):
        sphi = np.sin(phi)
        t_i = np.sinh(np.arctanh(sphi) - _E_ECC * np.arctanh(_E_ECC * sphi))
        phi = phi + (chi - np.arctan(t_i))

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + utm_central_meridian(zone)
    lat = np.degrees(phi)
    return lon, lat


def distance_meters(
    lon1: ArrayLike, lat1: ArrayLike, lon2: ArrayLike, lat2: ArrayLike
) -> ArrayLike:
    """WGS84 point-pair distance via midpoint-UTM projection — the
    reference's exact strategy (/root/reference/georeader/__init__.py:277-330).
    Scalar-only midpoint zone selection per pair; vectorized by grouping
    pairs sharing a zone."""
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    mid_lon = (lon1 + lon2) / 2.0
    mid_lat = (lat1 + lat2) / 2.0
    zones = (np.floor((mid_lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    south = mid_lat < 0
    out = np.empty(lon1.shape, dtype=np.float64)
    for zone in np.unique(zones):
        for s in (False, True):
            m = (zones == zone) & (south == s)
            if not m.any():
                continue
            x1, y1 = wgs84_to_utm(lon1[m], lat1[m], int(zone), s)
            x2, y2 = wgs84_to_utm(lon2[m], lat2[m], int(zone), s)
            out[m] = np.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
    return out if out.shape != (1,) else float(out[0])


def haversine_meters(
    lon1: ArrayLike, lat1: ArrayLike, lon2: ArrayLike, lat2: ArrayLike
) -> ArrayLike:
    """Spherical haversine distance — SQL-expressible (used by oracle-
    gated kNN queries where both engines recompute it identically)."""
    rlon1, rlat1 = np.radians(lon1), np.radians(lat1)
    rlon2, rlat2 = np.radians(lon2), np.radians(lat2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(rlat1) * np.cos(rlat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * 6371008.8 * np.arcsin(np.sqrt(a))


def solar_datetime_offset_seconds(lon: ArrayLike) -> ArrayLike:
    """Seconds to add to UTC for local solar time:
    ``longitude * 12/180 hours`` == ``longitude * 240 s``
    (/root/reference/georeader/readers/query_utils.py:58-81). Truncated
    to whole seconds so Spark and DuckDB agree exactly."""
    return np.trunc(np.asarray(lon, dtype=np.float64) * 240.0).astype(np.int64)


# MGRS 100 km square scheme (MIL-STD-2411 / public MGRS spec). The
# reference's get_utm_from_mgrs (/root/reference/georeader/__init__.py:
# 130-172) uses only zone + hemisphere from the tile id; the full
# square -> (EPSG, easting/northing origin) resolution below is what a
# Sentinel-2-style tiling actually needs (tile "31TCJ" -> the 100 km
# square's UTM bounding origin).

_MGRS_COLS = "ABCDEFGHJKLMNPQRSTUVWXYZ"  # 24 letters, I/O omitted
_MGRS_ROWS = "ABCDEFGHJKLMNPQRSTUV"      # 20-letter row cycle
_MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"     # 8-deg latitude bands


def mgrs_tile_origin(tile: str) -> Tuple[int, float, float]:
    """Full MGRS tile (e.g. '30TVK', '31TCJ', '56HLH') -> (utm_epsg,
    easting_min, northing_min) of its 100 km grid square.

    Column letters cycle in 3 zone-dependent sets of 8 (easting 100-800
    km); row letters cycle over 20 (odd zones start at 'A', even at
    'F') with the 2000 km ambiguity resolved by picking the candidate
    whose square center lies closest to the latitude band's center —
    bands span ~885 km, far less than the 2000 km period, so the
    choice is unique."""
    tile = tile.strip().upper()
    if len(tile) < 5:
        raise ValueError(f"need a 5-char MGRS tile, got {tile!r}")
    zone = int(tile[:2])
    band, col_l, row_l = tile[2], tile[3], tile[4]
    if band not in _MGRS_BANDS:
        raise ValueError(f"bad latitude band {band!r}")
    south = band < "N"
    epsg = (32700 if south else 32600) + zone

    col_set = ((zone - 1) % 3) * 8
    try:
        col_idx = _MGRS_COLS.index(col_l) - col_set
    except ValueError:
        raise ValueError(f"bad column letter {col_l!r}")
    if not 0 <= col_idx < 8:
        raise ValueError(f"column {col_l!r} not valid for zone {zone}")
    easting = (col_idx + 1) * 100_000.0

    row_start = 0 if zone % 2 == 1 else 5  # even zones start at 'F'
    try:
        row_idx = (_MGRS_ROWS.index(row_l) - row_start) % 20
    except ValueError:
        raise ValueError(f"bad row letter {row_l!r}")
    row_base = row_idx * 100_000.0

    lat_min = -80.0 + 8.0 * _MGRS_BANDS.index(band)
    # northing of the band's southern edge on this zone's central meridian
    cm = utm_central_meridian(zone)
    _, n_band = wgs84_to_utm(cm, lat_min, zone, south=south)
    n_band = float(n_band)
    band_center = n_band + (885_000.0 if band != "X" else 1_330_000.0) / 2.0
    best = min(
        (row_base + k * 2_000_000.0 for k in range(0, 6)),
        key=lambda n: abs((n + 50_000.0) - band_center),
    )
    return epsg, easting, best
