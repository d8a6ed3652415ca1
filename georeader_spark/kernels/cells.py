"""GridCell — a hierarchical lon/lat cell index (H3/S2 analog).

The north rule asks for "H3/S2 cell encoding of page-derived geotags".
No H3/S2 library exists in this environment, so the engine defines its
own deterministic hierarchical index with the same *roles*:

- ``encode(lon, lat, r)``  -> int64 cell id      (h3.latlng_to_cell)
- ``parent(cell)``         -> cell at r-1        (h3.cell_to_parent)
- ``children(cell)``       -> 4 cells at r+1     (h3.cell_to_children)
- ``ring(cell, k)``        -> cells within Chebyshev distance k
                                                 (h3.grid_disk)
- ``cell_bounds(cell)``    -> lon/lat AABB       (h3.cell_to_boundary)

Design (deliberately SQL-expressible so the DuckDB oracle can recompute
cell ids with plain floor arithmetic — the correctness gate):

At resolution ``r`` the world splits into ``ny = 2**r`` rows ×
``nx = 2**(r+1)`` cols (2:1 to keep cells roughly square in degrees):

    x = clamp(floor((lon + 180) / 360 * nx), 0, nx - 1)
    y = clamp(floor((90 - lat) / 180 * ny), 0, ny - 1)
    cell = (r << 54) | (y << 27) | x

r <= 26 (cell edge < 1 cm), y < 2**26, x < 2**27 — fits int64 with the
top bits clear. Unlike real H3 this is an equirectangular grid: cells
shrink in ground meters toward the poles, which is fine for its role
here (coarse spatial partitioning / join pruning, refined by exact
geometry predicates), and it makes parent/child/ring pure bit math —
free in Spark SQL (``shiftleft``/``shiftright``), no UDF in the hot path.

georeader's analog is the XYZ web-mercator tile scheme
(/root/reference/georeader/read.py:437-491 ``window_from_tile``); the
``xyz_tile`` helpers below reproduce that exact scheme too.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

R_BITS = 54
Y_BITS = 27
MAX_RES = 26


def _nx_ny(r: int) -> Tuple[int, int]:
    return 1 << (r + 1), 1 << r


def encode(lon: float, lat: float, r: int) -> int:
    nx, ny = _nx_ny(r)
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * nx)), 0), nx - 1)
    y = min(max(int(math.floor((90.0 - lat) / 180.0 * ny)), 0), ny - 1)
    return (r << R_BITS) | (y << Y_BITS) | x


def encode_np(lon: np.ndarray, lat: np.ndarray, r: int) -> np.ndarray:
    """Vectorized :func:`encode` for Arrow-batched UDFs."""
    nx, ny = _nx_ny(r)
    x = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * nx), 0, nx - 1)
    y = np.clip(np.floor((90.0 - np.asarray(lat, np.float64)) / 180.0 * ny), 0, ny - 1)
    return (
        (np.int64(r) << R_BITS) | (y.astype(np.int64) << Y_BITS) | x.astype(np.int64)
    )


def decode(cell: int) -> Tuple[int, int, int]:
    """cell -> (r, x, y)."""
    r = cell >> R_BITS
    y = (cell >> Y_BITS) & ((1 << Y_BITS) - 1)
    x = cell & ((1 << Y_BITS) - 1)
    return int(r), int(x), int(y)


def from_rxy(r: int, x: int, y: int) -> int:
    return (r << R_BITS) | (y << Y_BITS) | x


def resolution(cell: int) -> int:
    return cell >> R_BITS


def parent(cell: int, r_parent: int | None = None) -> int:
    r, x, y = decode(cell)
    if r_parent is None:
        r_parent = r - 1
    if not 0 <= r_parent <= r:
        raise ValueError(f"parent resolution {r_parent} not in [0, {r}]")
    shift = r - r_parent
    return from_rxy(r_parent, x >> shift, y >> shift)


def children(cell: int) -> List[int]:
    r, x, y = decode(cell)
    if r >= MAX_RES:
        raise ValueError("max resolution reached")
    return [
        from_rxy(r + 1, 2 * x + dx, 2 * y + dy) for dy in (0, 1) for dx in (0, 1)
    ]


def ring(cell: int, k: int) -> List[int]:
    """All cells within Chebyshev distance k (the "grid disk"): x wraps
    around the antimeridian, y clamps at the poles. Powers kNN cell-ring
    expansion (SURVEY.md §2.3, north rule kNN requirement)."""
    r, x, y = decode(cell)
    nx, ny = _nx_ny(r)
    # x wraps mod nx: once 2k+1 >= nx the disk spans every column, so cap
    # the dx sweep at nx distinct columns to avoid duplicate cells.
    n_cols = min(2 * k + 1, nx)
    out = []
    for dy in range(-k, k + 1):
        yy = y + dy
        if yy < 0 or yy >= ny:
            continue
        for i in range(n_cols):
            out.append(from_rxy(r, (x - k + i) % nx, yy))
    return out


def hollow_ring(cell: int, k: int) -> List[int]:
    """Cells at Chebyshev distance exactly k (h3.grid_ring analog)."""
    if k == 0:
        return [cell]
    inner = set(ring(cell, k - 1))
    return [c for c in ring(cell, k) if c not in inner]


def cell_bounds(cell: int) -> Tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of a cell."""
    r, x, y = decode(cell)
    nx, ny = _nx_ny(r)
    lon_min = -180.0 + 360.0 * x / nx
    lon_max = -180.0 + 360.0 * (x + 1) / nx
    lat_max = 90.0 - 180.0 * y / ny
    lat_min = 90.0 - 180.0 * (y + 1) / ny
    return (lon_min, lat_min, lon_max, lat_max)


def cell_center(cell: int) -> Tuple[float, float]:
    b = cell_bounds(cell)
    return ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)


def cell_size_deg(r: int) -> Tuple[float, float]:
    nx, ny = _nx_ny(r)
    return 360.0 / nx, 180.0 / ny


def cover_bbox(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, r: int
) -> List[int]:
    """All cells at resolution r intersecting a lon/lat bbox — the
    polygon-cover primitive used for spatial predicate pushdown
    (SURVEY.md §4.1: bounds -> cell-set filter). Antimeridian-naive
    (bbox must satisfy lon_min <= lon_max)."""
    nx, ny = _nx_ny(r)
    x0 = min(max(int(math.floor((lon_min + 180.0) / 360.0 * nx)), 0), nx - 1)
    x1 = min(max(int(math.floor((lon_max + 180.0) / 360.0 * nx)), 0), nx - 1)
    y0 = min(max(int(math.floor((90.0 - lat_max) / 180.0 * ny)), 0), ny - 1)
    y1 = min(max(int(math.floor((90.0 - lat_min) / 180.0 * ny)), 0), ny - 1)
    return [from_rxy(r, x, y) for y in range(y0, y1 + 1) for x in range(x0, x1 + 1)]


# ---------------------------------------------------------------------------
# XYZ web-mercator tiles — georeader's actual tile scheme
# (read.py:437-491 via mercantile). Standard slippy-map math.
# ---------------------------------------------------------------------------

WEB_MERCATOR_R = 6378137.0


def xyz_tile(lon: float, lat: float, z: int) -> Tuple[int, int]:
    """(lon, lat) -> (x, y) tile indices at zoom z (OSM slippy scheme)."""
    n = 1 << z
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lat_rad = math.radians(lat)
    y = int(math.floor((1.0 - math.asinh(math.tan(lat_rad)) / math.pi) / 2.0 * n))
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def xyz_tile_bounds_mercator(x: int, y: int, z: int) -> Tuple[float, float, float, float]:
    """Tile -> (left, bottom, right, top) in EPSG:3857 meters
    (mercantile.xy_bounds analog used by read.py:485)."""
    n = 1 << z
    world = 2.0 * math.pi * WEB_MERCATOR_R
    left = -world / 2.0 + world * x / n
    right = -world / 2.0 + world * (x + 1) / n
    top = world / 2.0 - world * y / n
    bottom = world / 2.0 - world * (y + 1) / n
    return (left, bottom, right, top)
