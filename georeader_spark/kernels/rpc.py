"""Rational Polynomial Coefficient (RPC) camera model — the last §2
gap (reference ``read_rpcs``, /root/reference/georeader/read.py:1870-1976,
which delegates to rasterio.warp with an ``rpcs=`` kwarg; the
underlying model is the public RPC00B standard: image coordinates as
ratios of 20-term cubic polynomials in normalized ground coordinates).

The georeferencing shape the reference computes is dst-grid-centric:
for every destination pixel, ground coordinates come from the dst
transform and the FORWARD model (image-from-ground) gives the source
pixel to gather — the same GLT/gather pattern as
``raster.reproject_nearest``. Only the forward model is needed for the
warp; an iterative inverse (ground-from-image, Newton on the 2x2
Jacobian) is provided for the planner (footprint estimation).

The 20-term polynomial uses the RPC00B term order:

    1, L, P, H, LP, LH, PH, L^2, P^2, H^2,
    PLH, L^3, LP^2, LH^2, L^2P, P^3, PH^2, L^2H, P^2H, H^3

with L = normalized lon, P = normalized lat, H = normalized height.

Everything here is pure numpy (no GDAL/rasterio) so the same
arithmetic can be emitted three ways: this kernel (tests), Spark
Column expressions (JVM codegen hot path, operators/raster.read_rpcs)
and a DuckDB SQL string (the driver oracle) — all generated from one
coefficient list so they cannot drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np

#: (exponent of L, exponent of P, exponent of H) per RPC00B term, in order.
TERM_EXPONENTS: List[Tuple[int, int, int]] = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0),
    (0, 2, 0), (0, 0, 2), (1, 1, 1), (3, 0, 0),
    (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
]


@dataclass(frozen=True)
class RPC:
    """RPC00B parameter block (rasterio.rpc.RPC field-for-field, minus
    the I/O; reference builds one at readers/enmap.py:199-230)."""

    line_off: float
    line_scale: float
    samp_off: float
    samp_scale: float
    lat_off: float
    lat_scale: float
    lon_off: float
    lon_scale: float
    height_off: float
    height_scale: float
    line_num: Tuple[float, ...] = field(default=())
    line_den: Tuple[float, ...] = field(default=())
    samp_num: Tuple[float, ...] = field(default=())
    samp_den: Tuple[float, ...] = field(default=())

    def __post_init__(self):
        for name in ("line_num", "line_den", "samp_num", "samp_den"):
            c = tuple(float(v) for v in getattr(self, name))
            if len(c) != 20:
                raise ValueError(f"{name} must have 20 coefficients, got {len(c)}")
            object.__setattr__(self, name, c)


def poly20(coefs: Sequence[float], L, P, H):
    """Evaluate one 20-term RPC00B polynomial (vectorized).

    Terms are accumulated strictly in RPC00B order with left-to-right
    addition so the Spark-expression and SQL twins (built from the
    same list, in the same order) produce bit-identical doubles.
    """
    L = np.asarray(L, dtype=np.float64)
    P = np.asarray(P, dtype=np.float64)
    H = np.asarray(H, dtype=np.float64)
    out = np.zeros(np.broadcast(L, P, H).shape, dtype=np.float64)
    for c, (el, ep, eh) in zip(coefs, TERM_EXPONENTS):
        if c == 0.0:
            continue
        # repeated multiplication, never pow(): the Spark-expression and
        # SQL twins multiply factor by factor, and pow(x, 3) is not
        # guaranteed to equal x*x*x in the last ulp
        term = np.full_like(out, c)
        for _ in range(el):
            term = term * L
        for _ in range(ep):
            term = term * P
        for _ in range(eh):
            term = term * H
        out = out + term
    return out


def normalize_ground(rpc: RPC, lon, lat, height):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    height = np.asarray(height, dtype=np.float64)
    L = (lon - rpc.lon_off) / rpc.lon_scale
    P = (lat - rpc.lat_off) / rpc.lat_scale
    H = (height - rpc.height_off) / rpc.height_scale
    return L, P, H


def image_from_ground(rpc: RPC, lon, lat, height=0.0):
    """FORWARD RPC model: ground (lon, lat, h in EPSG:4326) -> image
    (row, col) in pixel units, pixel centers at integers. This is the
    only direction the warp gather needs."""
    L, P, H = normalize_ground(rpc, lon, lat, height)
    rn = poly20(rpc.line_num, L, P, H) / poly20(rpc.line_den, L, P, H)
    cn = poly20(rpc.samp_num, L, P, H) / poly20(rpc.samp_den, L, P, H)
    row = rn * rpc.line_scale + rpc.line_off
    col = cn * rpc.samp_scale + rpc.samp_off
    return row, col


def ground_from_image(rpc: RPC, row, col, height=0.0, iters: int = 12):
    """Inverse model by Newton iteration on the forward polynomials
    (the direction GDAL iterates too — RPCs only publish forward
    coefficients). Used by the planner for footprint estimation, not
    by the per-pixel gather. Converges quadratically for any
    well-conditioned RPC; ~1e-12 deg after a handful of iterations."""
    row = np.asarray(row, dtype=np.float64)
    col = np.asarray(col, dtype=np.float64)
    lon = np.full(np.broadcast(row, col).shape, rpc.lon_off, dtype=np.float64)
    lat = np.full_like(lon, rpc.lat_off)
    eps_lon = max(abs(rpc.lon_scale) * 1e-7, 1e-9)
    eps_lat = max(abs(rpc.lat_scale) * 1e-7, 1e-9)
    for _ in range(iters):
        r0, c0 = image_from_ground(rpc, lon, lat, height)
        fr, fc = r0 - row, c0 - col
        r_dlon, c_dlon = image_from_ground(rpc, lon + eps_lon, lat, height)
        r_dlat, c_dlat = image_from_ground(rpc, lon, lat + eps_lat, height)
        j00 = (r_dlon - r0) / eps_lon   # d row / d lon
        j01 = (r_dlat - r0) / eps_lat   # d row / d lat
        j10 = (c_dlon - c0) / eps_lon   # d col / d lon
        j11 = (c_dlat - c0) / eps_lat   # d col / d lat
        det = j00 * j11 - j01 * j10
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        lon = lon - (j11 * fr - j01 * fc) / det
        lat = lat - (-j10 * fr + j00 * fc) / det
    return lon, lat


def rpc_from_affine(a: float, b: float, c: float, d: float, e: float, f: float,
                    lon_off: float = 0.0, lon_scale: float = 1.0,
                    lat_off: float = 0.0, lat_scale: float = 1.0) -> RPC:
    """Degenerate RPC encoding an exact affine ground->image map
    ``col = a*lon + b*lat + c; row = d*lon + e*lat + f`` (denominator
    identically 1, numerator linear). Gives the kernel an exact
    analytic oracle in tests."""
    z = [0.0] * 20
    line_num = list(z)
    samp_num = list(z)
    den = list(z)
    den[0] = 1.0
    # row = d*lon + e*lat + f, with lon = L*lon_scale + lon_off etc.
    line_num[0] = d * lon_off + e * lat_off + f
    line_num[1] = d * lon_scale
    line_num[2] = e * lat_scale
    samp_num[0] = a * lon_off + b * lat_off + c
    samp_num[1] = a * lon_scale
    samp_num[2] = b * lat_scale
    return RPC(
        line_off=0.0, line_scale=1.0, samp_off=0.0, samp_scale=1.0,
        lat_off=lat_off, lat_scale=lat_scale,
        lon_off=lon_off, lon_scale=lon_scale,
        height_off=0.0, height_scale=1.0,
        line_num=tuple(line_num), line_den=tuple(den),
        samp_num=tuple(samp_num), samp_den=tuple(den),
    )


def poly20_sql(coefs: Sequence[float], l_expr: str, p_expr: str,
               h_expr: str = "0.0") -> str:
    """ANSI-SQL string evaluating the same polynomial in the same term
    and accumulation order (for the DuckDB oracle)."""
    parts = []
    for c, (el, ep, eh) in zip(coefs, TERM_EXPONENTS):
        if c == 0.0:
            continue
        factors = [repr(float(c))]
        factors += [f"({l_expr})"] * el
        factors += [f"({p_expr})"] * ep
        factors += [f"({h_expr})"] * eh
        parts.append(" * ".join(factors))
    if not parts:
        return "0.0"
    return "(" + " + ".join(parts) + ")"
