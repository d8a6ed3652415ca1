"""NTv2 grid-shift datum transformations (the ``+nadgrids=`` path).

The reference reaches grid-shift datums through pyproj/PROJ, which
resolves ``+nadgrids=`` / EPSG grid transformations against installed
NTv2 files (e.g. NAD27->NAD83 NTv2_0.gsb, OSTN15 for OSGB) — see the
reference's blanket CRS delegation in
/root/reference/georeader/__init__.py:175-226.  This module implements
the same machinery from the public NTv2 format specification (the
format documented by Natural Resources Canada and implemented by
PROJ/GDAL): a binary parser, a writer (used both to synthesize test
fixtures and as a sink for derived correction grids), bilinear shift
interpolation with densest-subgrid selection, and the standard
fixed-point iterative inverse.

Format summary (public spec):

- 11 overview records, then per subgrid 11 header records + GS_COUNT
  node records.  Every record is 16 bytes: 8-byte ASCII name + 8-byte
  value (float64, int32+4 pad, or 8-char ASCII).
- All angular values are arc-seconds; **longitudes are positive WEST**.
- Node order: latitude rows from S_LAT northward; within a row,
  positive-west longitude from E_LONG increasing westward (longitude
  varies fastest).  Node = 4 x float32: lat shift, lon shift
  (positive west), lat accuracy, lon accuracy.
- Both big-endian (Canadian) and little-endian (Australian) files
  exist; detected from the NUM_OREC integer.

The shifts map SOURCE-datum geographic coordinates to TARGET-datum
ones (classically NAD27->NAD83): ``lat' = lat + dlat/3600``,
``lon' = lon - dlon/3600`` (sign flip because the stored shift is
positive-west while we carry east-positive longitudes).  The inverse
is the usual fixed-point iteration.  Consistent with PROJ, when a
CRS carries both ``nadgrids`` and ``towgs84`` the grid wins.

Executor note: grid files must be readable on every executor (ship
via ``spark-submit --files`` and reference the staged name), exactly
as PROJ grids are distributed for cluster runs.  Loaded grids are
cached per process.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "Ntv2Subgrid", "read_ntv2", "write_ntv2", "ntv2_forward",
    "ntv2_inverse", "load_grid",
]


@dataclass
class Ntv2Subgrid:
    """One NTv2 subgrid; angular fields in arc-seconds, positive-west
    longitudes, ``shifts[j, i] = (dlat, dlon_west)`` float32 seconds
    with j indexing latitude rows from S_LAT and i indexing
    positive-west longitude columns from E_LONG."""

    name: str
    parent: str
    s_lat: float
    n_lat: float
    e_lon: float      # positive-west seconds (easternmost = smallest)
    w_lon: float
    lat_inc: float
    lon_inc: float
    shifts: np.ndarray  # (nlat, nlon, 2) float32
    accuracies: Optional[np.ndarray] = None  # (nlat, nlon, 2) float32

    @property
    def nlat(self) -> int:
        return int(round((self.n_lat - self.s_lat) / self.lat_inc)) + 1

    @property
    def nlon(self) -> int:
        return int(round((self.w_lon - self.e_lon) / self.lon_inc)) + 1

    def contains(self, lat_sec, lonw_sec) -> np.ndarray:
        """Vectorized point-in-extent (inclusive edges)."""
        return ((lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
                & (lonw_sec >= self.e_lon) & (lonw_sec <= self.w_lon))


_INT_RECORDS = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
_STR_RECORDS = {"GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
                "SUB_NAME", "PARENT", "CREATED", "UPDATED"}


def _read_record(data: bytes, pos: int, endian: str):
    name = data[pos:pos + 8].decode("ascii", "replace").strip()
    raw = data[pos + 8:pos + 16]
    if name in _INT_RECORDS:
        value: Union[int, float, str] = struct.unpack(endian + "i", raw[:4])[0]
    elif name in _STR_RECORDS:
        value = raw.decode("ascii", "replace").strip()
    else:
        value = struct.unpack(endian + "d", raw)[0]
    return name, value, pos + 16


def read_ntv2(data: bytes) -> List[Ntv2Subgrid]:
    """Parse an NTv2 byte buffer into its subgrids.

    Endianness is auto-detected from NUM_OREC (always 11).  Raises
    ValueError on malformed headers rather than guessing.
    """
    if len(data) < 11 * 16:
        raise ValueError("NTv2: buffer shorter than the overview header")
    if data[:8].decode("ascii", "replace").strip() != "NUM_OREC":
        raise ValueError("NTv2: missing NUM_OREC leader")
    endian = None
    for cand in ("<", ">"):
        if struct.unpack(cand + "i", data[8:12])[0] == 11:
            endian = cand
            break
    if endian is None:
        raise ValueError("NTv2: NUM_OREC != 11 in either byte order")

    pos = 0
    overview: Dict[str, Union[int, float, str]] = {}
    for _ in range(11):
        name, value, pos = _read_record(data, pos, endian)
        overview[name] = value
    n_sub = int(overview.get("NUM_FILE", 0))
    gs_type = str(overview.get("GS_TYPE", "SECONDS")).upper()
    if gs_type != "SECONDS":
        raise ValueError(f"NTv2: unsupported GS_TYPE {gs_type!r} "
                         "(only SECONDS grids are published in practice)")
    if n_sub <= 0:
        raise ValueError("NTv2: NUM_FILE must be positive")

    subgrids: List[Ntv2Subgrid] = []
    for _ in range(n_sub):
        hdr: Dict[str, Union[int, float, str]] = {}
        for _ in range(11):
            name, value, pos = _read_record(data, pos, endian)
            hdr[name] = value
        count = int(hdr["GS_COUNT"])
        nlat = int(round((float(hdr["N_LAT"]) - float(hdr["S_LAT"]))
                         / float(hdr["LAT_INC"]))) + 1
        nlon = int(round((float(hdr["W_LONG"]) - float(hdr["E_LONG"]))
                         / float(hdr["LONG_INC"]))) + 1
        if count != nlat * nlon:
            raise ValueError(
                f"NTv2: GS_COUNT {count} != grid {nlat}x{nlon} in "
                f"subgrid {hdr.get('SUB_NAME')!r}")
        nodes = np.frombuffer(
            data, dtype=np.dtype(endian + "f4"), count=count * 4, offset=pos,
        ).reshape(nlat, nlon, 4)
        pos += count * 16
        subgrids.append(Ntv2Subgrid(
            name=str(hdr.get("SUB_NAME", "")),
            parent=str(hdr.get("PARENT", "NONE")),
            s_lat=float(hdr["S_LAT"]), n_lat=float(hdr["N_LAT"]),
            e_lon=float(hdr["E_LONG"]), w_lon=float(hdr["W_LONG"]),
            lat_inc=float(hdr["LAT_INC"]), lon_inc=float(hdr["LONG_INC"]),
            shifts=np.ascontiguousarray(nodes[:, :, :2]),
            accuracies=np.ascontiguousarray(nodes[:, :, 2:]),
        ))
    return subgrids


def _pack_record(name: str, value, endian: str) -> bytes:
    head = name.ljust(8)[:8].encode("ascii")
    if name in _INT_RECORDS:
        return head + struct.pack(endian + "i", int(value)) + b"\x00" * 4
    if name in _STR_RECORDS:
        return head + str(value).ljust(8)[:8].encode("ascii")
    return head + struct.pack(endian + "d", float(value))


def write_ntv2(subgrids: Sequence[Ntv2Subgrid], *, endian: str = "<",
               system_f: str = "SRC", system_t: str = "WGS84") -> bytes:
    """Serialize subgrids to NTv2 bytes (default little-endian, the
    Australian flavor; pass ``endian='>'`` for the Canadian one)."""
    out = [b"".join(_pack_record(n, v, endian) for n, v in (
        ("NUM_OREC", 11), ("NUM_SREC", 11), ("NUM_FILE", len(subgrids)),
        ("GS_TYPE", "SECONDS"), ("VERSION", "NTv2.0"),
        ("SYSTEM_F", system_f), ("SYSTEM_T", system_t),
        ("MAJOR_F", 6378137.0), ("MINOR_F", 6356752.314),
        ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314),
    ))]
    for g in subgrids:
        nlat, nlon = g.nlat, g.nlon
        if g.shifts.shape != (nlat, nlon, 2):
            raise ValueError(f"subgrid {g.name!r}: shifts shape "
                             f"{g.shifts.shape} != ({nlat}, {nlon}, 2)")
        out.append(b"".join(_pack_record(n, v, endian) for n, v in (
            ("SUB_NAME", g.name), ("PARENT", g.parent or "NONE"),
            ("CREATED", ""), ("UPDATED", ""),
            ("S_LAT", g.s_lat), ("N_LAT", g.n_lat),
            ("E_LONG", g.e_lon), ("W_LONG", g.w_lon),
            ("LAT_INC", g.lat_inc), ("LONG_INC", g.lon_inc),
            ("GS_COUNT", nlat * nlon),
        )))
        acc = (g.accuracies if g.accuracies is not None
               else np.full((nlat, nlon, 2), -1.0, np.float32))
        nodes = np.concatenate(
            [g.shifts.astype(np.float32), acc.astype(np.float32)], axis=2)
        if endian == ">":
            nodes = nodes.astype(">f4")
        else:
            nodes = nodes.astype("<f4")
        out.append(nodes.tobytes())
    return b"".join(out)


def _select_subgrid(subgrids: Sequence[Ntv2Subgrid], lat_sec, lonw_sec):
    """Per-point index of the densest containing subgrid (-1 outside
    all grids).  Matches PROJ: child grids refine their parents, so
    the smallest-cell containing grid wins."""
    order = sorted(range(len(subgrids)),
                   key=lambda k: (subgrids[k].lat_inc * subgrids[k].lon_inc))
    idx = np.full(np.shape(lat_sec), -1, np.int64)
    for k in order:
        unset = idx < 0
        if not unset.any():
            break
        inside = subgrids[k].contains(lat_sec, lonw_sec)
        idx[unset & inside] = k
    return idx


def _interp_shift(g: Ntv2Subgrid, lat_sec, lonw_sec):
    """Bilinear (dlat, dlon_west) arc-second shifts inside grid g."""
    fj = (lat_sec - g.s_lat) / g.lat_inc
    fi = (lonw_sec - g.e_lon) / g.lon_inc
    j0 = np.clip(np.floor(fj).astype(np.int64), 0, g.nlat - 2)
    i0 = np.clip(np.floor(fi).astype(np.int64), 0, g.nlon - 2)
    tj = np.clip(fj - j0, 0.0, 1.0)
    ti = np.clip(fi - i0, 0.0, 1.0)
    s = g.shifts.astype(np.float64)
    s00 = s[j0, i0]
    s01 = s[j0, i0 + 1]
    s10 = s[j0 + 1, i0]
    s11 = s[j0 + 1, i0 + 1]
    w00 = ((1 - tj) * (1 - ti))[..., None]
    w01 = ((1 - tj) * ti)[..., None]
    w10 = (tj * (1 - ti))[..., None]
    w11 = (tj * ti)[..., None]
    return s00 * w00 + s01 * w01 + s10 * w10 + s11 * w11


def ntv2_forward(lon, lat, subgrids: Sequence[Ntv2Subgrid],
                 *, strict: bool = False):
    """Source-datum -> target-datum geographic coordinates (degrees,
    east-positive).  Points outside every subgrid pass through
    unchanged (PROJ's default) unless ``strict`` raises instead."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lat_sec = lat * 3600.0
    lonw_sec = -lon * 3600.0
    idx = _select_subgrid(subgrids, lat_sec, lonw_sec)
    if strict and (idx < 0).any():
        raise ValueError("NTv2: point(s) outside every subgrid extent")
    dlat = np.zeros_like(lat)
    dlonw = np.zeros_like(lon)
    for k in np.unique(idx):
        if k < 0:
            continue
        m = idx == k
        sh = _interp_shift(subgrids[k], lat_sec[m], lonw_sec[m])
        dlat[m] = sh[..., 0]
        dlonw[m] = sh[..., 1]
    return lon - dlonw / 3600.0, lat + dlat / 3600.0


def ntv2_inverse(lon, lat, subgrids: Sequence[Ntv2Subgrid],
                 *, iters: int = 4, strict: bool = False):
    """Target-datum -> source-datum by fixed-point iteration (the
    standard NTv2 inverse; 4 iterations reach < 1e-12 deg for real
    shift magnitudes of a few arc-seconds)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    src_lon, src_lat = lon.copy(), lat.copy()
    for _ in range(iters):
        f_lon, f_lat = ntv2_forward(src_lon, src_lat, subgrids,
                                    strict=strict)
        src_lon = src_lon - (f_lon - lon)
        src_lat = src_lat - (f_lat - lat)
    return src_lon, src_lat


_GRID_CACHE: Dict[str, List[Ntv2Subgrid]] = {}


def load_grid(path: str) -> List[Ntv2Subgrid]:
    """Load (and per-process cache) an NTv2 file.  On a cluster the
    file must exist on every executor — ship with --files."""
    grids = _GRID_CACHE.get(path)
    if grids is None:
        with open(path, "rb") as f:
            grids = read_ntv2(f.read())
        _GRID_CACHE[path] = grids
    return grids
