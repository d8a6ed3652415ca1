"""Minimal tiled-GeoTIFF encode/decode in pure Python (+numpy/zlib) —
the real-bytes half of the reference's raster I/O:

- ``GeoTensor.load_bytes`` (/root/reference/georeader/geotensor.py:2165-2214)
  opens an in-memory GeoTIFF via rasterio MemoryFile; here
  :func:`decode_geotiff` parses the bytes directly.
- ``save_cog`` (/root/reference/georeader/save.py:327-449) writes a COG
  (tiled + overview IFDs); here :func:`encode_geotiff` emits a classic
  little-endian tiled TIFF with deflate compression, band-separate
  planes, GeoTIFF georeferencing tags, and optional reduced-resolution
  overview IFDs in COG layout (all IFDs before any tile data).

Scope: what this engine emits it can read back bit-for-bit, plus the
baseline variants a reader meets in practice — uncompressed or
deflate, tiled, uint8/int16/uint16/int32/float32/float64, single or
multi band (PlanarConfiguration=2), north-up geotransform via
ModelPixelScale+ModelTiepoint or full ModelTransformation (rotated
grids). The TIFF 6.0 and OGC GeoTIFF structures are public
specifications. No GDAL/rasterio/PIL in this environment.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from .affine import Affine

# TIFF tag ids
_T_IMAGE_WIDTH = 256
_T_IMAGE_LENGTH = 257
_T_BITS_PER_SAMPLE = 258
_T_COMPRESSION = 259  # 1 = none, 8 = deflate (Adobe)
_T_PHOTOMETRIC = 262
_T_SAMPLES_PER_PIXEL = 277
_T_PLANAR_CONFIG = 284  # 2 = separate planes (band-sequential)
_T_NEW_SUBFILE_TYPE = 254  # 1 = reduced-resolution (overview)
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTE_COUNTS = 325
_T_SAMPLE_FORMAT = 339  # 1 = uint, 2 = int, 3 = float
_T_STRIP_OFFSETS = 273
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_PREDICTOR = 317  # 2 = horizontal differencing
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922
_T_MODEL_TRANSFORMATION = 34264
_T_GEO_KEY_DIRECTORY = 34735
_T_GDAL_NODATA = 42113

# TIFF field types
_FT_SHORT, _FT_LONG, _FT_RATIONAL, _FT_DOUBLE, _FT_ASCII = 3, 4, 5, 12, 2
_FT_SIZE = {_FT_SHORT: 2, _FT_LONG: 4, _FT_DOUBLE: 8, _FT_ASCII: 1}

_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("int16"): (16, 2),
    np.dtype("uint16"): (16, 1),
    np.dtype("int32"): (32, 2),
    np.dtype("float32"): (32, 3),
    np.dtype("float64"): (64, 3),
}
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}


def _geokeys(crs_epsg: Optional[int]) -> List[int]:
    """GeoKeyDirectory: version 1.1.0 + model type + CS type."""
    if crs_epsg is None:
        return []
    if crs_epsg == 4326:
        keys = [(1024, 0, 1, 2), (2048, 0, 1, 4326)]
    else:
        keys = [(1024, 0, 1, 1), (3072, 0, 1, int(crs_epsg))]
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


class _IfdBuilder:
    """One image (or overview) IFD: fixed-size entries + an out-of-line
    value area; tile data offsets are patched in at assembly time."""

    def __init__(self):
        self.entries: List[Tuple[int, int, int, bytes]] = []

    def add(self, tag: int, ftype: int, values) -> None:
        if isinstance(values, (int, float)):
            values = [values]
        if ftype == _FT_SHORT:
            data = struct.pack(f"<{len(values)}H", *[int(v) for v in values])
        elif ftype == _FT_LONG:
            data = struct.pack(f"<{len(values)}I", *[int(v) for v in values])
        elif ftype == _FT_DOUBLE:
            data = struct.pack(f"<{len(values)}d", *[float(v) for v in values])
        elif ftype == _FT_ASCII:
            data = values[0].encode() + b"\x00"
            values = data
        else:
            raise ValueError(f"unsupported field type {ftype}")
        self.entries.append((tag, ftype, len(values), data))

    def size(self) -> int:
        """Bytes for the entry table + pointer + out-of-line values."""
        n = 2 + 12 * len(self.entries) + 4
        for _, _, count, data in self.entries:
            if len(data) > 4:
                n += len(data) + (len(data) & 1)
        return n

    def render(self, my_off: int, next_ifd_off: int) -> bytes:
        head = struct.pack("<H", len(self.entries))
        tail = b""
        val_off = my_off + 2 + 12 * len(self.entries) + 4
        body = b""
        for tag, ftype, count, data in sorted(self.entries):
            if len(data) <= 4:
                body += struct.pack("<HHI", tag, ftype, count) + data.ljust(4, b"\x00")
            else:
                body += struct.pack("<HHII", tag, ftype, count, val_off + len(tail))
                pad = data + (b"\x00" if len(data) & 1 else b"")
                tail += pad
        return head + body + struct.pack("<I", next_ifd_off) + tail


def _tile_grid(h: int, w: int, tile: int) -> Tuple[int, int]:
    return (h + tile - 1) // tile, (w + tile - 1) // tile


def _encode_level(
    bands: np.ndarray, tile: int, compress: bool
) -> Tuple[List[bytes], int, int]:
    """Band-separate tile payloads (band-major order, as PlanarConfig=2
    requires) for one resolution level."""
    nb, h, w = bands.shape
    tr, tc = _tile_grid(h, w, tile)
    payloads = []
    for b in range(nb):
        for i in range(tr):
            for j in range(tc):
                block = np.zeros((tile, tile), dtype=bands.dtype)
                ys, xs = i * tile, j * tile
                sub = bands[b, ys : ys + tile, xs : xs + tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                raw = block.tobytes()
                payloads.append(zlib.compress(raw, 6) if compress else raw)
    return payloads, tr, tc


def encode_geotiff(
    bands: np.ndarray,
    transform: Affine,
    crs_epsg: Optional[int] = None,
    tile: int = 256,
    compress: bool = True,
    nodata: Optional[float] = None,
    overview_levels: int = 0,
) -> bytes:
    """Encode (bands, h, w) as a tiled GeoTIFF; ``overview_levels`` > 0
    appends 2x block-mean reduced-resolution IFDs in COG layout
    (reference save_cog, save.py:327-449)."""
    bands = np.asarray(bands)
    if bands.ndim == 2:
        bands = bands[None]
    if bands.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {bands.dtype}")
    bits, fmt = _DTYPES[bands.dtype]

    levels = [bands]
    for _ in range(overview_levels):
        prev = levels[-1]
        nb, h, w = prev.shape
        h2, w2 = h // 2, w // 2
        if h2 < 1 or w2 < 1:
            break
        red = (
            prev[:, : h2 * 2, : w2 * 2]
            .reshape(nb, h2, 2, w2, 2)
            .astype(np.float64)
            .mean(axis=(2, 4))
            .astype(prev.dtype)
        )
        levels.append(red)

    ifds: List[_IfdBuilder] = []
    level_payloads: List[List[bytes]] = []
    for li, lv in enumerate(levels):
        nb, h, w = lv.shape
        payloads, tr, tc = _encode_level(lv, tile, compress)
        level_payloads.append(payloads)
        ifd = _IfdBuilder()
        if li > 0:
            ifd.add(_T_NEW_SUBFILE_TYPE, _FT_LONG, 1)
        ifd.add(_T_IMAGE_WIDTH, _FT_LONG, w)
        ifd.add(_T_IMAGE_LENGTH, _FT_LONG, h)
        ifd.add(_T_BITS_PER_SAMPLE, _FT_SHORT, [bits] * nb)
        ifd.add(_T_COMPRESSION, _FT_SHORT, 8 if compress else 1)
        ifd.add(_T_PHOTOMETRIC, _FT_SHORT, 1)
        ifd.add(_T_SAMPLES_PER_PIXEL, _FT_SHORT, nb)
        ifd.add(_T_PLANAR_CONFIG, _FT_SHORT, 2)
        ifd.add(_T_TILE_WIDTH, _FT_SHORT, tile)
        ifd.add(_T_TILE_LENGTH, _FT_SHORT, tile)
        ifd.add(_T_SAMPLE_FORMAT, _FT_SHORT, [fmt] * nb)
        # offsets patched later; reserve with zeros
        ifd.add(_T_TILE_OFFSETS, _FT_LONG, [0] * len(payloads))
        ifd.add(_T_TILE_BYTE_COUNTS, _FT_LONG, [len(p) for p in payloads])
        if li == 0:
            t = transform
            if t.b == 0.0 and t.d == 0.0:
                ifd.add(_T_MODEL_PIXEL_SCALE, _FT_DOUBLE, [t.a, -t.e, 0.0])
                ifd.add(_T_MODEL_TIEPOINT, _FT_DOUBLE,
                        [0.0, 0.0, 0.0, t.c, t.f, 0.0])
            else:  # rotated/sheared: full 4x4 model transformation
                ifd.add(_T_MODEL_TRANSFORMATION, _FT_DOUBLE, [
                    t.a, t.b, 0.0, t.c,
                    t.d, t.e, 0.0, t.f,
                    0.0, 0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0, 1.0,
                ])
            gk = _geokeys(crs_epsg)
            if gk:
                ifd.add(_T_GEO_KEY_DIRECTORY, _FT_SHORT, gk)
            if nodata is not None:
                ifd.add(_T_GDAL_NODATA, _FT_ASCII, [repr(float(nodata))])
        ifds.append(ifd)

    # COG layout: header, all IFDs, then all tile data (level order)
    off = 8
    ifd_offsets = []
    for ifd in ifds:
        ifd_offsets.append(off)
        off += ifd.size() + (off + ifd.size()) % 2

    data_off = off
    all_offsets: List[List[int]] = []
    for payloads in level_payloads:
        offs = []
        for p in payloads:
            offs.append(data_off)
            data_off += len(p) + (len(p) & 1)
        all_offsets.append(offs)

    # patch tile offsets now that positions are known
    for ifd, offs in zip(ifds, all_offsets):
        for k, e in enumerate(ifd.entries):
            if e[0] == _T_TILE_OFFSETS:
                ifd.entries[k] = (
                    _T_TILE_OFFSETS, _FT_LONG, len(offs),
                    struct.pack(f"<{len(offs)}I", *offs),
                )

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_offsets[0]))
    for i, ifd in enumerate(ifds):
        nxt = ifd_offsets[i + 1] if i + 1 < len(ifds) else 0
        rendered = ifd.render(ifd_offsets[i], nxt)
        out += b"\x00" * (ifd_offsets[i] - len(out))
        out += rendered
    out += b"\x00" * (off - len(out))
    for payloads in level_payloads:
        for p in payloads:
            out += p
            if len(p) & 1:
                out += b"\x00"
    return bytes(out)


def _read_ifd(buf: bytes, off: int) -> Tuple[Dict[int, list], int]:
    (n,) = struct.unpack_from("<H", buf, off)
    tags: Dict[int, list] = {}
    for i in range(n):
        tag, ftype, count = struct.unpack_from("<HHI", buf, off + 2 + 12 * i)
        voff_pos = off + 2 + 12 * i + 8
        size = _FT_SIZE.get(ftype, 4) * count
        if size <= 4:
            pos = voff_pos
        else:
            (pos,) = struct.unpack_from("<I", buf, voff_pos)
        if ftype == _FT_SHORT:
            vals = list(struct.unpack_from(f"<{count}H", buf, pos))
        elif ftype == _FT_LONG:
            vals = list(struct.unpack_from(f"<{count}I", buf, pos))
        elif ftype == _FT_DOUBLE:
            vals = list(struct.unpack_from(f"<{count}d", buf, pos))
        elif ftype == _FT_ASCII:
            vals = [buf[pos : pos + count].split(b"\x00")[0].decode()]
        else:
            vals = []
        tags[tag] = vals
    (nxt,) = struct.unpack_from("<I", buf, off + 2 + 12 * n)
    return tags, nxt


def decode_geotiff(
    buf: bytes, overview: int = 0
) -> Tuple[np.ndarray, Affine, Optional[int], Optional[float]]:
    """Decode a (subset-of-)GeoTIFF: returns (bands[nb,h,w], transform,
    epsg, nodata). ``overview`` selects a reduced-resolution IFD
    (0 = full resolution), the reader half of the LOD path."""
    if buf[:4] not in (b"II*\x00",):
        raise ValueError("not a little-endian classic TIFF")
    (first_ifd,) = struct.unpack_from("<I", buf, 4)
    ifds = []
    off = first_ifd
    while off:
        tags, off = _read_ifd(buf, off)
        ifds.append(tags)
    if overview >= len(ifds):
        raise ValueError(f"overview {overview} not present ({len(ifds)} IFDs)")
    tags = ifds[overview]
    w = tags[_T_IMAGE_WIDTH][0]
    h = tags[_T_IMAGE_LENGTH][0]
    nb = tags.get(_T_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags[_T_BITS_PER_SAMPLE][0]
    fmt = tags.get(_T_SAMPLE_FORMAT, [1])[0]
    comp = tags.get(_T_COMPRESSION, [1])[0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp}")
    planar = tags.get(_T_PLANAR_CONFIG, [1])[0]
    dtype = _DTYPES_INV.get((bits, fmt))
    if dtype is None:
        raise ValueError(f"unsupported sample type bits={bits} fmt={fmt}")
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")

    def _undiff(arr: np.ndarray) -> np.ndarray:
        """Predictor=2 (horizontal differencing, GDAL's default for
        deflate): cumulative-sum each row per interleaved sample."""
        if predictor != 2:
            return arr
        a = arr.astype(np.int64) if arr.dtype.kind in "iu" else arr
        a = np.cumsum(a, axis=-1, dtype=a.dtype if a.dtype.kind == "f" else np.int64)
        return a.astype(arr.dtype)

    # nodata comes from the FULL-RES IFD (needed up front: sparse
    # tiles — offset=0/bytecount=0, the COG empty-block convention —
    # read as nodata, matching GDAL)
    nodata = None
    nd = ifds[0].get(_T_GDAL_NODATA)
    if nd:
        try:
            nodata = float(nd[0])
        except ValueError:
            pass
    fill = 0
    if nodata is not None:
        if np.isnan(nodata):
            fill = np.nan if np.dtype(dtype).kind == "f" else 0
        else:
            try:
                fill = np.asarray(nodata).astype(dtype)
                if float(fill) != float(nodata):
                    fill = 0  # nodata not representable in dtype
            except (ValueError, OverflowError):
                fill = 0
    out = np.full((nb, h, w), fill, dtype=dtype)
    if _T_TILE_WIDTH in tags:
        tw, th = tags[_T_TILE_WIDTH][0], tags[_T_TILE_LENGTH][0]
        offs, counts = tags[_T_TILE_OFFSETS], tags[_T_TILE_BYTE_COUNTS]
        tr = (h + th - 1) // th
        tc = (w + tw - 1) // tw
        tiles_per_band = tr * tc
        for k, (o, c) in enumerate(zip(offs, counts)):
            if c == 0:
                continue  # sparse tile: stays at the fill value
            raw = buf[o : o + c]
            if comp == 8:
                raw = zlib.decompress(raw)
            if planar == 2 or nb == 1:
                b, rem = (divmod(k, tiles_per_band) if planar == 2 else (0, k))
                block = np.frombuffer(raw, dtype=dtype).reshape(th, tw)
                block = _undiff(block)
                i, j = divmod(rem, tc)
                ys, xs = i * th, j * tw
                sub = block[: min(th, h - ys), : min(tw, w - xs)]
                out[b, ys : ys + sub.shape[0], xs : xs + sub.shape[1]] = sub
            else:  # chunky multi-band tile: (th, tw, nb) interleave
                block = np.frombuffer(raw, dtype=dtype).reshape(th, tw, nb)
                if predictor == 2:
                    block = np.stack(
                        [_undiff(block[:, :, s]) for s in range(nb)], axis=2
                    )
                i, j = divmod(k, tc)
                ys, xs = i * th, j * tw
                sub = block[: min(th, h - ys), : min(tw, w - xs), :]
                out[:, ys : ys + sub.shape[0], xs : xs + sub.shape[1]] = (
                    sub.transpose(2, 0, 1)
                )
    elif _T_STRIP_OFFSETS in tags:
        rps = tags.get(_T_ROWS_PER_STRIP, [h])[0]
        offs, counts = tags[_T_STRIP_OFFSETS], tags[_T_STRIP_BYTE_COUNTS]
        strips_per_band = (h + rps - 1) // rps
        for k, (o, c) in enumerate(zip(offs, counts)):
            if c == 0:
                continue  # sparse strip: stays at the fill value
            raw = buf[o : o + c]
            if comp == 8:
                raw = zlib.decompress(raw)
            if planar == 2 or nb == 1:
                b, si = (divmod(k, strips_per_band) if planar == 2 else (0, k))
                ys = si * rps
                rows_here = min(rps, h - ys)
                block = np.frombuffer(raw, dtype=dtype).reshape(rows_here, w)
                out[b, ys : ys + rows_here] = _undiff(block)
            else:  # chunky multi-band strip: (rows, w, nb)
                ys = k * rps
                rows_here = min(rps, h - ys)
                block = np.frombuffer(raw, dtype=dtype).reshape(rows_here, w, nb)
                if predictor == 2:
                    block = np.stack(
                        [_undiff(block[:, :, s]) for s in range(nb)], axis=2
                    )
                out[:, ys : ys + rows_here] = block.transpose(2, 0, 1)
    else:
        raise ValueError("TIFF has neither tile nor strip offsets")

    # georeferencing from the FULL-RES IFD (overviews share it), scaled
    base = ifds[0]
    if _T_MODEL_TRANSFORMATION in base:
        m = base[_T_MODEL_TRANSFORMATION]
        t = Affine(m[0], m[1], m[3], m[4], m[5], m[7])
    elif _T_MODEL_PIXEL_SCALE in base and _T_MODEL_TIEPOINT in base:
        sx, sy = base[_T_MODEL_PIXEL_SCALE][0], base[_T_MODEL_PIXEL_SCALE][1]
        tp = base[_T_MODEL_TIEPOINT]
        ox = tp[3] - tp[0] * sx
        oy = tp[4] + tp[1] * sy
        t = Affine(sx, 0.0, ox, 0.0, -sy, oy)
    else:
        t = Affine.identity()
    if overview > 0:
        base_w = base[_T_IMAGE_WIDTH][0]
        f = base_w / w
        t = Affine(t.a * f, t.b * f, t.c, t.d * f, t.e * f, t.f)

    epsg = None
    gk = base.get(_T_GEO_KEY_DIRECTORY)
    if gk:
        n_keys = gk[3]
        for i in range(n_keys):
            kid, _, _, val = gk[4 + 4 * i : 8 + 4 * i]
            if kid in (3072, 2048):
                epsg = val
    return out, t, epsg, nodata
