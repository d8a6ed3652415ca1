"""Remote / VSI-shaped byte-range ingestion.

The reference reads cloud rasters through GDAL's virtual filesystem:
``_vsi_path`` maps URLs to ``/vsicurl`` / ``/vsis3`` / ... paths
(/root/reference/georeader/geotensor.py:194-219) and the GDAL env
defaults request ranged HTTP with consecutive-range merging
(``GDAL_HTTP_MERGE_CONSECUTIVE_RANGES``, geotensor.py:185-192). A
windowed read then touches only the byte ranges of the tiles the
window intersects — that, not whole-file download, is what makes
windowed reads over a 100 TB object store viable.

This module re-expresses that machinery without GDAL:

- :func:`vsi_path` — the URL→VSI mapping itself, kept for parity and
  for handing paths to GDAL-side consumers.
- :class:`ByteSource` and friends — a minimal ranged-read interface
  (``size()`` / ``read(offset, n)``) over local files, in-memory
  buffers, and HTTP servers that honor ``Range`` headers. Object-store
  schemes (s3/gs/az/oss) raise with a clear message unless ``fsspec``
  is importable — this sandbox has no object store, and the honest
  boundary mirrors operators/multimodal.py's codec gate.
- :func:`merge_ranges` — the MERGE_CONSECUTIVE_RANGES analog: tile
  ranges closer than ``max_gap`` coalesce into one request.
- :class:`RangedGeoTiff` — a lazy GeoTIFF opener over a ByteSource:
  the IFD chain is parsed from an incrementally-fetched header prefix
  (the ``RasterioReader`` lazy-open analog, geotensor.py:~226), and
  :meth:`RangedGeoTiff.read_window` fetches + decodes ONLY the tiles
  a window needs (the ``RasterioReader.read`` windowed analog).
- :func:`scan_windows` — the Spark surface: a DataFrame of
  (path, window) requests decoded executor-side with ``mapInPandas``;
  each task opens its own sources, so at 1000 executors the ranged
  fetches fan out with the tasks and nothing routes through the
  driver.
"""

from __future__ import annotations

import os
import struct
import warnings
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..kernels.affine import Affine
from ..kernels.geotiff import (
    _DTYPES_INV,
    _read_ifd,
    _T_BITS_PER_SAMPLE,
    _T_COMPRESSION,
    _T_GDAL_NODATA,
    _T_GEO_KEY_DIRECTORY,
    _T_IMAGE_LENGTH,
    _T_IMAGE_WIDTH,
    _T_MODEL_PIXEL_SCALE,
    _T_MODEL_TIEPOINT,
    _T_MODEL_TRANSFORMATION,
    _T_PLANAR_CONFIG,
    _T_PREDICTOR,
    _T_SAMPLE_FORMAT,
    _T_SAMPLES_PER_PIXEL,
    _T_TILE_BYTE_COUNTS,
    _T_TILE_LENGTH,
    _T_TILE_OFFSETS,
    _T_TILE_WIDTH,
)

_CLOUD_SCHEMES = ("s3", "gs", "az", "oss")


def vsi_path(path: str) -> str:
    """URL → GDAL VSI path, same mapping as the reference's
    ``_vsi_path`` (geotensor.py:194-219): http(s) → ``/vsicurl/url``,
    s3/gs/az/oss → ``/vsi<scheme>/rest``, no scheme → unchanged,
    unknown scheme → warn and return unchanged."""
    if "://" not in path:
        return path
    protocol, remainder = path.split("://", 1)
    if path.startswith("http"):
        return f"/vsicurl/{path}"
    if protocol in _CLOUD_SCHEMES:
        return f"/vsi{protocol}/{remainder}"
    warnings.warn(f"Protocol {protocol} not recognized. Returning the original path")
    return path


def merge_ranges(
    ranges: Sequence[Tuple[int, int]], max_gap: int = 4096
) -> List[Tuple[int, int]]:
    """Coalesce (offset, size) ranges whose gap is <= ``max_gap`` into
    single requests (GDAL_HTTP_MERGE_CONSECUTIVE_RANGES): per-request
    latency dominates small reads on object stores, so fetching a few
    wasted KB between adjacent tiles is cheaper than a second round
    trip. Returns merged ranges sorted by offset."""
    if not ranges:
        return []
    srt = sorted(ranges)
    out = [list(srt[0])]
    for off, size in srt[1:]:
        end = out[-1][0] + out[-1][1]
        if off <= end + max_gap:
            out[-1][1] = max(end, off + size) - out[-1][0]
        else:
            out.append([off, size])
    return [(o, s) for o, s in out]


class ByteSource:
    """Ranged-read interface. Implementations count requests and bytes
    so tests (and lineage metrics) can assert the ranged path really
    avoided a whole-file fetch."""

    n_requests: int = 0
    bytes_fetched: int = 0

    def size(self) -> int:
        raise NotImplementedError

    def read(self, offset: int, n: int) -> bytes:
        raise NotImplementedError

    def close(self) -> None:
        pass


class MemoryByteSource(ByteSource):
    def __init__(self, buf: bytes):
        self._buf = buf
        self.n_requests = 0
        self.bytes_fetched = 0

    def size(self) -> int:
        return len(self._buf)

    def read(self, offset: int, n: int) -> bytes:
        self.n_requests += 1
        chunk = self._buf[offset : offset + n]
        self.bytes_fetched += len(chunk)
        return chunk


class LocalFileSource(ByteSource):
    """``file://`` / plain-path source (seek+read, no mmap — the shape
    matches the remote sources so tests exercise the same code path)."""

    def __init__(self, path: str):
        if path.startswith("file://"):
            path = path[len("file://") :]
        self._path = path
        self._size = os.path.getsize(path)
        self._f = open(path, "rb")
        self.n_requests = 0
        self.bytes_fetched = 0

    def size(self) -> int:
        return self._size

    def read(self, offset: int, n: int) -> bytes:
        self.n_requests += 1
        self._f.seek(offset)
        chunk = self._f.read(n)
        self.bytes_fetched += len(chunk)
        return chunk

    def close(self) -> None:
        self._f.close()


class HTTPRangeSource(ByteSource):
    """HTTP(S) source via ``Range: bytes=a-b`` requests (the
    ``/vsicurl`` analog). Uses stdlib urllib — no extra deps. The
    server must honor Range (206); a 200 full-body reply raises, since
    silently downloading the whole object defeats the point."""

    def __init__(self, url: str, timeout: float = 30.0):
        self._url = url
        self._timeout = timeout
        self._size: Optional[int] = None
        self.n_requests = 0
        self.bytes_fetched = 0

    def size(self) -> int:
        import urllib.request

        if self._size is None:
            req = urllib.request.Request(self._url, method="HEAD")
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                cl = resp.headers.get("Content-Length")
                if cl is None:
                    raise IOError(f"no Content-Length from {self._url}")
                self._size = int(cl)
        return self._size

    def read(self, offset: int, n: int) -> bytes:
        import urllib.request

        req = urllib.request.Request(
            self._url, headers={"Range": f"bytes={offset}-{offset + n - 1}"}
        )
        with urllib.request.urlopen(req, timeout=self._timeout) as resp:
            if resp.status != 206:
                raise IOError(
                    f"{self._url} ignored Range header (HTTP {resp.status}); "
                    "ranged reads require a Range-capable server"
                )
            chunk = resp.read()
        self.n_requests += 1
        self.bytes_fetched += len(chunk)
        return chunk


def open_byte_source(path: str) -> ByteSource:
    """Scheme-dispatched source factory (the ``_vsi_path`` decision
    tree as code): plain/file → local, http(s) → ranged HTTP,
    s3/gs/az/oss → fsspec if importable else a clear raise."""
    if "://" not in path or path.startswith("file://"):
        return LocalFileSource(path)
    protocol = path.split("://", 1)[0]
    if protocol in ("http", "https"):
        return HTTPRangeSource(path)
    if protocol in _CLOUD_SCHEMES:
        try:
            import fsspec  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                f"{protocol}:// needs fsspec (not installed in this "
                "environment); ranged-read semantics are identical to "
                "HTTPRangeSource — install fsspec or serve the object "
                "over a Range-capable HTTP endpoint"
            )
        return _FsspecSource(path)
    raise ValueError(f"unrecognized scheme {protocol}:// in {path}")


class _FsspecSource(ByteSource):
    """Object-store source through fsspec's cat_ranges (s3/gs/az/oss).
    Only reachable when fsspec is importable — see open_byte_source."""

    def __init__(self, path: str):
        import fsspec

        self._fs, self._path = fsspec.core.url_to_fs(path)
        self._size = self._fs.size(self._path)
        self.n_requests = 0
        self.bytes_fetched = 0

    def size(self) -> int:
        return self._size

    def read(self, offset: int, n: int) -> bytes:
        self.n_requests += 1
        chunk = self._fs.cat_file(self._path, start=offset, end=offset + n)
        self.bytes_fetched += len(chunk)
        return chunk


class RangedGeoTiff:
    """Lazy GeoTIFF over a ByteSource: open parses only the header
    prefix (IFD chain + tag arrays, fetched in growing chunks);
    ``read_window`` fetches only the tiles the window intersects,
    coalesced with :func:`merge_ranges`.

    Scope matches kernels/geotiff.decode_geotiff's tiled path: classic
    little-endian TIFF, tiled layout, compression none/deflate,
    predictor 1/2, planar separate or chunky, overview IFD chain.
    """

    _CHUNK = 16384

    def __init__(self, source: ByteSource, max_gap: int = 4096):
        self.source = source
        self.max_gap = max_gap
        self._hdr = b""
        self._ensure(8)
        if self._hdr[:4] != b"II*\x00":
            raise ValueError("not a little-endian classic TIFF")
        (off,) = struct.unpack_from("<I", self._hdr, 4)
        self.ifds: List[dict] = []
        while off:
            tags, off = self._read_ifd_lazy(off)
            self.ifds.append(tags)

    # -- header prefix management -------------------------------------
    def _ensure(self, end: int) -> None:
        """Grow the header prefix to cover [0, end): fetch in _CHUNK
        multiples so a typical COG header (IFDs + offset arrays first)
        costs one or two small requests."""
        if end <= len(self._hdr):
            return
        want = ((end - len(self._hdr) + self._CHUNK - 1) // self._CHUNK) * self._CHUNK
        want = min(want, self.source.size() - len(self._hdr))
        self._hdr += self.source.read(len(self._hdr), want)
        if len(self._hdr) < end:
            raise ValueError(f"truncated TIFF: need {end} bytes, have {len(self._hdr)}")

    def _read_ifd_lazy(self, off: int):
        self._ensure(off + 2)
        (n,) = struct.unpack_from("<H", self._hdr, off)
        self._ensure(off + 2 + 12 * n + 4)
        # tag value arrays can sit anywhere; extend the prefix to the
        # farthest out-of-line value before delegating to the kernel
        # parser (for this engine's own COG layout they precede data,
        # so this stays header-sized)
        from ..kernels.geotiff import _FT_SIZE

        far = 0
        for i in range(n):
            _tag, ftype, count = struct.unpack_from("<HHI", self._hdr, off + 2 + 12 * i)
            size = _FT_SIZE.get(ftype, 4) * count
            if size > 4:
                (pos,) = struct.unpack_from("<I", self._hdr, off + 2 + 12 * i + 8)
                far = max(far, pos + size)
        if far:
            self._ensure(far)
        return _read_ifd(self._hdr, off)

    # -- metadata ------------------------------------------------------
    def _base(self) -> dict:
        return self.ifds[0]

    @property
    def shape(self) -> Tuple[int, int, int]:
        t = self._base()
        return (
            t.get(_T_SAMPLES_PER_PIXEL, [1])[0],
            t[_T_IMAGE_LENGTH][0],
            t[_T_IMAGE_WIDTH][0],
        )

    @property
    def transform(self) -> Affine:
        base = self._base()
        if _T_MODEL_TRANSFORMATION in base:
            m = base[_T_MODEL_TRANSFORMATION]
            return Affine(m[0], m[1], m[3], m[4], m[5], m[7])
        if _T_MODEL_PIXEL_SCALE in base and _T_MODEL_TIEPOINT in base:
            sx, sy = base[_T_MODEL_PIXEL_SCALE][0], base[_T_MODEL_PIXEL_SCALE][1]
            tp = base[_T_MODEL_TIEPOINT]
            return Affine(sx, 0.0, tp[3] - tp[0] * sx, 0.0, -sy, tp[4] + tp[1] * sy)
        return Affine.identity()

    @property
    def epsg(self) -> Optional[int]:
        gk = self._base().get(_T_GEO_KEY_DIRECTORY)
        if not gk:
            return None
        for i in range(gk[3]):
            kid, _, _, val = gk[4 + 4 * i : 8 + 4 * i]
            if kid in (3072, 2048):
                return val
        return None

    @property
    def nodata(self) -> Optional[float]:
        nd = self._base().get(_T_GDAL_NODATA)
        if nd:
            try:
                return float(nd[0])
            except ValueError:
                return None
        return None

    @property
    def n_overviews(self) -> int:
        return len(self.ifds) - 1

    # -- windowed ranged read ------------------------------------------
    def read_window(
        self,
        row_off: int,
        col_off: int,
        height: int,
        width: int,
        overview: int = 0,
        boundless: bool = True,
        fill_value: Optional[float] = None,
    ) -> np.ndarray:
        """Decode only the tiles intersecting the window; out-of-image
        parts fill with ``fill_value`` (default: the file's nodata, or
        0) when ``boundless``, else raise. Returns (nb, height, width)."""
        import zlib

        tags = self.ifds[overview]
        if _T_TILE_WIDTH not in tags:
            raise ValueError("ranged reads require tiled layout (COG); "
                             "strip files need a full decode_geotiff pass")
        w = tags[_T_IMAGE_WIDTH][0]
        h = tags[_T_IMAGE_LENGTH][0]
        nb = tags.get(_T_SAMPLES_PER_PIXEL, [1])[0]
        bits = tags[_T_BITS_PER_SAMPLE][0]
        fmt = tags.get(_T_SAMPLE_FORMAT, [1])[0]
        comp = tags.get(_T_COMPRESSION, [1])[0]
        planar = tags.get(_T_PLANAR_CONFIG, [1])[0]
        predictor = tags.get(_T_PREDICTOR, [1])[0]
        dtype = _DTYPES_INV.get((bits, fmt))
        if dtype is None or comp not in (1, 8) or predictor not in (1, 2):
            raise ValueError("unsupported TIFF variant for ranged read")
        tw, th = tags[_T_TILE_WIDTH][0], tags[_T_TILE_LENGTH][0]
        offs, counts = tags[_T_TILE_OFFSETS], tags[_T_TILE_BYTE_COUNTS]
        tc = (w + tw - 1) // tw
        tr = (h + th - 1) // th
        tiles_per_band = tr * tc

        r0, c0 = row_off, col_off
        r1, c1 = row_off + height, col_off + width
        ir0, ic0 = max(r0, 0), max(c0, 0)
        ir1, ic1 = min(r1, h), min(c1, w)
        if not boundless and (r0 < 0 or c0 < 0 or r1 > h or c1 > w):
            raise ValueError("window exceeds image and boundless=False")
        if fill_value is None:
            fill_value = self.nodata if self.nodata is not None else 0
        out = np.full((nb, height, width), fill_value, dtype=dtype)
        if ir0 >= ir1 or ic0 >= ic1:
            return out  # fully outside

        ti0, ti1 = ir0 // th, (ir1 - 1) // th
        tj0, tj1 = ic0 // tw, (ic1 - 1) // tw
        needed: List[Tuple[int, int, int]] = []  # (tile_index, off, count)
        for i in range(ti0, ti1 + 1):
            for j in range(tj0, tj1 + 1):
                if planar == 2:
                    for b in range(nb):
                        k = b * tiles_per_band + i * tc + j
                        # byte count 0 = sparse tile (the COG empty-tile
                        # convention): leave the fill value, fetch nothing
                        if counts[k]:
                            needed.append((k, offs[k], counts[k]))
                else:
                    k = i * tc + j
                    if counts[k]:
                        needed.append((k, offs[k], counts[k]))

        merged = merge_ranges([(o, c) for _, o, c in needed], self.max_gap)
        bufs: dict = {}
        for m_off, m_size in merged:
            data = self.source.read(m_off, m_size)
            for k, o, c in needed:
                if m_off <= o and o + c <= m_off + m_size:
                    bufs[k] = data[o - m_off : o - m_off + c]

        def _undiff(arr: np.ndarray) -> np.ndarray:
            if predictor != 2:
                return arr
            a = arr.astype(np.int64) if arr.dtype.kind in "iu" else arr
            a = np.cumsum(a, axis=-1, dtype=a.dtype if a.dtype.kind == "f" else np.int64)
            return a.astype(arr.dtype)

        for k, _o, _c in needed:
            raw = bufs[k]
            if comp == 8:
                raw = zlib.decompress(raw)
            if planar == 2 or nb == 1:
                b, rem = divmod(k, tiles_per_band) if planar == 2 else (0, k)
                block = _undiff(np.frombuffer(raw, dtype=dtype).reshape(th, tw))
                block = block[np.newaxis]
                bsel = slice(b, b + 1)
                i, j = divmod(rem, tc)
            else:
                blk = np.frombuffer(raw, dtype=dtype).reshape(th, tw, nb)
                if predictor == 2:
                    blk = np.stack([_undiff(blk[:, :, s]) for s in range(nb)], axis=2)
                block = blk.transpose(2, 0, 1)
                bsel = slice(0, nb)
                i, j = divmod(k, tc)
            ty, tx = i * th, j * tw
            # tile ∩ window ∩ image
            ys, ye = max(ty, ir0), min(ty + th, ir1)
            xs, xe = max(tx, ic0), min(tx + tw, ic1)
            if ys >= ye or xs >= xe:
                continue
            out[bsel, ys - r0 : ye - r0, xs - c0 : xe - c0] = block[
                :, ys - ty : ye - ty, xs - tx : xe - tx
            ]
        return out

    def close(self) -> None:
        self.source.close()


def scan_windows(spark, requests):
    """Distributed windowed ranged read: ``requests`` is a DataFrame
    (window_id:int, path:string, row_off/col_off/height/width:int,
    overview:int) → long rows (window_id, band, row, col, value) with
    row/col in WINDOW coordinates.

    Executor-side ``mapInPandas``: each Arrow batch groups its requests
    by path so one lazy header parse serves all windows of a file in
    the batch; tile payload fetches stay per-window and ranged. At
    scale, windows are the partitioning unit — `repartition` on
    window_id upstream spreads hot files across executors while the
    per-batch cache still dedups header fetches within a task.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("window_id", IntegerType()),
            StructField("band", IntegerType()),
            StructField("row", IntegerType()),
            StructField("col", IntegerType()),
            StructField("value", DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            readers: dict = {}
            try:
                for path, grp in pdf.groupby("path", sort=False):
                    if path not in readers:
                        readers[path] = RangedGeoTiff(open_byte_source(path))
                    rd = readers[path]
                    for req in grp.itertuples(index=False):
                        arr = rd.read_window(
                            int(req.row_off), int(req.col_off),
                            int(req.height), int(req.width),
                            overview=int(getattr(req, "overview", 0) or 0),
                        )
                        # one output frame per window keeps batches bounded
                        nb, hh, ww = arr.shape
                        bb, rr, cc = np.meshgrid(
                            np.arange(nb), np.arange(hh), np.arange(ww),
                            indexing="ij",
                        )
                        yield pd.DataFrame(
                            {
                                "window_id": np.full(arr.size, req.window_id,
                                                     dtype=np.int32),
                                "band": bb.ravel().astype(np.int32),
                                "row": rr.ravel().astype(np.int32),
                                "col": cc.ravel().astype(np.int32),
                                "value": arr.ravel().astype(np.float64),
                            }
                        )
            finally:
                for rd in readers.values():
                    rd.close()

    return requests.mapInPandas(gen, schema)
