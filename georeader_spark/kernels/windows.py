"""Pure window algebra — the heart of the engine (SURVEY.md §2.2).

Ports the *semantics* (not the code) of georeader's window math:

- ``Window``                 /root/reference/georeader/window_utils.py:11-40
- ``pad_window``             window_utils.py:181-256
- ``pad_window_to_size``     window_utils.py:259-346
- ``round_outer_window``     window_utils.py:532-591 (PIXEL_PRECISION=3)
- ``get_slice_pad``          window_utils.py:599-770
- ``window_bounds``          window_utils.py:865-957 (rotation-safe)
- ``window_polygon``         window_utils.py:773-862
- ``normalize_bounds``       window_utils.py:960-1040
- ``figure_out_transform``   window_utils.py:349-462
- ``window_from_bounds``     /root/reference/georeader/read.py:316-367
- ``window_from_center_coords``  read.py:370-434
- ``window_from_polygon``    read.py:248-313
- ``slice_save_for_pred``    window_utils.py:1256-1386 (tile-and-stitch crop)

All functions are scalar *and* have ``*_np`` vectorized variants used
inside Arrow-batched UDFs and in generated Spark SQL expressions: the
floor/ceil/round rules here are the single source of truth so the
DuckDB oracle, the Spark column expressions, and the pandas UDFs agree
bit-for-bit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .affine import Affine, res, transform_to_resolution_dst

#: Decimal pre-rounding before floor/ceil: 3.0001 -> 3 but 3.001 -> 4
#: (matches window_utils.py:178 PIXEL_PRECISION = 3)
PIXEL_PRECISION = 3

Number = Union[int, float]
BoundsT = Tuple[float, float, float, float]


@dataclass(frozen=True)
class Window:
    """Pixel-space rectangle ``(col_off, row_off, width, height)``.

    Offsets may be fractional or negative (boundless semantics), exactly
    like ``rasterio.windows.Window``.
    """

    col_off: Number
    row_off: Number
    width: Number
    height: Number

    def to_tuple(self) -> Tuple[Number, Number, Number, Number]:
        return (self.col_off, self.row_off, self.width, self.height)

    @property
    def col_end(self) -> Number:
        return self.col_off + self.width

    @property
    def row_end(self) -> Number:
        return self.row_off + self.height

    def intersects(self, other: "Window") -> bool:
        return (
            self.col_off < other.col_end
            and other.col_off < self.col_end
            and self.row_off < other.row_end
            and other.row_off < self.row_end
        )


def pad_window(window: Window, pad_size: Tuple[int, int]) -> Window:
    """Symmetric expansion by ``(pad_rows, pad_cols)`` on every side."""
    return Window(
        window.col_off - pad_size[1],
        window.row_off - pad_size[0],
        window.width + 2 * pad_size[1],
        window.height + 2 * pad_size[0],
    )


def pad_window_to_size(window: Window, size: Tuple[int, int]) -> Window:
    """Expand-or-center-crop to exactly ``(height, width)``.

    Odd differences favor bottom/right, matching the reference
    (window_utils.py:335-346: ``pad_half = pad_add // 2`` applied to the
    offset, remainder lands on the far side).
    """
    pad_add_rows = size[0] - window.height
    pad_add_cols = size[1] - window.width
    return Window(
        window.col_off - pad_add_cols // 2,
        window.row_off - pad_add_rows // 2,
        window.width + pad_add_cols,
        window.height + pad_add_rows,
    )


def round_outer_window(window: Window, precision: int = PIXEL_PRECISION) -> Window:
    """Floor offsets / ceil endpoints with decimal pre-rounding.

    Guarantees the integral window fully contains the fractional one.
    The pre-round uses Python banker's rounding at ``precision`` digits
    — identical to the reference (window_utils.py:580-591), and the rule
    every distributed tile assignment must reproduce exactly.
    """
    row_dst = math.ceil(round(window.row_off + window.height, ndigits=precision))
    col_dst = math.ceil(round(window.col_off + window.width, ndigits=precision))
    col_off = math.floor(round(window.col_off, ndigits=precision))
    row_off = math.floor(round(window.row_off, ndigits=precision))
    return Window(col_off, row_off, col_dst - col_off, row_dst - row_off)


def _round_half_even_np(x: np.ndarray, ndigits: int) -> np.ndarray:
    """numpy.round is round-half-even like Python's round — same rule."""
    return np.round(x, ndigits)


def round_outer_window_np(
    col_off: np.ndarray,
    row_off: np.ndarray,
    width: np.ndarray,
    height: np.ndarray,
    precision: int = PIXEL_PRECISION,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`round_outer_window` over window component arrays."""
    col_off = np.asarray(col_off, dtype=np.float64)
    row_off = np.asarray(row_off, dtype=np.float64)
    row_dst = np.ceil(_round_half_even_np(row_off + height, precision))
    col_dst = np.ceil(_round_half_even_np(col_off + width, precision))
    co = np.floor(_round_half_even_np(col_off, precision))
    ro = np.floor(_round_half_even_np(row_off, precision))
    return (
        co.astype(np.int64),
        ro.astype(np.int64),
        (col_dst - co).astype(np.int64),
        (row_dst - ro).astype(np.int64),
    )


def _is_exact_round(x: float, precision: int = PIXEL_PRECISION) -> bool:
    """True when x is within 1e-6 of its ``precision``-digit rounding
    (window_utils.py:595-596) — the aligned-grid fast-path test."""
    return abs(round(x, ndigits=precision) - x) < 1e-6


def get_slice_pad(
    window_data: Window, window_read: Window
) -> Tuple[Dict[str, slice], Dict[str, Tuple[int, int]]]:
    """Decompose an out-of-bounds read into in-bounds slice + 4-side pad.

    Returns ``({"x": slice, "y": slice}, {"x": (l, r), "y": (t, b)})``
    with slices relative to ``window_data``'s origin — semantics of
    window_utils.py:599-770. Raises ``ValueError`` when disjoint.
    """
    if not window_data.intersects(window_read):
        raise ValueError(
            f"Window data: {window_data} and window read: {window_read} do not intersect"
        )

    if window_read.row_off < window_data.row_off:
        pad_y_0 = window_data.row_off - window_read.row_off
        row_start = window_data.row_off
    else:
        pad_y_0 = 0
        row_start = window_read.row_off - window_data.row_off

    if window_read.col_off < window_data.col_off:
        pad_x_0 = window_data.col_off - window_read.col_off
        col_start = window_data.col_off
    else:
        pad_x_0 = 0
        col_start = window_read.col_off - window_data.col_off

    if window_read.col_end > window_data.col_end:
        pad_x_1 = window_read.col_end - window_data.col_end
        col_end = window_data.col_end
    else:
        pad_x_1 = 0
        col_end = window_read.col_end

    if window_read.row_end > window_data.row_end:
        pad_y_1 = window_read.row_end - window_data.row_end
        row_end = window_data.row_end
    else:
        pad_y_1 = 0
        row_end = window_read.row_end

    return (
        {"x": slice(col_start, col_end), "y": slice(row_start, row_end)},
        {"x": (pad_x_0, pad_x_1), "y": (pad_y_0, pad_y_1)},
    )


def window_bounds(window: Window, transform: Affine) -> BoundsT:
    """Window -> AABB in geo coords; rotation-safe via 4-corner min/max
    (window_utils.py:865-957)."""
    corners_px = [
        (window.col_off, window.row_off),
        (window.col_end, window.row_off),
        (window.col_off, window.row_end),
        (window.col_end, window.row_end),
    ]
    pts = [transform * c for c in corners_px]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


def window_polygon(window: Window, transform: Affine) -> List[Tuple[float, float]]:
    """Window -> exterior ring coords (closed), a parallelogram when the
    transform is rotated (window_utils.py:773-862)."""
    corners_px = [
        (window.col_off, window.row_off),
        (window.col_end, window.row_off),
        (window.col_end, window.row_end),
        (window.col_off, window.row_end),
        (window.col_off, window.row_off),
    ]
    return [transform * c for c in corners_px]


def normalize_bounds(bounds: BoundsT, margin_add_if_equal: float = 5e-4) -> BoundsT:
    """Fix inverted or degenerate bounds (window_utils.py:960-1040):
    swap min/max per axis; expand an empty axis by the margin."""
    xmin = min(bounds[0], bounds[2])
    ymin = min(bounds[1], bounds[3])
    xmax = max(bounds[0], bounds[2])
    ymax = max(bounds[1], bounds[3])
    if xmin >= xmax:
        xmin -= margin_add_if_equal
        xmax += margin_add_if_equal
    if ymin >= ymax:
        ymin -= margin_add_if_equal
        ymax += margin_add_if_equal
    return (xmin, ymin, xmax, ymax)


def window_from_bounds(transform: Affine, bounds: BoundsT) -> Window:
    """Geo bounds -> fractional pixel window via the inverse transform
    (read.py:316-367 / rasterio.windows.from_bounds semantics for
    rectilinear north-up grids; general transforms via 4-corner min/max).
    """
    inv = ~transform
    corners = [
        (bounds[0], bounds[1]),
        (bounds[0], bounds[3]),
        (bounds[2], bounds[1]),
        (bounds[2], bounds[3]),
    ]
    px = [inv * c for c in corners]
    cols = [p[0] for p in px]
    rows = [p[1] for p in px]
    col_off = min(cols)
    row_off = min(rows)
    return Window(col_off, row_off, max(cols) - col_off, max(rows) - row_off)


def window_from_bounds_np(
    transform: Affine,
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`window_from_bounds` for bound-column batches."""
    inv = ~transform
    c1, r1 = inv.apply(xmin, ymin)
    c2, r2 = inv.apply(xmin, ymax)
    c3, r3 = inv.apply(xmax, ymin)
    c4, r4 = inv.apply(xmax, ymax)
    cols = np.stack([c1, c2, c3, c4])
    rows = np.stack([r1, r2, r3, r4])
    col_off = cols.min(axis=0)
    row_off = rows.min(axis=0)
    return col_off, row_off, cols.max(axis=0) - col_off, rows.max(axis=0) - row_off


def window_from_center_coords(
    transform: Affine, center_coords: Tuple[float, float], shape: Tuple[int, int]
) -> Window:
    """(x, y) + (height, width) -> centered window; center rounded to int
    pixel (read.py:370-434; ``_round_all`` rounds the upper-left corner).
    """
    inv = ~transform
    pc, pr = inv * center_coords
    ul_col = int(round(pc - shape[1] / 2))
    ul_row = int(round(pr - shape[0] / 2))
    return Window(ul_col, ul_row, shape[1], shape[0])


def window_from_polygon_coords(
    transform: Affine,
    coords: np.ndarray,
    window_surrounding: bool = False,
) -> Window:
    """Polygon exterior coords ``(N, 2)`` -> pixel bbox window
    (read.py:248-313: invert transform per vertex, min/max, optional +1px).
    """
    coords = np.asarray(coords, dtype=np.float64)
    inv = ~transform
    cols, rows = inv.apply(coords[:, 0], coords[:, 1])
    row_off = float(rows.min())
    col_off = float(cols.min())
    row_max = float(rows.max())
    col_max = float(cols.max())
    if window_surrounding:
        row_max += 1
        col_max += 1
    return Window(col_off, row_off, col_max - col_off, row_max - row_off)


def window_transform(window: Window, transform: Affine) -> Affine:
    """Transform of the sub-grid starting at the window's origin
    (``rasterio.windows.transform`` semantics, used throughout the
    reference e.g. read.py:303)."""
    x0, y0 = transform * (window.col_off, window.row_off)
    return Affine(transform.a, transform.b, x0, transform.d, transform.e, y0)


def figure_out_transform(
    transform: Optional[Affine] = None,
    bounds: Optional[BoundsT] = None,
    resolution_dst: Optional[Union[Number, Tuple[Number, Number]]] = None,
) -> Affine:
    """Derive an output transform from any of {transform, bounds,
    resolution} per the truth table at window_utils.py:368-379:

    - transform + resolution -> rescale to resolution (origin kept)
    - bounds + resolution    -> north-up transform from bounds origin
    - transform + bounds (+resolution) -> rescale then snap origin onto
      the (rounded-outer) window of the bounds.
    """
    if transform is None:
        if bounds is None or resolution_dst is None:
            raise ValueError("Need bounds + resolution_dst when transform is None")
        if isinstance(resolution_dst, (int, float)):
            resolution_dst = (abs(resolution_dst), abs(resolution_dst))
        return Affine(
            resolution_dst[0], 0.0, bounds[0], 0.0, -resolution_dst[1], bounds[3]
        )

    dst_transform = (
        transform_to_resolution_dst(transform, resolution_dst)
        if resolution_dst is not None
        else transform
    )
    if bounds is not None:
        w = round_outer_window(window_from_bounds(dst_transform, bounds))
        dst_transform = window_transform(w, dst_transform)
    return dst_transform


def slice_save_for_pred(
    window_read: Window,
    window_data: Window,
) -> Tuple[Dict[str, slice], Window]:
    """Tile-and-stitch crop: given an overlap-padded read window and the
    valid data extent, return the slices that cut the padded prediction
    back to the in-bounds core plus the write window — semantics of
    window_utils.py:1256-1386 (overlap tiling; SURVEY.md §2.5).
    """
    col_start = max(window_read.col_off, window_data.col_off)
    row_start = max(window_read.row_off, window_data.row_off)
    col_end = min(window_read.col_end, window_data.col_end)
    row_end = min(window_read.row_end, window_data.row_end)
    if col_end <= col_start or row_end <= row_start:
        raise ValueError("window_read does not intersect window_data")
    slices = {
        "x": slice(col_start - window_read.col_off, col_end - window_read.col_off),
        "y": slice(row_start - window_read.row_off, row_end - window_read.row_off),
    }
    write_window = Window(col_start, row_start, col_end - col_start, row_end - row_start)
    return slices, write_window
