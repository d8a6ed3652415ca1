"""Pure-numpy affine transform algebra (no GDAL/rasterio dependency).

Re-expresses the transform math georeader builds on ``rasterio.Affine``
(reference: /root/reference/georeader/geotensor.py:50-60 for the
coefficient convention, /root/reference/georeader/__init__.py:229-274
for ``res``). The convention is identical to rasterio/affine:

    x_geo = a * col + b * row + c
    y_geo = d * col + e * row + f

i.e. ``Affine(a, b, c, d, e, f)`` applied to pixel coords ``(col, row)``.
North-up rasters have ``e < 0``.

Everything here is plain float math so the *same module* runs inside
Arrow-vectorized pandas UDFs on executors, in the single-process oracle,
and in unit tests — guaranteeing bit-identical window assignment
(SURVEY.md §7.3 hard part #1).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence, Tuple, Union

import numpy as np

Number = Union[int, float]


class Affine:
    """2D affine transform with rasterio's (a, b, c, d, e, f) layout.

    Matrix form::

        | x |   | a  b  c | | col |
        | y | = | d  e  f | | row |
        | 1 |   | 0  0  1 | |  1  |
    """

    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a: Number, b: Number, c: Number, d: Number, e: Number, f: Number):
        self.a = float(a)
        self.b = float(b)
        self.c = float(c)
        self.d = float(d)
        self.e = float(e)
        self.f = float(f)

    # ---- constructors -------------------------------------------------
    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @classmethod
    def translation(cls, xoff: Number, yoff: Number) -> "Affine":
        return cls(1.0, 0.0, xoff, 0.0, 1.0, yoff)

    @classmethod
    def scale(cls, sx: Number, sy: Number | None = None) -> "Affine":
        if sy is None:
            sy = sx
        return cls(sx, 0.0, 0.0, 0.0, sy, 0.0)

    @classmethod
    def from_origin(cls, west: Number, north: Number, xsize: Number, ysize: Number) -> "Affine":
        """North-up transform from top-left corner + pixel sizes.

        Mirrors ``rasterio.transform.from_origin`` (used by the reference
        test fixture /root/reference/tests/conftest.py:30).
        """
        return cls(xsize, 0.0, west, 0.0, -ysize, north)

    @classmethod
    def from_coeffs(cls, coeffs: Sequence[Number]) -> "Affine":
        a, b, c, d, e, f = (float(v) for v in coeffs[:6])
        return cls(a, b, c, d, e, f)

    # ---- algebra -------------------------------------------------------
    def to_tuple(self) -> Tuple[float, float, float, float, float, float]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)

    def __iter__(self):
        return iter(self.to_tuple())

    def __mul__(self, other):
        """``T * (col, row)`` applies the transform; ``T * T2`` composes."""
        if isinstance(other, Affine):
            a1, b1, c1, d1, e1, f1 = self.to_tuple()
            a2, b2, c2, d2, e2, f2 = other.to_tuple()
            return Affine(
                a1 * a2 + b1 * d2,
                a1 * b2 + b1 * e2,
                a1 * c2 + b1 * f2 + c1,
                d1 * a2 + e1 * d2,
                d1 * b2 + e1 * e2,
                d1 * c2 + e1 * f2 + f1,
            )
        col, row = other
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    def __invert__(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if det == 0:
            raise ValueError("Affine transform is not invertible (det == 0)")
        ia = self.e / det
        ib = -self.b / det
        id_ = -self.d / det
        ie = self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def __eq__(self, other) -> bool:
        return isinstance(other, Affine) and self.to_tuple() == other.to_tuple()

    def __hash__(self) -> int:
        return hash(self.to_tuple())

    def almost_equals(self, other: "Affine", precision: float = 1e-9) -> bool:
        """Mirrors ``rasterio.Affine.almost_equals`` (used by the
        reference ``same_extent`` check, geotensor.py:642-657)."""
        return all(abs(s - o) <= precision for s, o in zip(self, other))

    def __repr__(self) -> str:
        return f"Affine({self.a}, {self.b}, {self.c}, {self.d}, {self.e}, {self.f})"

    # ---- vectorized application ---------------------------------------
    def apply(self, cols: np.ndarray, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized ``T * (col, row)`` over numpy arrays."""
        cols = np.asarray(cols, dtype=np.float64)
        rows = np.asarray(rows, dtype=np.float64)
        return (
            self.a * cols + self.b * rows + self.c,
            self.d * cols + self.e * rows + self.f,
        )

    def apply_inverse(self, xs: np.ndarray, ys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized ``~T * (x, y)`` — geo coords to fractional pixels."""
        return (~self).apply(xs, ys)

    @property
    def is_rectilinear(self) -> bool:
        return self.b == 0.0 and self.d == 0.0


def res(transform: Affine) -> Tuple[float, float]:
    """Pixel resolution from transform via Euclidean corner distances.

    Rotation-safe, matching the reference implementation exactly
    (/root/reference/georeader/__init__.py:229-274).
    """
    x0, y0 = transform * (0, 0)
    x1, y1 = transform * (1, 0)
    x2, y2 = transform * (0, 1)
    return (
        math.sqrt((x0 - x1) ** 2 + (y0 - y1) ** 2),
        math.sqrt((x0 - x2) ** 2 + (y0 - y2) ** 2),
    )


def transform_to_resolution_dst(
    transform: Affine, resolution_dst: Union[Number, Tuple[Number, Number]]
) -> Affine:
    """Rescale a transform to a new resolution, preserving the origin.

    ``T_dst = T * scale(res_dst / res_src)`` — semantics of
    /root/reference/georeader/window_utils.py:465-529.
    """
    if isinstance(resolution_dst, (int, float)):
        resolution_dst = (abs(resolution_dst), abs(resolution_dst))
    resolution_or = res(transform)
    return transform * Affine.scale(
        resolution_dst[0] / resolution_or[0], resolution_dst[1] / resolution_or[1]
    )


def grid_id(crs: str, transform: Affine, shape: Tuple[int, int], ndigits: int = 6) -> str:
    """Canonical identifier of a pixel grid: equality of grid_id is the
    distributed analog of the reference's ``same_extent`` precondition
    for binary grid algebra (/root/reference/georeader/geotensor.py:642-657).

    Joining two tile tables on ``grid_id`` (plus tile coords) replaces the
    eager same-extent assertion with a join-key equality.
    """
    t = tuple(round(v, ndigits) for v in transform)
    return f"{crs.lower()}|{t}|{int(shape[0])}x{int(shape[1])}"
