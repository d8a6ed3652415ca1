"""Grid-spec planning: the reference's optimizer rules as pre-flight
Python (SURVEY.md §4.1 — no custom Catalyst rule needed; we generate
the right plan up front).

- :func:`plan_reproject` — resolves the destination grid
  (figure_out_transform truth table) and detects the aligned-grid
  fast path (read.py:1530-1547: same CRS + same pixel size + integral
  offset => pure window read, "10-100x faster").
- :class:`GridSpec` — (crs, transform, shape, fill): the metadata-only
  raster (FakeGeoData analog, abstract_reader.py:169-186).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

from ..kernels.affine import Affine, grid_id, res
from ..kernels.crs import compare_crs
from ..kernels.windows import (
    Window,
    _is_exact_round,
    figure_out_transform,
    round_outer_window,
    window_from_bounds,
)


@dataclass(frozen=True)
class GridSpec:
    crs: str
    transform: Affine
    height: int
    width: int
    fill_value: float = 0.0

    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        x0, y0 = self.transform * (0, 0)
        x1, y1 = self.transform * (self.width, self.height)
        return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))

    @property
    def grid_id(self) -> str:
        return grid_id(self.crs, self.transform, (self.height, self.width))

    def same_extent(self, other: "GridSpec", precision: float = 1e-3) -> bool:
        """The binary-op precondition (geotensor.py:642-657):
        transform almost_equals(1e-3) + CRS + spatial shape equality."""
        return (
            self.transform.almost_equals(other.transform, precision)
            and compare_crs(self.crs, other.crs)
            and (self.height, self.width) == (other.height, other.width)
        )


@dataclass(frozen=True)
class ReprojectPlan:
    dst: GridSpec
    fast_path: bool          # aligned grid: pure window read
    src_window: Optional[Window]  # set when fast_path


def plan_reproject(
    src: GridSpec,
    dst_crs: Optional[str] = None,
    dst_transform: Optional[Affine] = None,
    bounds: Optional[Tuple[float, float, float, float]] = None,
    resolution_dst: Optional[float] = None,
    dst_shape: Optional[Tuple[int, int]] = None,
) -> ReprojectPlan:
    """Resolve destination grid + fast-path detection, driver-side."""
    dst_crs = dst_crs or src.crs
    if dst_transform is None:
        dst_transform = figure_out_transform(
            transform=src.transform if compare_crs(dst_crs, src.crs) else None,
            bounds=bounds or (src.bounds if not compare_crs(dst_crs, src.crs) else None),
            resolution_dst=resolution_dst,
        )
    if dst_shape is None:
        b = bounds or src.bounds
        w = round_outer_window(window_from_bounds(dst_transform, b))
        dst_shape = (int(w.height), int(w.width))
        # snap the transform onto the rounded window origin
        x0, y0 = dst_transform * (w.col_off, w.row_off)
        dst_transform = Affine(
            dst_transform.a, dst_transform.b, x0,
            dst_transform.d, dst_transform.e, y0,
        )
    dst = GridSpec(dst_crs, dst_transform, dst_shape[0], dst_shape[1], src.fill_value)

    # fast path (read.py:1530-1547): same crs, same pixel size,
    # integral pixel offset
    fast = False
    src_window = None
    if compare_crs(src.crs, dst.crs):
        r_src = res(src.transform)
        r_dst = res(dst.transform)
        if (
            abs(r_src[0] - r_dst[0]) < 1e-9
            and abs(r_src[1] - r_dst[1]) < 1e-9
            and src.transform.is_rectilinear
            and dst.transform.is_rectilinear
        ):
            inv = ~src.transform
            c_off, r_off = inv * (dst.transform.c, dst.transform.f)
            # NB quirk not replicated: the reference gates this on
            # _is_exact_round (3-decimal cleanliness, window_utils.py:
            # 595-596), so a 10.37-px offset would take the "aligned"
            # path and be floored — a half-pixel-wrong read. The stated
            # intent (read.py:1523-1528 "integer pixel offset") is an
            # integrality check; we implement the intent.
            if abs(c_off - round(c_off)) < 1e-6 and abs(r_off - round(r_off)) < 1e-6:
                fast = True
                src_window = Window(
                    int(round(c_off)), int(round(r_off)), dst.width, dst.height
                )
    return ReprojectPlan(dst=dst, fast_path=fast, src_window=src_window)
