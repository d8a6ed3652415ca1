"""Pure-Python/numpy kernel library — no Spark imports here.

The same kernels back (a) Arrow-vectorized pandas UDFs on executors,
(b) the single-process oracle that produces golden fixtures, and
(c) the unit tests porting the reference's exact-value assertions
(SURVEY.md §7.1 step 1). Keeping one module shared across all three is
how bit-identical window assignment is guaranteed (§7.3 hard part #1).
"""

from .affine import Affine, grid_id, res, transform_to_resolution_dst
from .windows import (
    PIXEL_PRECISION,
    Window,
    figure_out_transform,
    get_slice_pad,
    normalize_bounds,
    pad_window,
    pad_window_to_size,
    round_outer_window,
    slice_save_for_pred,
    window_bounds,
    window_from_bounds,
    window_from_center_coords,
    window_from_polygon_coords,
    window_polygon,
    window_transform,
)
from .slices import create_slices, create_windows, slices_1d

__all__ = [
    "Affine",
    "grid_id",
    "res",
    "transform_to_resolution_dst",
    "PIXEL_PRECISION",
    "Window",
    "figure_out_transform",
    "get_slice_pad",
    "normalize_bounds",
    "pad_window",
    "pad_window_to_size",
    "round_outer_window",
    "slice_save_for_pred",
    "window_bounds",
    "window_from_bounds",
    "window_from_center_coords",
    "window_from_polygon_coords",
    "window_polygon",
    "window_transform",
    "create_slices",
    "create_windows",
    "slices_1d",
]
