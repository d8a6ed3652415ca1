"""1D/ND tiling — the ``create_windows`` operator family (SURVEY.md §2.5).

Same semantics as /root/reference/georeader/slices.py:144-403:
stride = size - overlap; edge flags ``include_incomplete``,
``trim_incomplete``, ``start_negative_if_padding`` (first tile starts at
``-overlap // 2``).

In the Spark engine, window generation is expressed declaratively with
``sequence()`` + ``explode()`` (see operators/tiling.py); this module is
the scalar oracle those expressions are tested against, and the kernel
used inside UDFs when a driver-side list is appropriate (small tile
counts get broadcast instead of exploded).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

from .windows import Window


def slices_1d(
    dimsize: int,
    size: int,
    overlap: int = 0,
    include_incomplete: bool = True,
    start_negative_if_padding: bool = False,
    trim_incomplete: bool = False,
) -> List[Tuple[int, int]]:
    """Divide ``[0, dimsize)`` into (start, end) pairs of length ``size``
    with ``overlap`` shared pixels (reference ``_slices``,
    slices.py:144-230). Ends may exceed ``dimsize`` unless trimmed."""
    if dimsize < size:
        end = dimsize if trim_incomplete else size
        return [(0, end)]

    stride = size - overlap
    if stride <= 0:
        raise ValueError(f"stride {stride} must be > 0 (overlap >= size)")
    if stride >= dimsize:
        raise ValueError(f"stride {stride} must be < dimsize {dimsize}")

    # NB: reference uses ``-overlap // 2`` (floor of the negation), which
    # is -9 for overlap=17, not -8 — keep that exact rule.
    start_value = -overlap // 2 if start_negative_if_padding else 0
    out: List[Tuple[int, int]] = []
    for start in range(start_value, dimsize, stride):
        end = start + size
        if include_incomplete or (end <= dimsize):
            if trim_incomplete and end > dimsize:
                end = dimsize
            out.append((start, end))
    return out


def create_slices(
    named_shape: Dict[str, int],
    dims: Dict[str, int],
    overlap: Optional[Dict[str, int]] = None,
    include_incomplete: bool = True,
    start_negative_if_padding: bool = False,
    trim_incomplete: bool = True,
) -> List[Dict[str, Tuple[int, int]]]:
    """N-dim Cartesian product of 1D slices over named dims
    (reference ``create_slices``, slices.py:233-318)."""
    if overlap is None:
        overlap = {}
    dim_slices = []
    for dim in dims:
        dim_slices.append(
            slices_1d(
                named_shape[dim],
                dims[dim],
                overlap.get(dim, 0),
                include_incomplete=include_incomplete,
                start_negative_if_padding=start_negative_if_padding,
                trim_incomplete=trim_incomplete,
            )
        )
    return [
        {key: slc for key, slc in zip(dims, combo)}
        for combo in itertools.product(*dim_slices)
    ]


def create_windows(
    geodata_shape: Tuple[int, int],
    window_size: Tuple[int, int],
    overlap: Optional[Tuple[int, int]] = None,
    include_incomplete: bool = True,
    start_negative_if_padding: bool = False,
    trim_incomplete: bool = True,
) -> List[Window]:
    """(H, W) + tile size + overlap -> list of Windows — THE tiling
    operator (reference ``create_windows``, slices.py:321-403).

    Iteration order matches the reference: x (cols) is the first dim in
    the product, y (rows) second — i.e. for fixed col range, row ranges
    iterate fastest.
    """
    named_shape = {"x": geodata_shape[-1], "y": geodata_shape[-2]}
    overlap_d = None if overlap is None else {"x": overlap[1], "y": overlap[0]}
    slc = create_slices(
        named_shape,
        {"x": window_size[1], "y": window_size[0]},
        overlap=overlap_d,
        include_incomplete=include_incomplete,
        start_negative_if_padding=start_negative_if_padding,
        trim_incomplete=trim_incomplete,
    )
    return [
        Window(
            col_off=d["x"][0],
            row_off=d["y"][0],
            width=d["x"][1] - d["x"][0],
            height=d["y"][1] - d["y"][0],
        )
        for d in slc
    ]
