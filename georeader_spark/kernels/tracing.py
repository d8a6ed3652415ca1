"""Pixel-boundary tracing + Douglas-Peucker simplification — the
single-process kernel behind distributed polygonization
(operators/vectorize.polygonize), re-expressing the reference's
``rasterio.features.shapes`` + ``shapely.simplify`` step
(/root/reference/georeader/vectorize.py:255-268) without GDAL/shapely.

``component_rings``: the boundary of a 4-connected pixel set as closed
rings on the pixel-corner lattice — one CCW exterior ring plus CW hole
rings, exactly the union-of-unit-squares boundary that
``features.shapes`` emits. Directed-edge chaining: every boundary edge
is directed with the component's interior on its LEFT, so following
edges head-to-tail yields consistently oriented rings; at checkerboard
corners (two diagonal pixels sharing only a vertex) the LEFT-most turn
keeps the two rings separate (the pinch rule rasterio applies).

All functions deterministic: rings start at their lexicographically
smallest vertex, exterior first (by start vertex), then holes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _boundary_edges(pix: set) -> Dict[Tuple[int, int], List[Tuple[int, int]]]:
    """Directed boundary edges (interior on the left), keyed by start
    vertex. Vertices are (x, y) pixel-corner coords with x=col, y=row
    (y grows downward, matching raster row order)."""
    out: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def add(a, b):
        out.setdefault(a, []).append(b)

    for (r, c) in sorted(pix):
        if (r - 1, c) not in pix:   # top edge: left-to-right
            add((c, r), (c + 1, r))
        if (r + 1, c) not in pix:   # bottom edge: right-to-left
            add((c + 1, r + 1), (c, r + 1))
        if (r, c - 1) not in pix:   # left edge: bottom-to-top
            add((c, r + 1), (c, r))
        if (r, c + 1) not in pix:   # right edge: top-to-bottom
            add((c + 1, r), (c + 1, r + 1))
    return out


def component_rings(pixels) -> List[np.ndarray]:
    """Boundary rings of a set of (row, col) pixels.

    Returns closed rings as float64 arrays of (x, y) corner coords
    (first == last vertex), collinear runs collapsed. Exterior rings are
    CCW in (x, y-down) screen convention (area via shoelace < 0 — see
    :func:`shoelace_area`), holes opposite.
    """
    pix = set(map(tuple, pixels))
    edges = _boundary_edges(pix)
    rings: List[np.ndarray] = []
    # deterministic sweep: start from smallest keyed vertex each time
    while edges:
        start = min(edges)
        ring = [start]
        prev_dir = None
        cur = start
        while True:
            outs = edges.get(cur)
            if len(outs) == 1:
                nxt = outs.pop(0)
                del edges[cur]
            else:
                # pinch vertex (exterior touches itself or a hole
                # diagonally): two outgoing edges. Take the SHARP turn
                # (right in y-down coords) — the ring pinches inward and
                # stays a single exterior visiting the vertex twice,
                # matching GDAL/rasterio features.shapes output (tested:
                # C-shape with diagonal self-touch -> 1 ring, area =
                # pixel count; the opposite turn fabricates a hole).
                outs.sort()
                if prev_dir is None:
                    nxt = outs[0]
                else:
                    dx, dy = prev_dir
                    want = (cur[0] - dy, cur[1] + dx)
                    nxt = want if want in outs else outs[0]
                outs.remove(nxt)
                if not outs:
                    del edges[cur]
            ring.append(nxt)
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
        rings.append(_collapse_collinear(np.array(ring, dtype=np.float64)))
    # deterministic order: by (start vertex) after rotation to min vertex
    rings = [_rotate_to_min(r) for r in rings]
    rings.sort(key=lambda r: (r[0, 0], r[0, 1]))
    return rings


def _rotate_to_min(ring: np.ndarray) -> np.ndarray:
    open_ = ring[:-1]
    i = int(np.lexsort((open_[:, 1], open_[:, 0]))[0])
    rolled = np.roll(open_, -i, axis=0)
    return np.vstack([rolled, rolled[:1]])


def _collapse_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop interior vertices of straight runs (unit-step chains)."""
    if len(ring) <= 3:
        return ring
    open_ = ring[:-1]
    prev_v = open_ - np.roll(open_, 1, axis=0)
    next_v = np.roll(open_, -1, axis=0) - open_
    cross = prev_v[:, 0] * next_v[:, 1] - prev_v[:, 1] * next_v[:, 0]
    keep = cross != 0
    out = open_[keep]
    return np.vstack([out, out[:1]])


def shoelace_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive for CW in y-down convention)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x * y2 - x2 * y))


def douglas_peucker(points: np.ndarray, tolerance: float) -> np.ndarray:
    """Iterative Douglas-Peucker on an open or closed polyline —
    shapely's ``simplify(tolerance)`` algorithm (vectorize.py:265)."""
    n = len(points)
    if n <= 2:
        return points
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = points[i1] - points[i0]
        norm = float(np.hypot(*seg))
        mid = points[i0 + 1 : i1]
        if norm == 0.0:
            d = np.hypot(mid[:, 0] - points[i0][0], mid[:, 1] - points[i0][1])
        else:
            d = np.abs(
                seg[0] * (points[i0][1] - mid[:, 1])
                - (points[i0][0] - mid[:, 0]) * seg[1]
            ) / norm
        j = int(np.argmax(d))
        if d[j] > tolerance:
            k = i0 + 1 + j
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
    return points[keep]


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """DP-simplify a closed ring; keeps closure, min 4 vertices
    (triangle + closing point) like shapely's preserve-topology=False
    default on valid rings."""
    out = douglas_peucker(ring, tolerance)
    if len(out) < 4:
        return ring
    return out
