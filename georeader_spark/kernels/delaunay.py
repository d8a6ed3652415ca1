"""Delaunay triangulation + barycentric linear interpolation — the
kernel behind ``griddata.reproject(method='linear')``
(/root/reference/georeader/griddata.py:286-440 uses scipy's
LinearNDInterpolator = Delaunay + barycentric; no scipy in this
environment, so the engine carries its own).

Bowyer-Watson incremental triangulation (public algorithm): points are
inserted one at a time; triangles whose circumcircle contains the new
point are removed and the cavity is re-triangulated. O(n^2) worst case
— intended for *per-tile* point sets (a few thousand), the unit of the
distributed gather in operators/reproject.griddata_interpolate.

``linear_interpolate``: per-triangle vectorized point location +
barycentric weights; queries outside the convex hull get ``fill``.
Exact (up to float rounding) for affine fields regardless of
triangulation — the property the tests pin.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _circumcircle(pts: np.ndarray, tri: np.ndarray):
    """Circumcenters + squared radii for triangles (m,3) over pts."""
    a = pts[tri[:, 0]]
    b = pts[tri[:, 1]]
    c = pts[tri[:, 2]]
    ab = b - a
    ac = c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    d = np.where(d == 0.0, 1e-300, d)
    ab2 = (ab * ab).sum(1)
    ac2 = (ac * ac).sum(1)
    ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / d
    uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / d
    center = a + np.column_stack([ux, uy])
    r2 = ux * ux + uy * uy
    return center, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson. ``points``: (n,2) float64 (should be distinct).
    Returns (m,3) int32 vertex-index triangles."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)

    # super-triangle well outside the data
    lo = pts.min(0)
    hi = pts.max(0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 1e-9))
    cx, cy = (lo[0] + hi[0]) / 2.0, (lo[1] + hi[1]) / 2.0
    sup = np.array(
        [[cx - 30 * span, cy - 10 * span],
         [cx + 30 * span, cy - 10 * span],
         [cx, cy + 30 * span]]
    )
    all_pts = np.vstack([pts, sup])
    s0, s1, s2 = n, n + 1, n + 2

    tris = [(s0, s1, s2)]
    centers = np.zeros((1, 2))
    r2s = np.zeros(1)
    centers[0], r2s[0] = (
        _circumcircle(all_pts, np.array([[s0, s1, s2]], dtype=np.int64))[0][0],
        _circumcircle(all_pts, np.array([[s0, s1, s2]], dtype=np.int64))[1][0],
    )

    # deterministic insertion order
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for ip in order:
        p = all_pts[ip]
        dx = centers[:, 0] - p[0]
        dy = centers[:, 1] - p[1]
        bad = dx * dx + dy * dy <= r2s * (1.0 + 1e-12)
        bad_tris = [t for t, b in zip(tris, bad) if b]
        if not bad_tris:
            # numeric degeneracy: point on/outside every circumcircle —
            # fall back to containing-triangle split (rare)
            continue
        # cavity boundary: edges appearing exactly once among bad tris
        edge_count = {}
        for t in bad_tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        tris = [t for t, b in zip(tris, bad) if not b]
        new = [(e[0], e[1], int(ip)) for e in sorted(boundary)]
        tris.extend(new)
        tri_arr = np.array(tris, dtype=np.int64)
        centers, r2s = _circumcircle(all_pts, tri_arr)

    out = [t for t in tris if t[0] < n and t[1] < n and t[2] < n]
    return np.array(sorted(tuple(sorted(t)) for t in out), dtype=np.int32).reshape(
        -1, 3
    )


def linear_interpolate(
    points: np.ndarray,
    values: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    fill: float = np.nan,
) -> np.ndarray:
    """Piecewise-linear (Delaunay barycentric) interpolation at query
    coords — scipy ``griddata(method='linear')`` semantics: NaN/fill
    outside the convex hull."""
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    qx = np.asarray(qx, dtype=np.float64).ravel()
    qy = np.asarray(qy, dtype=np.float64).ravel()
    out = np.full(qx.shape, fill, dtype=np.float64)
    tris = delaunay(pts)
    if len(tris) == 0:
        return out
    done = np.zeros(qx.shape, dtype=bool)
    eps = 1e-12
    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0.0:
            continue
        w1 = ((b[1] - c[1]) * (qx - c[0]) + (c[0] - b[0]) * (qy - c[1])) / det
        w2 = ((c[1] - a[1]) * (qx - c[0]) + (a[0] - c[0]) * (qy - c[1])) / det
        w3 = 1.0 - w1 - w2
        inside = (
            ~done
            & (w1 >= -eps)
            & (w2 >= -eps)
            & (w3 >= -eps)
        )
        if inside.any():
            out[inside] = (
                w1[inside] * vals[t[0]]
                + w2[inside] * vals[t[1]]
                + w3[inside] * vals[t[2]]
            )
            done |= inside
    return out
