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


# ---------------------------------------------------------------------------
# Clough-Tocher C1 cubic interpolation (griddata method='cubic')
# ---------------------------------------------------------------------------

def estimate_gradients(
    points: np.ndarray,
    values: np.ndarray,
    tris: np.ndarray,
    radius: float | None = None,
) -> np.ndarray:
    """Per-vertex gradient by inverse-distance-squared weighted
    least-squares plane fit over the vertex's neighbors.

    Neighbors are the triangulation's edge neighbors, or — when
    ``radius`` is given — ALL points within that distance. The radius
    form makes the gradient a function of the point set inside a fixed
    ball, which is what lets the distributed tile-gather reproduce the
    global result exactly (gather margin >= radius + circumradii).

    Deterministic and local (the reference's scipy backend estimates
    gradients *globally* by an iterative scheme — a documented
    deviation; both are exact for linear fields, which is what the
    reproduction tests pin). Isolated / rank-deficient vertices get a
    zero gradient."""
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(pts)
    nbrs: list = [None] * n
    if radius is None:
        sets: list[set] = [set() for _ in range(n)]
        for t in tris:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                sets[t[a]].add(int(t[b]))
                sets[t[b]].add(int(t[a]))
        nbrs = [sorted(s) for s in sets]
    else:
        r2 = float(radius) ** 2
        for i in range(n):
            d2 = ((pts - pts[i]) ** 2).sum(1)
            ks = np.nonzero((d2 > 0.0) & (d2 <= r2))[0]
            nbrs[i] = ks.tolist()
    grad = np.zeros((n, 2), dtype=np.float64)
    for i in range(n):
        ks = nbrs[i]
        if len(ks) < 2:
            continue
        d = pts[ks] - pts[i]
        df = vals[ks] - vals[i]
        w = 1.0 / np.maximum((d * d).sum(1), 1e-300)
        a11 = (w * d[:, 0] * d[:, 0]).sum()
        a12 = (w * d[:, 0] * d[:, 1]).sum()
        a22 = (w * d[:, 1] * d[:, 1]).sum()
        r1 = (w * d[:, 0] * df).sum()
        r2 = (w * d[:, 1] * df).sum()
        det = a11 * a22 - a12 * a12
        if abs(det) < 1e-300:
            continue
        grad[i, 0] = (a22 * r1 - a12 * r2) / det
        grad[i, 1] = (a11 * r2 - a12 * r1) / det
    return grad


def _hct_ordinates(v1, v2, v3, f, g):
    """The 19 Bezier ordinates of the reduced Hsieh-Clough-Tocher
    macroelement (the element scipy's CloughTocher2DInterpolator uses;
    public construction, Farin 1986):

    - vertex + gradient ring ordinates are cubic Hermite data,
    - the interior ordinate of each micro-triangle is fixed by the
      *reduced* condition (cross-boundary derivative LINEAR along each
      exterior edge),
    - internal-edge ordinates s_i and the center follow from C1 across
      the three internal edges:  s_i = (r_prev + r_next + q_i)/3,
      fc = (s1+s2+s3)/3  (derived from the standard coplanarity
      conditions with the centroid split point).
    """
    vc = (v1 + v2 + v3) / 3.0
    f1, f2, f3 = f
    g1, g2, g3 = g
    q1 = f1 + g1 @ (vc - v1) / 3.0
    q2 = f2 + g2 @ (vc - v2) / 3.0
    q3 = f3 + g3 @ (vc - v3) / 3.0
    p12 = f1 + g1 @ (v2 - v1) / 3.0
    p21 = f2 + g2 @ (v1 - v2) / 3.0
    p23 = f2 + g2 @ (v3 - v2) / 3.0
    p32 = f3 + g3 @ (v2 - v3) / 3.0
    p31 = f3 + g3 @ (v1 - v3) / 3.0
    p13 = f1 + g1 @ (v3 - v1) / 3.0

    def _dir_bary(d, a, b, c):
        # barycentric *direction* coordinates of vector d w.r.t. (a,b,c)
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        d0 = ((b[1] - c[1]) * d[0] + (c[0] - b[0]) * d[1]) / det
        d1 = ((c[1] - a[1]) * d[0] + (a[0] - c[0]) * d[1]) / det
        return d0, d1, -d0 - d1

    def _r(va, vb, fa, fb, pab, pba, qa, qb):
        # interior ordinate of the micro-triangle on exterior edge a-b:
        # cross-derivative (in the edge-normal direction) must be
        # LINEAR along the edge: c11 = (c20 + c02)/2
        e = vb - va
        nrm = np.array([-e[1], e[0]])
        d0, d1, d2 = _dir_bary(nrm, va, vb, vc)
        c20 = d0 * fa + d1 * pab + d2 * qa
        c02 = d0 * pba + d1 * fb + d2 * qb
        return ((c20 + c02) / 2.0 - d0 * pab - d1 * pba) / d2

    r_a = _r(v1, v2, f1, f2, p12, p21, q1, q2)
    r_b = _r(v2, v3, f2, f3, p23, p32, q2, q3)
    r_c = _r(v3, v1, f3, f1, p31, p13, q3, q1)
    s1 = (r_c + r_a + q1) / 3.0
    s2 = (r_a + r_b + q2) / 3.0
    s3 = (r_b + r_c + q3) / 3.0
    fc = (s1 + s2 + s3) / 3.0
    return {
        "f": (f1, f2, f3), "q": (q1, q2, q3),
        "p": (p12, p21, p23, p32, p31, p13),
        "r": (r_a, r_b, r_c), "s": (s1, s2, s3), "fc": fc,
    }


def _bb3(u, v, w, b300, b030, b003, b210, b201, b120, b021, b102, b012, b111):
    return (
        b300 * u**3 + b030 * v**3 + b003 * w**3
        + 3.0 * (b210 * u * u * v + b201 * u * u * w
                 + b120 * u * v * v + b021 * v * v * w
                 + b102 * u * w * w + b012 * v * w * w)
        + 6.0 * b111 * u * v * w
    )


def ct_interpolate(
    points: np.ndarray,
    values: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    gradients: np.ndarray | None = None,
    fill: float = np.nan,
    gradient_radius: float | None = None,
) -> np.ndarray:
    """Clough-Tocher piecewise-cubic C1 interpolation — the estimator
    behind ``griddata.reproject(method='cubic')`` (reference
    griddata.py:328-330 hands scipy the same macroelement).

    Properties (pinned by tests): interpolates the data exactly, C1
    across every edge, reproduces linear fields with estimated
    gradients and quadratic fields with exact gradients. Queries
    outside the convex hull get ``fill``.

    The micro-triangle containing a query point falls out of the macro
    barycentrics (l1,l2,l3) directly: it is the one opposite the
    SMALLEST l, with micro coords e.g. (u,v,w) = (l1-l3, l2-l3, 3*l3)
    for the micro on edge V1-V2.
    """
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    qx = np.asarray(qx, dtype=np.float64).ravel()
    qy = np.asarray(qy, dtype=np.float64).ravel()
    out = np.full(qx.shape, fill, dtype=np.float64)
    tris = delaunay(pts)
    if len(tris) == 0:
        return out
    if gradients is None:
        gradients = estimate_gradients(pts, vals, tris, radius=gradient_radius)
    grads = np.asarray(gradients, dtype=np.float64)
    done = np.zeros(qx.shape, dtype=bool)
    eps = 1e-12
    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0.0:
            continue
        l1 = ((b[1] - c[1]) * (qx - c[0]) + (c[0] - b[0]) * (qy - c[1])) / det
        l2 = ((c[1] - a[1]) * (qx - c[0]) + (a[0] - c[0]) * (qy - c[1])) / det
        l3 = 1.0 - l1 - l2
        inside = ~done & (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        if not inside.any():
            continue
        o = _hct_ordinates(
            a, b, c,
            (vals[t[0]], vals[t[1]], vals[t[2]]),
            (grads[t[0]], grads[t[1]], grads[t[2]]),
        )
        f1, f2, f3 = o["f"]
        q1, q2, q3 = o["q"]
        p12, p21, p23, p32, p31, p13 = o["p"]
        r_a, r_b, r_c = o["r"]
        s1, s2, s3 = o["s"]
        fc = o["fc"]
        L1, L2, L3 = l1[inside], l2[inside], l3[inside]
        res = np.empty(L1.shape, dtype=np.float64)
        # micro A (edge V1-V2, opposite V3): l3 smallest
        mA = (L3 <= L1) & (L3 <= L2)
        # micro B (edge V2-V3): l1 smallest
        mB = ~mA & (L1 <= L2)
        mC = ~mA & ~mB
        res[mA] = _bb3(L1[mA] - L3[mA], L2[mA] - L3[mA], 3.0 * L3[mA],
                       f1, f2, fc, p12, q1, p21, q2, s1, s2, r_a)
        res[mB] = _bb3(L2[mB] - L1[mB], L3[mB] - L1[mB], 3.0 * L1[mB],
                       f2, f3, fc, p23, q2, p32, q3, s2, s3, r_b)
        res[mC] = _bb3(L3[mC] - L2[mC], L1[mC] - L2[mC], 3.0 * L2[mC],
                       f3, f1, fc, p31, q3, p13, q1, s3, s1, r_c)
        out[inside] = res
        done |= inside
    return out
