"""kNN lookups via cell-ring expansion (north rule; SURVEY.md §2.3).

The reference has no kNN (nearest-neighbor appears only as scipy
griddata Voronoi assignment, griddata.py:328-330); the north rule
requires one built on the cell index.

Two strategies, both returning ``(query cols..., neighbor cols...,
rank, dist_m)``:

- :func:`knn_bruteforce` — broadcast the (small) query set, crossJoin
  + haversine + ``row_number`` rank. The right plan when |Q| is small:
  one pass over the big table, no shuffle of the big side beyond the
  rank partitioning on query id. Fully SQL-expressible -> oracle-gated.
- :func:`knn_ring` — candidates restricted to cells within Chebyshev
  ring ``k_ring`` of each query's cell (broadcast (query, cell) pairs,
  equi-join on cell). Iteratively doubles the ring for queries that
  did not find k *guaranteed* neighbors. The guarantee: a neighbor at
  ring distance > kr is at least ``(kr) * cell_h_deg`` degrees of
  latitude away; once the kth candidate is closer than that bound the
  ring is sufficient. This is the scale path: at 10^12 points the
  cell equi-join touches only ring cells' partitions.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import cell_encode, haversine_m
from ..kernels import cells as kcells


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_id: str = "q_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
) -> DataFrame:
    """Exact kNN by broadcast cross join + two-phase rank. Ties broken
    by neighbor id so results are total-ordered and engine-independent.

    The rank is partial-first: top-k per (query, input partition) — a
    shuffle over |Q| * P evenly-sized groups — then a global rank over
    the <= k * P survivors. A single rank partitioned only by query id
    would funnel every pair row through |Q| reducers (the round-1
    bottleneck flagged at 100x scale)."""
    pairs = points.withColumn("_pid", F.spark_partition_id()).crossJoin(
        F.broadcast(queries)
    )
    dist = haversine_m(F.col(lon_col), F.col(lat_col), F.col(q_lon), F.col(q_lat))
    w_part = Window.partitionBy(q_id, "_pid").orderBy(
        F.col("dist_m").asc(), F.col(point_id).asc()
    )
    w_glob = Window.partitionBy(q_id).orderBy(
        F.col("dist_m").asc(), F.col(point_id).asc()
    )
    return (
        pairs.withColumn("dist_m", dist)
        .withColumn("_prank", F.row_number().over(w_part))
        .where(F.col("_prank") <= k)
        .withColumn("rank", F.row_number().over(w_glob))
        .where(F.col("rank") <= k)
        .drop("_pid", "_prank")
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    cell_w: float,
    cell_h: float,
    x0: float = 0.0,
    y0: float = 0.0,
    point_id: str = "point_id",
    px: str = "x",
    py: str = "y",
    q_id: str = "q_id",
    qx: str = "qx",
    qy: str = "qy",
    min_cell_extent: float | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact distributed kNN *join*: nearest ``k`` points for every row
    of a query DataFrame (planar metric ``(px-qx)^2 + (py-qy)^2``).

    This is the scale path the round-1 API lacked: queries are a
    DataFrame (10^6 query points fine), candidates come from a bucketed
    equi-join on grid cells of size (cell_w, cell_h) anchored at
    (x0, y0), rings expand geometrically for unresolved queries, and
    the driver only ever sees per-round *counts* — never data rows.
    Powers griddata nearest/linear gather (griddata.py:286-440
    semantics) and DataFrame-scale kNN.

    Resolution guarantee: a point in a cell at Chebyshev cell-distance
    > r is > r * min(cell_w, cell_h) away, so once the kth candidate
    distance is within that bound the query is exact. Stragglers in
    empty regions fall back to brute force after ``max_rounds``.

    Returns ``(q_id, qx, qy, point_id, d2, rank)``.
    """
    if min_cell_extent is None:
        min_cell_extent = min(cell_w, cell_h)

    pts = points.select(
        F.col(point_id).alias("_pt_id"),
        F.col(px).alias("_px"),
        F.col(py).alias("_py"),
        F.floor((F.col(px) - F.lit(x0)) / F.lit(cell_w)).cast("long").alias("_cx"),
        F.floor((F.col(py) - F.lit(y0)) / F.lit(cell_h)).cast("long").alias("_cy"),
    )
    pending = queries.select(
        F.col(q_id).alias("_q_id"),
        F.col(qx).alias("_qx"),
        F.col(qy).alias("_qy"),
        F.floor((F.col(qx) - F.lit(x0)) / F.lit(cell_w)).cast("long").alias("_qcx"),
        F.floor((F.col(qy) - F.lit(y0)) / F.lit(cell_h)).cast("long").alias("_qcy"),
    ).localCheckpoint(eager=True)

    d2 = (F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx")) + (
        F.col("_py") - F.col("_qy")
    ) * (F.col("_py") - F.col("_qy"))
    w = Window.partitionBy("_q_id").orderBy(F.col("d2").asc(), F.col("_pt_id").asc())

    spark = points.sparkSession
    best = None
    resolved = None
    prev_r, r = -1, 1
    # pending-set size tracked driver-side: emptiness after each round
    # is (n_pending - n_done == 0), read off the same tiny per-round
    # aggregate that drives resolution — the former dedicated
    # `isEmpty()` probe job and the last round's pending re-checkpoint
    # are gone (the counts are exact, so the loop's path is unchanged).
    n_pending = pending.count()
    for _ in range(max_rounds):
        # annulus offsets: cells at Chebyshev distance (prev_r, r] — a
        # broadcast DataFrame, NOT an array literal (at r=64 that would
        # be a ~16k-element expression tree and a codegen blowup)
        offsets = [
            (dx, dy)
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
            if max(abs(dx), abs(dy)) > prev_r
        ]
        off_df = spark.createDataFrame(offsets, "dx long, dy long")
        ring = pending.join(F.broadcast(off_df)).select(
            "_q_id", "_qx", "_qy",
            (F.col("_qcx") + F.col("dx")).alias("_cx"),
            (F.col("_qcy") + F.col("dy")).alias("_cy"),
        )
        cand = ring.join(pts, ["_cx", "_cy"]).select(
            "_q_id", "_qx", "_qy", "_pt_id", d2.alias("d2")
        )
        allc = cand if best is None else best.unionByName(cand)
        # per-query candidate sets are ring-bounded (small), so a plain
        # rank per query is cheap here — unlike the all-pairs case
        best = (
            allc.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= k)
            .drop("_rank")
            .localCheckpoint(eager=True)
        )
        bound = (r * min_cell_extent) ** 2
        stats = best.groupBy("_q_id").agg(
            F.count("*").alias("_n"), F.max("d2").alias("_dmax")
        )
        done_ids = stats.where(
            (F.col("_n") >= k) & (F.col("_dmax") <= F.lit(bound))
        ).select("_q_id")
        # one tiny action per round: |done| over the checkpointed best
        # (replaces the former per-round isEmpty() job on pending)
        n_done = done_ids.count()
        newly = best.join(done_ids, "_q_id", "leftsemi")
        resolved = newly if resolved is None else resolved.unionByName(newly)
        n_pending -= n_done
        if n_pending == 0:
            pending = None
            break
        done_renamed = done_ids.withColumnRenamed("_q_id", "_done_id")
        pending = pending.join(
            done_renamed, pending["_q_id"] == F.col("_done_id"), "leftanti"
        ).localCheckpoint(eager=True)
        best = best.join(done_renamed, best["_q_id"] == F.col("_done_id"), "leftanti")
        prev_r, r = r, r * 2

    if pending is not None and n_pending > 0:
        # stragglers (empty regions): brute force just those queries
        pairs = pts.crossJoin(
            F.broadcast(pending.select("_q_id", "_qx", "_qy"))
        ).select("_q_id", "_qx", "_qy", "_pt_id", d2.alias("d2"))
        bf = pairs.withColumn("_rank", F.row_number().over(w)).where(
            F.col("_rank") <= k
        ).drop("_rank")
        resolved = bf if resolved is None else resolved.unionByName(bf)

    ranked = resolved.withColumn("rank", F.row_number().over(w))
    return ranked.select(
        F.col("_q_id").alias(q_id),
        F.col("_qx").alias(qx),
        F.col("_qy").alias(qy),
        F.col("_pt_id").alias(point_id),
        "d2",
        "rank",
    )


def knn_ring(
    points: DataFrame,
    queries: Sequence[Tuple[int, float, float]],
    k: int,
    r: int = 6,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_rounds: int = 6,
) -> DataFrame:
    """Exact kNN via cell-ring expansion.

    ``queries``: (q_id, q_lon, q_lat) tuples (small, driver-side).
    Expands each query's candidate ring until the kth-nearest candidate
    is provably closer than any point outside the ring, then returns
    the same schema as :func:`knn_bruteforce`.
    """
    spark = points.sparkSession
    pts = points.withColumn("cell", cell_encode(F.col(lon_col), F.col(lat_col), r))

    # degrees of latitude per cell row; the worst-case shrink of lon
    # degrees toward the poles means lat spacing is the safe bound
    _, cell_h = kcells.cell_size_deg(r)
    deg_to_m = 111194.926644  # meters per degree latitude (2*pi*R/360)

    pending = list(queries)
    results = None
    k_ring = 1
    for _ in range(max_rounds):
        if not pending:
            break
        # (q_id, q_lon, q_lat, cell) cover of the current rings — built
        # driver-side (|Q| * ring cells rows), broadcast for the equi-join
        rows = []
        for q_id_v, q_lon_v, q_lat_v in pending:
            qcell = kcells.encode(q_lon_v, q_lat_v, r)
            for c in kcells.ring(qcell, k_ring):
                rows.append((q_id_v, q_lon_v, q_lat_v, c))
        ring_df = spark.createDataFrame(
            rows, "q_id long, q_lon double, q_lat double, cell long"
        )
        cand = pts.join(F.broadcast(ring_df), "cell", "inner")
        dist = haversine_m(F.col(lon_col), F.col(lat_col), F.col("q_lon"), F.col("q_lat"))
        w = Window.partitionBy("q_id").orderBy(
            F.col("dist_m").asc(), F.col(point_id).asc()
        )
        ranked = (
            cand.withColumn("dist_m", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        # guarantee: a point outside ring k_ring differs from the query
        # by > k_ring cells in x or y, i.e. >= k_ring * cell_h degrees
        # of separation after removing within-cell offsets. In the x
        # direction a degree shrinks by cos(lat); candidates with
        # |dy| <= k_ring have |lat| <= |q_lat| + (k_ring + 1) * cell_h,
        # so that is the worst-case shrink factor.
        import math

        bounds_m = {}
        for q_id_v, _, q_lat_v in pending:
            lat_max = min(89.9, abs(q_lat_v) + (k_ring + 1) * cell_h)
            cos_min = math.cos(math.radians(lat_max))
            bounds_m[q_id_v] = k_ring * cell_h * deg_to_m * max(cos_min, 0.0)
        got = (
            ranked.groupBy("q_id")
            .agg(F.count("*").alias("n"), F.max("dist_m").alias("dmax"))
            .collect()
        )
        done_ids = {
            row["q_id"]
            for row in got
            if row["n"] >= k and row["dmax"] <= bounds_m.get(row["q_id"], 0.0)
        }
        done_part = ranked.where(F.col("q_id").isin(list(done_ids)) if done_ids else F.lit(False))
        results = done_part if results is None else results.unionByName(done_part)
        pending = [q for q in pending if q[0] not in done_ids]
        k_ring *= 2

    if pending:
        # fall back to brute force for stragglers (sparse regions)
        qdf = spark.createDataFrame(
            list(pending), "q_id long, q_lon double, q_lat double"
        )
        bf = knn_bruteforce(
            pts, qdf, k, point_id=point_id, lon_col=lon_col, lat_col=lat_col
        )
        results = bf if results is None else results.unionByName(bf)
    return results
