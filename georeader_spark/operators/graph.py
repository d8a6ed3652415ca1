"""Link-graph analytics over the crawl's host graph.

Domain-level link analysis is a curation staple for web-scale training
corpora (site-quality ranking drives crawl sampling and filtering the
same way per-domain rollups do), and PageRank is the canonical
iterative Spark workload. The reference engine has no graph surface
(its joins are spatial: /root/reference/georeader/vectorize.py,
rasterize.py); this module is part of the web-text operator family the
graft adds.

Scale shape (100 TB of edges):

- Each iteration is ONE shuffle pair: join ranks->edges on ``src``
  (both sides hash-partitioned on src; at scale, pre-bucket the edge
  table on src and the join co-locates with zero edge movement — the
  edge table is the 100 TB side and must never re-shuffle per
  iteration), then ``groupBy(dst)`` with a map-side partial sum — a
  hub host with 10^8 in-links costs one partial row per partition,
  not a hot reducer.
- Dangling mass (nodes with no out-edges) is recovered by
  CONSERVATION — ``dangling = total - sum(contribs)`` — as a 1-row
  aggregate broadcast back, instead of a per-iteration driver
  ``collect`` or an anti-join against the rank table.
- Lineage is truncated every iteration (``localCheckpoint``): the
  iterative plan otherwise grows linearly and re-optimizes the whole
  chain each action — the standard Spark iterative-algorithm pattern
  (persist + cut), same lesson as the generator lineage cut in
  sources/pages.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node (out_deg, in_deg) — one pass per direction, outer-merged
    so dangling (out_deg=0) and source-only (in_deg=0) nodes appear."""
    out_d = (
        edges.groupBy(F.col(src_col).alias("node"))
        .agg(F.count("*").alias("out_deg"))
    )
    in_d = (
        edges.groupBy(F.col(dst_col).alias("node"))
        .agg(F.count("*").alias("in_deg"))
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 1,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Power-iteration PageRank with dangling-mass redistribution.

    ``rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/outdeg(u)
    + dangling_i/N)`` — total rank mass stays exactly 1 per iteration,
    the standard formulation. Deterministic for a fixed ``iters``
    (hence SQL-expressible by unrolling — the oracle twin in
    queries.py does exactly that).

    One driver action total (the node count); per-iteration dangling
    mass is a 1-row aggregate CROSS-joined back (broadcast by size),
    never collected. ``checkpoint_every`` controls the lineage cut
    cadence (eager localCheckpoint; values are unaffected — pinned by
    test). ``broadcast_ranks=True`` broadcasts the rank table into the
    contribution join, so the (huge) edge table is never shuffled at
    all — correct whenever the NODE table fits per-executor (host- or
    domain-level graphs: 10^6-10^7 nodes against 10^11 edges), which
    is exactly the training-data curation case; leave False for
    node-scale graphs and pre-bucket the edges on src instead.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # contribution weight folded into the edge row once: the per-iter
    # join then carries only (dst, w) against the rank table
    ew = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w")
    ).persist()
    n = nodes.count()  # the one driver scalar
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        r_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            ew.join(r_side, ew["src"] == r_side["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # mass conservation: what non-dangling nodes emitted is
        # sum(contribs); the rest of the (unit) mass is dangling
        mass = contribs.agg(
            (F.lit(1.0) - F.sum("contrib")).alias("dangling")
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(mass))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
