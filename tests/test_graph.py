"""Link-graph analytics (operators/graph.py): degrees and
power-iteration PageRank with dangling-mass redistribution, pinned
against an independent numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from georeader_spark.operators.graph import degrees, pagerank


def _np_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = 1.0 - contrib.sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_two_node_cycle(spark):
    # symmetric cycle -> uniform ranks at any iteration count
    pr = {r.node: r.rank for r in
          pagerank(_edges_df(spark, [(0, 1), (1, 0)]), iters=5).collect()}
    assert pr[0] == pytest.approx(0.5, abs=1e-12)
    assert pr[1] == pytest.approx(0.5, abs=1e-12)


def test_mass_conservation_with_dangling(spark):
    # node 2 is dangling: total mass must still be exactly 1
    pr = pagerank(_edges_df(spark, [(0, 1), (1, 2)]), iters=7).collect()
    assert sum(r.rank for r in pr) == pytest.approx(1.0, abs=1e-9)


def test_matches_numpy_reference(spark):
    # deterministic pseudo-random graph incl. dangling nodes + a hub
    edges = []
    for h in range(50):
        if h % 11 == 0:
            continue  # dangling
        for k in range(1 + h % 3):
            v = (h * (2 * k + 3) + k + 1) % 50
            if v != h:
                edges.append((h, v))
        if h != 3:
            edges.append((h, 3))  # hub
    edges = sorted(set(edges))
    ref = _np_pagerank(edges, iters=10)
    got = {r.node: r.rank for r in
           pagerank(_edges_df(spark, edges), iters=10).collect()}
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], rel=1e-10)
    # the hub dominates
    assert got[3] == max(got.values())


def test_degrees(spark):
    d = {r.node: (r.out_deg, r.in_deg) for r in
         degrees(_edges_df(spark, [(0, 1), (0, 2), (1, 2)])).collect()}
    assert d == {0: (2, 0), 1: (1, 1), 2: (0, 2)}


def test_checkpoint_cadence_value_invariant(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2)]
    a = sorted((r.node, round(r.rank, 12)) for r in
               pagerank(_edges_df(spark, edges), iters=6,
                        checkpoint_every=1).collect())
    b = sorted((r.node, round(r.rank, 12)) for r in
               pagerank(_edges_df(spark, edges), iters=6,
                        checkpoint_every=3).collect())
    assert a == b
