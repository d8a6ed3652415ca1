"""Learned quality classifier: distributed full-batch logistic
regression over feature-hashed embeddings (the CCNet/fastText-style
"good vs junk" document filter, trained and applied on the cluster).

Training shape (the classic Spark ML pattern): weights live on the
DRIVER (dim+1 floats), each iteration broadcasts them into one
``mapInPandas`` pass that emits one partial-gradient row per Arrow
batch, and those partials REDUCE ON THE CLUSTER (posexplode +
groupBy(pos).sum — map-side partial aggregation) so exactly dim+1
(pos, sum) rows reach the driver per iteration, independent of batch
or partition count. The corpus is never collected. 20 iterations = 20
scans; cache the featurized input for real runs.

Scoring is a pure column expression (sigmoid of a dot product against
broadcast literal weights) — scan-side, codegen, zero shuffles.

Determinism note: partial-gradient summation order varies with
partitioning, so trained weights are reproducible only to float
accumulation noise (~1e-12/iter) — this operator is pytest-gated
against a single-process numpy reference (tests allclose), NOT
hash-oracled; the deterministic heuristic filter (textstats.quality)
remains the oracle-gated path.
"""

from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_logreg(
    feats: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 20,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> List[float]:
    """Full-batch gradient-descent logistic regression on
    ``(vec_col array<double>[dim], label_col in {0,1})``. Returns
    ``[w_0..w_{dim-1}, bias]``. One distributed pass per iteration;
    exactly dim+1 summed-gradient rows reach the driver per iteration
    (cluster-side reduction — never one row per batch)."""
    n = feats.count()
    w = np.zeros(dim + 1, dtype=np.float64)

    for _ in range(iters):
        rows = _gradient_terms(feats, w, label_col, vec_col).collect()
        grad = np.zeros(dim + 1)
        for r in rows:
            grad[r["pos"]] = r["v"]
        grad /= n
        grad[:-1] += l2 * w[:-1]
        w -= lr * grad
    return [float(v) for v in w]


def _gradient_terms(
    feats: DataFrame, w: np.ndarray, label_col: str, vec_col: str
) -> DataFrame:
    """One iteration's summed gradient as a dim+1-row DataFrame
    ``(pos, v)``: a mapInPandas pass emits one partial row per Arrow
    batch, then posexplode + groupBy(pos).sum reduces ON THE CLUSTER
    with map-side partials — at 100 TB the driver receives dim+1 rows,
    not one per batch (plan- and row-count-pinned in tests)."""
    w_b = w.copy()  # captured by the closure, shipped per task

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy())
            y = pdf[label_col].to_numpy(dtype=np.float64)
            z = X @ w_b[:-1] + w_b[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            resid = p - y
            g = np.concatenate([X.T @ resid, [resid.sum()]])
            yield pd.DataFrame({"g": [g.tolist()]})

    partials = feats.select(vec_col, label_col).mapInPandas(
        partial, schema="g array<double>"
    )
    return (
        partials.select(F.posexplode("g").alias("pos", "gv"))
        .groupBy("pos")
        .agg(F.sum("gv").alias("v"))
    )


def score_col(weights: List[float], vec: Column) -> Column:
    """P(label=1) as a pure column expression: sigmoid(w·x + b) with
    the trained weights inlined as codegen literals — scan-side, no
    shuffle, no UDF."""
    *ws, b = weights
    z = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(v)) for v in ws]),
            lambda a, c: a * c,
        ),
        F.lit(float(b)),
        lambda s, v: s + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
