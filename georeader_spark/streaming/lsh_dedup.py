"""Streaming NEAR-duplicate filtering: MinHash-LSH bucket collisions
against everything the stream has EVER seen — the online form of
``operators.dedup.minhash_lsh_pairs`` (a crawl-ingest pipeline wants
fuzzy dedup at admission time, not per micro-batch).

Shape: the banded MinHash signature machinery is SHARED with the
batch operator (``dedup._minhash_banded`` — one Arrow UDF pass, then
(band, bucket) keys); the stream keeps ONE tiny state tuple per
distinct (band, bucket) — the bucket's first-ever occupant — via
``applyInPandasWithState``, exactly the dedup.py pattern. Within a
micro-batch a bucket's rows arrive together, so the intra-batch
winner is min(doc_id) — deterministic.

The stateful op emits one VERDICT row per (doc, band):
``(doc_id, band, bucket, first_id)``. A document is a near-duplicate
iff ANY of its bands reports ``first_id != doc_id`` — aggregate with
``lsh_verdicts_per_doc`` in ``foreachBatch`` (or over the sink table).
This is the standard AGGRESSIVE online filter: bucket collision =
drop, no pairwise verify (tune ``bands``/``num_perm`` for precision;
the batch path has the verified variant, dedup.near_dup_clusters).

State scale: one (first_id) per distinct (band, bucket) —
``bands x n_distinct_docs`` upper bound, same order as the streaming
exact-dedup seen-set, sharded and checkpointed by the engine.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("first_id", LongType()),
    ]
)

BUCKET_STATE_SCHEMA = StructType([StructField("first_id", LongType())])


def _bucket_group(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band, bucket = key
    ids = []
    for pdf in pdfs:
        ids.extend(int(i) for i in pdf["doc_id"])
    if not ids:
        return
    if state.exists:
        (first_id,) = state.get
    else:
        first_id = min(ids)  # deterministic intra-batch winner
        state.update((first_id,))
    yield pd.DataFrame(
        {
            "doc_id": ids,
            "band": [int(band)] * len(ids),
            "bucket": [int(bucket)] * len(ids),
            "first_id": [first_id] * len(ids),
        }
    )


def streaming_lsh_verdicts(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """docs stream -> per-(doc, band) verdict rows
    ``(doc_id, band, bucket, first_id)`` against the all-time bucket
    state. Signature/banding parameters must match the batch
    ``minhash_lsh_pairs`` call they are compared against."""
    from ..operators.dedup import _minhash_banded

    bb = _minhash_banded(
        docs_stream.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col)
        ),
        "doc_id",
        text_col,
        num_perm,
        bands,
        shingle_k,
    )
    return bb.groupBy("band", "bucket").applyInPandasWithState(
        _bucket_group,
        outputStructType=VERDICT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lsh_verdicts_per_doc(verdicts: DataFrame) -> DataFrame:
    """Batch aggregation of verdict rows (foreachBatch / sink table):
    ``(doc_id, is_dup, dup_of)`` — a doc is a near-dup iff any band's
    bucket was first claimed by another document; ``dup_of`` is the
    smallest such claimant (NULL when kept)."""
    other = F.when(F.col("first_id") != F.col("doc_id"), F.col("first_id"))
    return verdicts.groupBy("doc_id").agg(
        F.max((F.col("first_id") != F.col("doc_id")).cast("int"))
        .cast("boolean")
        .alias("is_dup"),
        F.min(other).alias("dup_of"),
    )
