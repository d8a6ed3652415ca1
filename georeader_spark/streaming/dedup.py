"""Streaming exact deduplication: keep the FIRST-ARRIVED copy of each
distinct document across an unbounded stream (the online form of
``operators.dedup.exact_dedup_keep_first`` — a crawl-ingest pipeline
dedups against everything it has EVER seen, not per micro-batch, so
the seen-set must be engine-managed keyed state, not a batch join).

Shape: group by the 16-byte md5 of the normalized body and carry one
tiny state tuple per distinct document — ``applyInPandasWithState``
shards the state by key across executors and checkpoints it, exactly
like the sessionizer (stateful_sessions.py). Within one micro-batch a
key's rows arrive together (the groupBy shuffle), so the first-arrival
winner inside a batch is the minimum (doc_id) — deterministic — and
across batches the state makes every later copy a duplicate.

State scale: one (first_id, n_seen) per DISTINCT body. At 10^11 docs
with ~50% dup rate that is ~10^10 keys sharded over the cluster's
state stores — the standard RocksDB-backed streaming-dedup deployment
(Spark's own ``dropDuplicates`` on streams builds the same keyed
state; this operator additionally TRACKS per-key duplicate counts in
state (``n_seen`` — not emitted; an update-mode variant could surface
it) and survives checkpoint restarts without re-emitting, which the
tests pin).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("doc_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_id", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _dedup_group(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_md5,) = key
    ids = []
    for pdf in pdfs:
        ids.extend(int(i) for i in pdf["doc_id"])
    if not ids:
        return
    if state.exists:
        first_id, n_seen = state.get
        state.update((first_id, n_seen + len(ids)))
        return  # key already emitted by an earlier batch: all dupes
    first_id = min(ids)  # deterministic intra-batch winner
    state.update((first_id, len(ids)))
    yield pd.DataFrame({"text_md5": [text_md5], "doc_id": [first_id]})


def streaming_exact_dedup(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs(id_col long, text_col string) stream -> first-arrival
    survivors ``(text_md5, doc_id)``, exactly one row EVER per distinct
    body. Duplicate copies update the keyed state's ``n_seen`` and
    emit nothing. NoTimeout: seen-keys state is permanent by design
    (bound it with a TTL timeout in deployments that can re-admit
    after expiry)."""
    keyed = docs_stream.select(
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_md5"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
