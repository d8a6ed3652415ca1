"""Distributed BPE tokenization (apply side of kernels/bpe.py).

Training happens once, driver-side, on a corpus sample (the standard
production split — see the kernel's docstring); what scales is the
APPLY: the merge table broadcasts (it is vocabulary-sized — tens of
thousands of pairs, kilobytes to megabytes) and every document encodes
independently in an Arrow-batched pandas UDF. At 100 TB this is a
map-only pass: no shuffle, no driver involvement after the broadcast.
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from ..kernels import bpe as kbpe


def sample_and_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    sample_rows: int = 10_000,
    id_col: str = "doc_id",
) -> list:
    """Deterministic sample (first ``sample_rows`` by id — resumable,
    no rand()) → driver-side BPE training. Returns the merge list."""
    rows = (
        docs.select(id_col, text_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    )
    return kbpe.train_bpe((r[1] or "" for r in rows), n_merges)


def bpe_encode(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document BPE token ids (Arrow-batched, map-only)."""
    merges_t = [tuple(m) for m in merges]

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(text: pd.Series) -> pd.Series:
        return text.map(lambda t: kbpe.encode(t or "", merges_t))

    return docs.select(
        F.col(id_col), enc(F.col(text_col)).alias(tokens_col)
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bpe_tokens, compression) — BPE tokens per doc and the
    bytes-per-token ratio (the tokenizer-quality headline number)."""
    enc = bpe_encode(docs, merges, id_col, text_col)
    src = docs.select(
        F.col(id_col),
        F.length(F.encode(F.regexp_replace(F.col(text_col), r"\s+", ""),
                          "UTF-8")).alias("_bytes"),
    )
    return (
        enc.join(src, id_col)
        .select(
            id_col,
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.col("_bytes")
                / F.greatest(F.size("bpe_tokens").cast("double"), F.lit(1.0)),
                6,
            ).alias("bytes_per_token"),
        )
    )
