"""Feature-hashed text embeddings (the hashing trick, Weinberger et
al. 2009): a deterministic, vocabulary-free bag-of-words embedding
that bridges the documents table to the embedding operators
(similarity.semantic_dedup, ANN) — the standard cheap featurizer for
corpus-level semantic dedup when no learned encoder is in the loop.

Engine-portable by construction: bucket and sign derive from md5 hex
prefixes (the repo-wide convention, traindata.hash_bucket_col), and
the embedding values are signed token counts — exact small integers —
so every downstream dot product / norm is exact and a DuckDB twin can
reproduce the full embed -> cluster -> dedup chain bit-for-bit.

100 TB shape: one shuffle on (doc, bucket) with map-side partial sums
(rows after the partial = nnz <= dim per doc, NOT tokens), then one
(doc) regroup of <= dim entries to assemble the dense vector. Bodies
never shuffle; the wide exchange carries (id, int, int).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_embed(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dense ``array<double>`` feature-hashing embedding per document:
    token -> bucket ``md5[0:8] % dim``, sign +/-1 from md5 hex digit 9
    (even -> +1), value = signed occurrence count. Tokenization is the
    repo-wide ANSI-mirrorable form split(lower(trim(text)), '\\s+').

    Returns ``(id_col, embedding array<double>)`` — integer-valued.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    t = docs.select(F.col(id_col), F.explode(toks).alias("tok"))
    h = F.md5(F.col("tok"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim
    ).alias("b")
    sign = (
        F.when(
            F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("s")
    )
    vals = (
        t.select(id_col, bucket, sign)
        .groupBy(id_col, "b")
        .agg(F.sum("s").alias("v"))
    )
    return (
        vals.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), F.col("v")))
            ).alias("_m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.coalesce(
                    F.element_at("_m", j.cast("long")), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )
