"""Training-data preparation operators: repetition/quality signals,
deterministic corpus splits, and sequence packing (task brief — the
operations a large-scale LLM training pipeline runs over the documents
table after dedup/filtering).

All three families are designed for the 100 TB shape:

- **Repetition signals** (the Gopher-style repetition filters, Rae et
  al. 2021 §A1.1, public) are pure higher-order-function column
  expressions — per-document ``array_sort`` + ``aggregate`` over the
  line/2-gram arrays, whole-stage codegen, ZERO shuffle. The obvious
  explode + groupBy(doc_id, gram) implementation shuffles
  |docs| x |grams| rows to compute a per-document mode; the HOF form
  keeps the work where the document already is.
- **Hash split** assigns train/val/test deterministically from
  ``md5(doc_id)`` — no ``rand()``, so the assignment is reproducible
  across retries/resumes and expressible in ANSI SQL (oracle-gated).
  At 10^12 docs a seeded-random split cannot be re-derived after a
  partial failure; a hash split can, from the key alone.
- **Sequence packing** implements the standard GPT-style
  concatenate-then-chunk packing: documents are concatenated in a
  deterministic per-shard order and cut every ``budget`` tokens, so a
  document may straddle two chunks (exactly how pretraining batches
  are packed). This is a window prefix-sum per shard — ONE shuffle on
  the shard key, then a partition-local sort; at scale the shard key
  is the ingest partition so the sort never sees more than one
  shard's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "repetition_signals",
    "hash_bucket_col",
    "hash_split_col",
    "pack_sequences",
    "ngram_array_col",
    "eval_ngrams",
    "decontaminate",
    "contaminated_ids",
    "sample_by_domain",
]


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append Gopher-style repetition columns, each rounded to 6:

    - ``dup_line_frac``: 1 - distinct lines / lines.
    - ``dup_line_char_frac``: characters in lines occurring more than
      once / total line characters (every occurrence counts).
    - ``top2gram_frac``: occurrences of the most frequent token 2-gram
      / total 2-grams (0.0 when the document has < 2 tokens).

    Implementation: per-document HOFs only (array_sort + an aggregate
    over a sorted-adjacency scan) — no explode, no shuffle; the mode of
    the 2-gram multiset is the longest equal run in the sorted gram
    array. Intermediates are projected once per stage (the
    quality_score_staged lesson: composing them as one Column makes
    Catalyst re-expand the split() subtree pathologically).
    """
    t = F.col(text_col)
    staged = docs.withColumns(
        {
            "_lines": F.split(t, "\n"),
            "_toks": F.split(F.lower(F.trim(t)), r"\s+"),
        }
    ).withColumns(
        {
            "_lsort": F.array_sort(F.col("_lines")),
            "_nl": F.size(F.col("_lines")),
            "_nt": F.size(F.col("_toks")),
        }
    )
    lsort = F.col("_lsort")
    # a line occurrence is a duplicate iff it equals a sorted neighbor;
    # F.get is 0-based and NULL out of bounds, and when() treats a NULL
    # comparison as false — the ends fall out naturally
    dup_chars = F.aggregate(
        F.sequence(F.lit(0), F.col("_nl") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            (F.get(lsort, i) == F.get(lsort, i - 1))
            | (F.get(lsort, i) == F.get(lsort, i + 1)),
            F.length(F.get(lsort, i)),
        ).otherwise(F.lit(0)),
    )
    # total line chars = chars minus the newlines that split() removed
    total_line_chars = F.length(t) - (F.col("_nl") - 1)

    toks = F.col("_toks")
    grams_sorted = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.col("_nt") - 2),
            lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
        )
    )
    staged = staged.withColumns(
        {
            "_dup_chars": dup_chars,
            "_tchars": total_line_chars,
            "_gsort": F.when(F.col("_nt") >= 2, grams_sorted),
        }
    )
    gs = F.col("_gsort")
    # longest equal run in the sorted gram array = mode count
    top_run = F.aggregate(
        F.sequence(F.lit(1), F.size(gs) - 1),
        F.struct(F.lit(1).cast("int").alias("cur"), F.lit(1).cast("int").alias("best")),
        lambda acc, i: F.when(
            F.get(gs, i) == F.get(gs, i - 1),
            F.struct(
                (acc["cur"] + 1).alias("cur"),
                F.greatest(acc["best"], acc["cur"] + 1).alias("best"),
            ),
        ).otherwise(F.struct(F.lit(1).cast("int").alias("cur"), acc["best"].alias("best"))),
        lambda acc: acc["best"],
    )
    return staged.withColumns(
        {
            "dup_line_frac": F.round(
                F.lit(1.0) - F.size(F.array_distinct(F.col("_lines"))) / F.col("_nl"), 6
            ),
            "dup_line_char_frac": F.round(
                F.col("_dup_chars") / F.greatest(F.col("_tchars"), F.lit(1)), 6
            ),
            "top2gram_frac": F.round(
                F.when(F.col("_nt") >= 2, top_run / (F.col("_nt") - 1)).otherwise(
                    F.lit(0.0)
                ),
                6,
            ),
        }
    ).drop("_lines", "_toks", "_lsort", "_nl", "_nt", "_dup_chars", "_tchars", "_gsort")


def hash_bucket_col(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's
    string form — bit-identical in Spark and ANSI SQL (DuckDB twin:
    ``CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4) AS INTEGER)
    % n``), so split assignment is auditable outside Spark."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")
        % n_buckets
    )


def hash_split_col(
    key: Column, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """'train' / 'val' / 'test' from the deterministic hash bucket."""
    b = hash_bucket_col(key, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def ngram_array_col(text: Column, n: int) -> Column:
    """Distinct lowercase whitespace token ``n``-grams of ``text`` as an
    array column (empty for documents shorter than ``n`` tokens).
    Matches the ANSI form ``string_split_regex(lower(trim(t)), '\\s+')``
    + positional concat, so oracles can recompute it."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    nt = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), nt - F.lit(n)),
        lambda i: F.concat_ws(
            " ", *[F.get(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    # sequence(0, negative) would count DOWN — guard short docs
    return F.when(nt >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def eval_ngrams(
    eval_docs: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Distinct ``n``-grams of the eval corpus as ONE broadcastable row
    ``{_eval_grams: array<string>}`` — the shape `decontaminate`
    cross-joins against (constants as a broadcast relation, not plan
    literals, so the gram set never bloats the plan tree)."""
    return (
        eval_docs.select(
            F.explode(ngram_array_col(F.col(text_col), n)).alias("_g")
        )
        .distinct()
        .agg(F.collect_set("_g").alias("_eval_grams"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    threshold: int = 1,
) -> DataFrame:
    """Eval-set decontamination (the standard pretraining hygiene step:
    drop training documents sharing rare n-grams with held-out eval
    data). Appends:

    - ``eval_hits``: number of DISTINCT ``n``-grams of the document
      that occur anywhere in ``eval_docs``,
    - ``contaminated``: ``eval_hits >= threshold``.

    Plan shape for 100 TB: the eval gram set (eval corpora are small
    by construction) reduces to a single array row, broadcast; the
    corpus side is ``array_intersect`` per document — whole-stage
    codegen, ZERO corpus shuffle, bodies never move. When the eval
    gram set is large enough that a per-row intersect probe hurts,
    use :func:`contaminated_ids` (explode + broadcast hash join, only
    matching grams shuffle) and mark via a broadcast semi-join on the
    typically-tiny contaminated-id set.
    """
    grams = eval_ngrams(eval_docs, n, text_col)
    hits = F.size(
        F.array_intersect(
            ngram_array_col(F.col(text_col), n), F.col("_eval_grams")
        )
    )
    return (
        docs.crossJoin(F.broadcast(grams))
        .withColumn("eval_hits", hits.cast("long"))
        .drop("_eval_grams")
        .withColumn("contaminated", F.col("eval_hits") >= F.lit(threshold))
    )


def contaminated_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The join-shaped decontamination scale path: per-document distinct
    grams explode map-side, broadcast-inner-join the eval gram table
    (only MATCHING grams reach the aggregate), count per document.
    Returns ``(id_col, eval_hits)`` for contaminated documents only —
    equal to :func:`decontaminate`'s positive rows (pytest-pinned)."""
    ev = (
        eval_docs.select(
            F.explode(ngram_array_col(F.col(text_col), n)).alias("_g")
        ).distinct()
    )
    dg = docs.select(
        id_col, F.explode(ngram_array_col(F.col(text_col), n)).alias("_g")
    )
    return (
        dg.join(F.broadcast(ev), "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("eval_hits"))
    )


def sample_by_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.5,
    broadcast_rates: bool = True,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Temperature-style domain rebalancing (the multilingual /
    multi-source training-mix resample): per-domain keep rate
    ``(min_count / count_domain) ** (1 - alpha)`` — ``alpha=1`` keeps
    everything, ``alpha=0`` equalizes expected per-domain counts,
    between values flatten the head. Appends ``keep_rate`` (rounded
    to 6) and ``sampled``; the caller filters on ``sampled``.

    The keep decision is md5-deterministic in ``id_col`` (no rand()),
    so the sample is reproducible across retries/resumes and
    re-derivable from the key alone — the same property as
    :func:`hash_split_col`, and ANSI-expressible for oracles.

    Plan shape: ONE aggregate over the domain key (tiny output), the
    global min via a 1-row cross join, rates broadcast back onto the
    corpus — the corpus itself never shuffles. For extreme domain
    cardinality (rates table too big to broadcast) pass
    ``broadcast_rates=False`` for a plain shuffle join on the domain
    key.

    ``counts_df``: optional ROW-PARITY source for the per-domain
    counts. When ``df`` sits at the end of a long row-preserving
    chain, the counts aggregate otherwise re-evaluates that whole
    chain just to read the domain column; passing the underlying
    table (projected to the domain column) computes identical counts
    from a plain scan. The caller asserts row parity.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = (counts_df if counts_df is not None else df).groupBy(
        domain_col
    ).agg(F.count("*").alias("_dc"))
    mn = counts.agg(F.min("_dc").alias("_dcmin"))
    ratio = F.col("_dcmin") / F.col("_dc")
    # exponent 0.5 routes through sqrt: IEEE 754 requires sqrt (and /)
    # correctly rounded, so two engines agree bit-for-bit — libm pow
    # carries no such guarantee and its last-ulp drift under a 6-dp
    # round is exactly the cross-engine hash flake class
    exp = 1.0 - alpha
    raw = F.sqrt(ratio) if exp == 0.5 else F.pow(ratio, F.lit(exp))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        domain_col,
        F.round(raw, 6).alias("keep_rate"),
    )
    if broadcast_rates:
        rates = F.broadcast(rates)
    # uniform u in [0, 1) from the first 8 md5 hex digits — matches
    # DuckDB: CAST('0x' || substr(md5(k), 1, 8) AS BIGINT) / 2^32
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        / F.lit(4294967296.0)
    )
    return df.join(rates, domain_col).withColumn("sampled", u < F.col("keep_rate"))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """GPT-style concat-and-chunk packing: within each shard, documents
    are concatenated in ``order_col`` order and cut every ``budget``
    tokens. Appends:

    - ``pack_first`` / ``pack_last``: first/last chunk ids the document
      lands in (a document longer than the remaining chunk space
      straddles — standard pretraining packing, no padding waste),
    - ``pack_off``: the document's start offset inside ``pack_first``.

    Zero-token documents attach to the chunk at their offset
    (pack_last = pack_first). One shuffle on the shard key; the chunk
    id is a pure prefix-sum expression, so the plan is a window over a
    sort — at 10^12 docs, shard by the ingest partition so each sort
    stays partition-local.
    """
    w = Window.partitionBy(shard_col).orderBy(order_col)
    tok = F.col(tokens_col).cast("long")
    cum_excl = F.sum(tok).over(w) - tok
    out = docs.withColumn("_cum0", cum_excl)
    b = int(budget)
    # `div` keeps the chunk id integral end-to-end — double division
    # would round at 10^12-token prefix sums
    return out.withColumns(
        {
            "pack_first": F.expr(f"_cum0 div {b}"),
            "pack_last": F.greatest(
                F.expr(f"(_cum0 + CAST({tokens_col} AS BIGINT) - 1) div {b}"),
                F.expr(f"_cum0 div {b}"),
            ),
            "pack_off": F.col("_cum0") % F.lit(b),
        }
    ).drop("_cum0")
