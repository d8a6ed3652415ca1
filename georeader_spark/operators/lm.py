"""N-gram language-model perplexity scoring (the CCNet-style quality
signal: score every document by an LM trained on a trusted slice, keep
the low-perplexity head / bucket into quality tiers).

Word-bigram model with add-k smoothing — deterministic and closed-form,
so the whole train+score pipeline is oracle-expressible:

    logp(w_i | w_{i-1}) = ln( (c2(w_{i-1} w_i) + k) / (c1(w_{i-1}) + k·V) )
    ppl(doc) = exp( -mean_i logp )

where ``c2`` = bigram count in the training slice, ``c1`` = count of
bigrams STARTING with the context word (the standard conditional
denominator), ``V`` = training vocabulary size.

Scale shape (100 TB corpus):
- **train** is one shuffle: explode bigrams (computed JVM-side from a
  whitespace split), groupBy count with map-side partials — boilerplate
  bigrams (the hot keys) collapse per partition before moving.
- **model size** is vocabulary-bounded, not corpus-bounded (word-level
  grams saturate at ~10^7-10^8 distinct bigrams for web text); it
  broadcasts, so **scoring never shuffles the corpus** — explode,
  broadcast-join twice, partial-mean back to one row per doc. For
  models past broadcast size, hash-partition both sides on the gram
  (the corpus then shuffles (doc_id, gram) pairs, never bodies).
- every count/probability is integer-or-closed-form — two engines
  agree to the last ulp before the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(text_col):
    return F.split(F.lower(F.trim(text_col)), TOKEN_SPLIT)


def _bigrams(tok_col):
    """Array of 'w_i w_{i+1}' strings (JVM transform, no UDF)."""
    return F.transform(
        F.slice(tok_col, 1, F.greatest(F.size(tok_col) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(tok_col, i + 2)),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", lazy_v: bool = False
) -> tuple[DataFrame, DataFrame, "int | DataFrame"]:
    """Train on ``docs`` → (bigram counts, context counts, vocab size).

    Returns ``(c2: (gram, c2), c1: (ctx, c1), v)`` — c1 counts bigrams
    per context word (the conditional denominator), v is the distinct
    token count of the training slice (one small agg job).

    ``lazy_v=True`` returns v as a 1-row DataFrame ``(_v)`` instead of
    collecting it eagerly: :func:`perplexity` cross-joins it broadcast,
    so the vocabulary count rides the scoring job instead of costing a
    separate eager action per pipeline build (0.5 * v is dyadic-exact,
    so the smoothed denominator is bit-identical either way).
    """
    toks = docs.select(_tokens(F.col(text_col)).alias("_toks"))
    grams = toks.select(F.explode(_bigrams(F.col("_toks"))).alias("gram"))
    c2 = grams.groupBy("gram").agg(F.count("*").alias("c2"))
    # c1(ctx) = sum of c2 over grams starting with ctx — exact long
    # arithmetic, identical to re-counting the exploded corpus, but
    # aggregating the vocabulary-sized c2 table instead of a second
    # full corpus explode (the shared c2 exchange is then reused
    # between the two model broadcasts at scoring time)
    c1 = (
        c2.select(F.split(F.col("gram"), " ")[0].alias("ctx"), "c2")
        .groupBy("ctx")
        .agg(F.sum("c2").alias("c1"))
    )
    vdf = toks.select(F.explode("_toks").alias("t")).agg(
        F.count_distinct("t").alias("_v")
    )
    if lazy_v:
        return c2, c1, vdf
    return c2, c1, int(vdf.first()[0])


def perplexity(
    docs: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    v: "int | DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """Per-document perplexity under the trained model.

    Returns ``(id_col, n_bigrams, ppl)``; documents with fewer than two
    tokens get ``ppl`` NULL. Both model tables broadcast — the corpus
    side never shuffles (one explode, two broadcast joins, one partial
    mean back to doc granularity). ``v`` may be the collected int or
    the lazy 1-row ``(_v)`` DataFrame from ``train_bigram_lm(...,
    lazy_v=True)`` — the smoothed denominator is bit-identical (0.5*v
    is a dyadic-exact product in both forms).
    """
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    ex = toks.select(
        id_col, F.explode_outer(_bigrams(F.col("_toks"))).alias("gram")
    ).withColumn("ctx", F.split(F.col("gram"), " ")[0])
    if isinstance(v, DataFrame):
        ex = ex.crossJoin(F.broadcast(v))
        kv = F.lit(k) * F.col("_v")
    else:
        kv = F.lit(k * v)
    scored = (
        ex.join(F.broadcast(c2), "gram", "left")
        .join(F.broadcast(c1), "ctx", "left")
        .select(
            id_col,
            F.when(
                F.col("gram").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + kv)
                ),
            ).alias("logp"),
            F.when(
                F.col("gram").isNotNull(), F.coalesce(F.col("c2"), F.lit(0))
            ).alias("_c2"),
            F.when(
                F.col("gram").isNotNull(), F.coalesce(F.col("c1"), F.lit(0))
            ).alias("_c1"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("logp").alias("n_bigrams"),
        # integer-exact PROXIES of the log-likelihood path: the summed
        # model counts along the doc's bigram walk, in exact long
        # arithmetic. NOT a sufficient statistic for logppl (the sum
        # of ln-ratios is not a function of the summed counts — a bug
        # that redistributes counts per-doc while preserving both sums
        # would pass), but they DO pin training totals, the join, and
        # OOV handling per doc; per-bigram values and logppl itself
        # are pytest-gated (tests/test_lm.py), where a transcendental
        # avg-of-ln's libm/order sensitivity is harmless
        F.coalesce(F.sum("_c2"), F.lit(0)).cast("long").alias("c2_sum"),
        F.coalesce(F.sum("_c1"), F.lit(0)).cast("long").alias("c1_sum"),
        F.round(-F.avg("logp"), digits).alias("logppl"),
        F.round(F.exp(-F.avg("logp")), 2).alias("ppl"),
    )


def perplexity_buckets(
    ppl: DataFrame, edges: list[float], ppl_col: str = "ppl"
) -> DataFrame:
    """CCNet's head/middle/tail split generalized to arbitrary edges:
    bucket i = docs with ``edges[i-1] <= ppl < edges[i]`` (expression
    only — pair with a quantile pass to derive the edges)."""
    b = F.lit(0)
    for i, e in enumerate(edges):
        b = F.when(F.col(ppl_col) >= e, i + 1).otherwise(b)
    return ppl.withColumn("ppl_bucket", b.cast("int"))
