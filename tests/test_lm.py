"""Bigram-LM perplexity scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from georeader_spark.operators.lm import (
    perplexity, perplexity_buckets, train_bigram_lm)


@pytest.fixture(scope="module")
def tiny(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id long, text string",
    )
    return train, train_bigram_lm(train)


def test_train_counts(tiny):
    train, (c2, c1, v) = tiny
    c2d = {r.gram: r.c2 for r in c2.collect()}
    assert c2d == {"the cat": 2, "cat sat": 1, "cat ran": 1,
                   "a dog": 1, "dog sat": 1}
    c1d = {r.ctx: r.c1 for r in c1.collect()}
    assert c1d == {"the": 2, "cat": 2, "a": 1, "dog": 1}
    assert v == 6  # the cat sat ran a dog


def test_perplexity_closed_form(spark, tiny):
    train, (c2, c1, v) = tiny
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra unknown words"), (12, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in perplexity(docs, c2, c1, v, k=0.5).collect()}

    def lp(cc2, cc1):
        return math.log((cc2 + 0.5) / (cc1 + 0.5 * v))

    # doc 10: bigrams (the cat: c2=2,c1=2), (cat sat: c2=1,c1=2)
    exp10 = -(lp(2, 2) + lp(1, 2)) / 2
    assert out[10].logppl == pytest.approx(round(exp10, 6), abs=2e-6)
    assert out[10].n_bigrams == 2
    # doc 11: all-unseen bigrams -> uniform smoothed mass
    exp11 = -lp(0, 0)
    assert out[11].logppl == pytest.approx(round(exp11, 6), abs=2e-6)
    # single-token doc: no bigram, NULL perplexity
    assert out[12].n_bigrams == 0 and out[12].logppl is None
    # in-domain text scores strictly better than unseen text
    assert out[10].logppl < out[11].logppl
    assert out[10].ppl == pytest.approx(math.exp(exp10), abs=0.01)


def test_scoring_broadcasts_model(spark, tiny):
    train, (c2, c1, v) = tiny
    plan = perplexity(train, c2, c1, v)._jdf.queryExecution() \
        .executedPlan().toString().lower()
    assert "broadcast" in plan


def test_buckets(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "doc_id long, ppl double"
    )
    got = {r.doc_id: r.ppl_bucket
           for r in perplexity_buckets(df, [10.0, 100.0]).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_corpus_quality_signal(spark, sf_dir):
    """Self-scored corpus: every doc gets a finite score; repeated
    boilerplate (low-ppl) ranks below unique text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c2, c1, v = train_bigram_lm(docs)
    out = perplexity(docs, c2, c1, v).collect()
    assert len(out) == docs.count()
    assert all(r.logppl is not None for r in out if r.n_bigrams > 0)
