"""BPE tokenizer: kernel training/encoding + the distributed apply."""

import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels import bpe as kbpe
from georeader_spark.operators.bpe import (
    bpe_encode, bpe_token_counts, sample_and_train)


def test_train_merges_most_frequent_pair_first():
    # 'aaab' x3: pair (a,a) appears 6 times, (a,b) 3 -> first merge (97,97)
    merges = kbpe.train_bpe(["aaab aaab aaab"], n_merges=2)
    assert merges[0] == (97, 97)
    # second merge: symbols now [256, a, b]: pairs (256,97) x3, (97,98) x3
    # tie -> first-seen order: (256, 97)
    assert merges[1] == (256, 97)


def test_encode_applies_merges_in_rank_order():
    merges = kbpe.train_bpe(["abab abab"], n_merges=2)
    ids = kbpe.encode("abab", merges)
    # (a,b)->256 then (256,256)->257: the whole word is one token
    assert ids == [257]
    # unseen bytes pass through as raw byte ids
    assert kbpe.encode("xy", merges) == [120, 121]


def test_decode_roundtrip_per_word():
    corpus = ["der quick fox", "der lazy dog der", "naïve café über"]
    merges = kbpe.train_bpe(corpus, n_merges=30)
    for t in corpus + ["unseen wörds"]:
        for w in t.split():
            ids = kbpe.encode(w, merges)
            assert kbpe.decode(ids, merges) == w.encode("utf-8")


def test_fewer_tokens_than_bytes_on_training_domain():
    corpus = ["the cat sat on the mat"] * 20
    merges = kbpe.train_bpe(corpus, n_merges=40)
    ids = kbpe.encode("the cat sat", merges)
    assert len(ids) < len("thecatsat".encode())


def test_distributed_apply_matches_kernel(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = sample_and_train(docs, n_merges=64, sample_rows=100)
    got = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_encode(docs.limit(50), merges).collect()}
    ref_rows = docs.select("doc_id", "text").limit(50).collect()
    for r in ref_rows:
        assert got[r.doc_id] == kbpe.encode(r.text, merges)


def test_token_counts_and_compression(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = sample_and_train(docs, n_merges=64, sample_rows=100)
    out = bpe_token_counts(docs, merges).collect()
    assert len(out) == docs.count()
    # trained merges compress in-domain text: >1 byte per token on avg
    assert sum(r.bytes_per_token for r in out) / len(out) > 1.0
    # apply is map-only: no exchange in the encode plan
    plan = bpe_encode(docs, merges)._jdf.queryExecution() \
        .executedPlan().toString().lower()
    assert "exchange" not in plan
