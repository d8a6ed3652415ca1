"""Exact-substring dedup stats (operators/dedup.duplicated_span_stats —
the Lee et al. 2022 ExactSubstr criterion re-expressed as an L-gram
inverted shuffle + gaps-and-islands interval merge)."""

import pytest
from pyspark.sql import functions as F

from georeader_spark.operators.dedup import duplicated_span_stats


def _stats(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = duplicated_span_stats(df, length=kw.pop("length", 10), **kw).collect()
    return {r.doc_id: r for r in rows}


def test_cross_doc_duplicate_span(spark):
    shared = "0123456789abcdefghij"  # 20 chars, L=10 -> 11 grams each
    docs = [(1, "X" * 5 + shared + "Y" * 5), (2, "P" * 7 + shared + "Q" * 3)]
    out = _stats(spark, docs)
    # the shared 20 chars are one merged island in each doc
    for d in (1, 2):
        assert out[d].dup_chars == 20
        assert out[d].n_dup_grams == 11
        assert out[d].dup_ratio == round(20 / 30, 6)


def test_no_duplicates(spark):
    out = _stats(spark, [(1, "abcdefghijklmnop"), (2, "ABCDEFGHIJKLMNOP")])
    assert all(r.dup_chars == 0 and r.dup_ratio == 0.0 for r in out.values())
    assert out[1].n_grams == 7


def test_within_doc_repeat_marks_both_occurrences(spark):
    # the criterion counts a second occurrence ANYWHERE, incl. the same doc
    text = "0123456789" + "zz" + "0123456789"
    out = _stats(spark, [(1, text)])
    assert out[1].dup_chars == 20  # both copies marked, gap unmarked
    assert out[1].dup_ratio == round(20 / 22, 6)


def test_short_doc_zero_grams(spark):
    out = _stats(spark, [(1, "short"), (2, "0123456789x0123456789")])
    assert out[1].n_grams == 0 and out[1].dup_chars == 0
    assert out[1].dup_ratio == 0.0
    assert out[2].dup_chars == 20


def test_adjacent_islands_merge(spark):
    # two dup regions overlapping by construction merge into one island:
    # doc 1 = A + B concatenated, docs 2/3 supply A and B separately
    a, b = "0123456789", "abcdefghij"
    out = _stats(spark, [(1, a + b), (2, a), (3, b)])
    assert out[1].dup_chars == 20
    assert out[1].n_dup_grams == 2  # only the two exact-copy grams
    assert out[2].dup_chars == 10 and out[3].dup_chars == 10


def test_hashed_matches_raw(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = sorted(
        tuple(r) for r in duplicated_span_stats(docs, length=30).collect()
    )
    r = sorted(
        tuple(r)
        for r in duplicated_span_stats(docs, length=30, hashed=False).collect()
    )
    assert h == r
    # non-vacuity: the corpus carries real duplicated spans
    assert any(t[3] > 0 for t in h)


class TestRemoval:
    def test_cut_semantics(self, spark):
        from georeader_spark.operators.dedup import remove_duplicated_spans

        shared = "0123456789abcdefghij"
        docs = [(1, "X" * 5 + shared + "Y" * 5),
                (2, "P" * 7 + shared + "Q" * 3),
                (3, "no duplicates whatsoever in here")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(df, length=10).collect()}
        # every marked occurrence removed, unmarked text untouched
        assert out[1] == "X" * 5 + "Y" * 5
        assert out[2] == "P" * 7 + "Q" * 3
        assert out[3] == docs[2][1]

    def test_whole_doc_duplicate_becomes_empty(self, spark):
        from georeader_spark.operators.dedup import remove_duplicated_spans

        df = spark.createDataFrame(
            [(1, "0123456789"), (2, "0123456789")], "doc_id long, text string"
        )
        out = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(df, length=10).collect()}
        assert out == {1: "", 2: ""}

    def test_matches_bruteforce_reference(self, spark, sf_dir):
        """Char-marking reference implementation over the real corpus."""
        from collections import Counter

        from georeader_spark.operators.dedup import remove_duplicated_spans

        rows = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text").collect()
        L = 30
        c = Counter()
        for r in rows:
            t = r.text
            for i in range(max(len(t) - L + 1, 0)):
                c[t[i:i + L]] += 1

        def clean(t):
            marks = [False] * len(t)
            for i in range(max(len(t) - L + 1, 0)):
                if c[t[i:i + L]] > 1:
                    for j in range(i, i + L):
                        marks[j] = True
            return "".join(ch for ch, m in zip(t, marks) if not m)

        ref = {r.doc_id: clean(r.text) for r in rows}
        got = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(
                   spark.createDataFrame(rows), length=L).collect()}
        assert got == ref
        assert any(ref[r.doc_id] != r.text for r in rows)  # non-vacuous

    def test_keep_first_semantics(self, spark):
        from georeader_spark.operators.dedup import remove_duplicated_spans

        shared = "0123456789abcdefghij"
        docs = [(1, "X" * 5 + shared + "Y" * 5),
                (2, "P" * 7 + shared + "Q" * 3),
                (3, "no duplicates whatsoever in here")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(df, length=10, keep_first=True)
               .collect()}
        # doc 1 holds the globally-first occurrence -> untouched;
        # doc 2's copy is removed; doc 3 untouched
        assert out[1] == docs[0][1]
        assert out[2] == "P" * 7 + "Q" * 3
        assert out[3] == docs[2][1]

    def test_keep_first_whole_doc_duplicate(self, spark):
        from georeader_spark.operators.dedup import remove_duplicated_spans

        df = spark.createDataFrame(
            [(1, "0123456789"), (2, "0123456789"), (3, "0123456789")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(df, length=10, keep_first=True)
               .collect()}
        assert out == {1: "0123456789", 2: "", 3: ""}

    def test_keep_first_within_doc_repeat(self, spark):
        from georeader_spark.operators.dedup import remove_duplicated_spans

        # same gram twice INSIDE one doc: first occurrence survives
        t = "0123456789" + "zz" + "0123456789"
        df = spark.createDataFrame([(1, t)], "doc_id long, text string")
        out = remove_duplicated_spans(
            df, length=10, keep_first=True).collect()[0].clean_text
        assert out == "0123456789" + "zz"

    def test_keep_first_matches_bruteforce(self, spark, sf_dir):
        """First-occurrence-exempt char-marking reference over the
        real corpus (global (doc_id, pos) order)."""
        from georeader_spark.operators.dedup import remove_duplicated_spans

        rows = sorted(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").collect(),
            key=lambda r: r.doc_id,
        )
        L = 30
        first_of = {}
        count = {}
        for r in rows:
            t = r.text
            for i in range(max(len(t) - L + 1, 0)):
                g = t[i:i + L]
                count[g] = count.get(g, 0) + 1
                first_of.setdefault(g, (r.doc_id, i))

        def clean(doc_id, t):
            marks = [False] * len(t)
            for i in range(max(len(t) - L + 1, 0)):
                g = t[i:i + L]
                if count[g] > 1 and first_of[g] != (doc_id, i):
                    for j in range(i, i + L):
                        marks[j] = True
            return "".join(ch for ch, m in zip(t, marks) if not m)

        ref = {r.doc_id: clean(r.doc_id, r.text) for r in rows}
        got = {r.doc_id: r.clean_text for r in
               remove_duplicated_spans(
                   spark.createDataFrame(rows), length=L, keep_first=True)
               .collect()}
        assert got == ref
        # non-vacuous both ways: some docs lose text, and keep-first
        # retains strictly more than remove-all somewhere
        assert any(ref[r.doc_id] != r.text for r in rows)
        from georeader_spark.operators.dedup import (
            remove_duplicated_spans as _rm)
        all_rm = {r.doc_id: r.clean_text for r in
                  _rm(spark.createDataFrame(rows), length=L).collect()}
        assert any(len(ref[k]) > len(all_rm[k]) for k in ref)

    def test_stats_consistency(self, spark, sf_dir):
        """length(text) - length(clean) == dup_chars, doc by doc."""
        from georeader_spark.operators.dedup import (
            duplicated_span_stats, remove_duplicated_spans)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        st = {r.doc_id: r.dup_chars for r in
              duplicated_span_stats(docs, length=30).collect()}
        texts = {r.doc_id: len(r.text) for r in
                 docs.select("doc_id", "text").collect()}
        cl = {r.doc_id: len(r.clean_text) for r in
              remove_duplicated_spans(docs, length=30).collect()}
        for d in st:
            assert texts[d] - cl[d] == st[d]
