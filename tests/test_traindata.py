"""operators/traindata: repetition signals, hash split, sequence
packing — the training-data-prep layer (oracle-gated end-to-end via
the merged ``text_stats`` query; these tests pin the operator
semantics on hand-built fixtures the synthetic corpus can't produce,
e.g. real multi-line documents with duplicate lines)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from georeader_spark.operators import traindata as TD


def _one(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return TD.repetition_signals(df).collect()[0]


class TestRepetitionSignals:
    def test_no_duplicates(self, spark):
        r = _one(spark, "alpha beta\ngamma delta\nepsilon")
        assert r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == 0.0

    def test_duplicate_lines_exact(self, spark):
        # 4 lines, 'dup' twice: dup_line_frac = 1 - 3/4; char frac =
        # (3+3) dup chars / (3+3+5+2) total line chars
        r = _one(spark, "dup\nother\ndup\nxy")
        assert r["dup_line_frac"] == pytest.approx(0.25)
        assert r["dup_line_char_frac"] == pytest.approx(6 / 13, abs=1e-6)

    def test_triple_line_counts_every_occurrence(self, spark):
        r = _one(spark, "a\na\na\nbb")
        assert r["dup_line_frac"] == pytest.approx(0.5)
        assert r["dup_line_char_frac"] == pytest.approx(3 / 5, abs=1e-6)

    def test_top2gram(self, spark):
        # tokens: 'a b a b a' -> 2-grams: ab ba ab ba -> mode 2 of 4
        r = _one(spark, "a b a b a")
        assert r["top2gram_frac"] == pytest.approx(0.5)
        # case-folding: 'A b a B' has grams 'a b','b a','a b' -> 2/3
        r = _one(spark, "A b a B")
        assert r["top2gram_frac"] == pytest.approx(round(2 / 3, 6))

    def test_short_docs(self, spark):
        assert _one(spark, "single")["top2gram_frac"] == 0.0
        r = _one(spark, "")
        assert r["dup_line_frac"] == 0.0
        assert r["top2gram_frac"] == 0.0

    def test_no_shuffle_in_plan(self, spark):
        """The repetition signals must be per-row expressions — an
        Exchange in the plan means the explode+groupBy anti-pattern
        crept back in."""
        df = spark.createDataFrame([(0, "a b\nc")], "doc_id long, text string")
        plan = TD.repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestHashSplit:
    def test_matches_md5_reference(self, spark):
        df = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            TD.hash_bucket_col(F.col("id")).alias("bucket"),
            TD.hash_split_col(F.col("id")).alias("split"),
        )
        for r in df.collect():
            b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16) % 100
            assert r["bucket"] == b
            assert r["split"] == (
                "train" if b < 90 else "val" if b < 95 else "test"
            )

    def test_deterministic_and_roughly_proportional(self, spark):
        df = spark.range(0, 2000).select(
            TD.hash_split_col(F.col("id")).alias("split")
        )
        counts = {r["split"]: r["n"] for r in
                  df.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert 0.85 <= counts["train"] / 2000 <= 0.95
        assert counts["val"] > 0 and counts["test"] > 0


class TestPackSequences:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long")

    def test_concat_chunk_semantics(self, spark):
        # budget 10; shard A docs of 4, 4, 5, 9 tokens:
        # cum0 = 0, 4, 8, 13 -> packs (0,0) (0,0) (0,1 straddle) (1,2)
        rows = [(1, "A", 4), (2, "A", 4), (3, "A", 5), (4, "A", 9)]
        out = {r["doc_id"]: r for r in
               TD.pack_sequences(self._docs(spark, rows), budget=10).collect()}
        assert (out[1]["pack_first"], out[1]["pack_last"], out[1]["pack_off"]) == (0, 0, 0)
        assert (out[2]["pack_first"], out[2]["pack_last"], out[2]["pack_off"]) == (0, 0, 4)
        assert (out[3]["pack_first"], out[3]["pack_last"], out[3]["pack_off"]) == (0, 1, 8)
        assert (out[4]["pack_first"], out[4]["pack_last"], out[4]["pack_off"]) == (1, 2, 3)

    def test_shards_pack_independently(self, spark):
        rows = [(1, "A", 7), (2, "B", 7), (3, "A", 7), (4, "B", 7)]
        out = {r["doc_id"]: r for r in
               TD.pack_sequences(self._docs(spark, rows), budget=10).collect()}
        # second doc of each shard starts at offset 7 of pack 0
        for d in (3, 4):
            assert (out[d]["pack_first"], out[d]["pack_off"]) == (0, 7)

    def test_zero_token_doc(self, spark):
        rows = [(1, "A", 10), (2, "A", 0), (3, "A", 3)]
        out = {r["doc_id"]: r for r in
               TD.pack_sequences(self._docs(spark, rows), budget=10).collect()}
        assert out[2]["pack_first"] == out[2]["pack_last"] == 1
        assert out[2]["pack_off"] == 0
        assert out[3]["pack_first"] == 1

    def test_offsets_bounded_and_monotonic_on_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        )
        out = TD.pack_sequences(docs, budget=512)
        bad = out.where(
            (F.col("pack_off") < 0) | (F.col("pack_off") >= 512)
            | (F.col("pack_last") < F.col("pack_first"))
        ).count()
        assert bad == 0
        # every chunk boundary is respected: tokens before pack_first
        # chunk == pack_first * budget + pack_off
        chk = out.withColumn(
            "_lhs", F.col("pack_first") * 512 + F.col("pack_off"))
        from pyspark.sql import Window
        w = Window.partitionBy("source").orderBy("doc_id")
        chk = chk.withColumn(
            "_cum0", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        assert chk.where(F.col("_lhs") != F.col("_cum0")).count() == 0


class TestDecontaminate:
    def _corpus(self, spark):
        # doc 1 copies an 8-gram from the eval doc; doc 2 is clean;
        # doc 3 is shorter than n
        ev = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog tonight")],
            "doc_id long, text string")
        docs = spark.createDataFrame(
            [(1, "intro quick brown fox jumps over the lazy dog ending"),
             (2, "completely different words with no overlap at all here"),
             (3, "too short")],
            "doc_id long, text string")
        return docs, ev

    def test_planted_contamination(self, spark):
        docs, ev = self._corpus(spark)
        out = {r["doc_id"]: r for r in
               TD.decontaminate(docs, ev, n=8).collect()}
        # doc 1 shares exactly one 8-gram window with the eval doc
        assert out[1]["eval_hits"] == 1 and out[1]["contaminated"]
        assert out[2]["eval_hits"] == 0 and not out[2]["contaminated"]
        assert out[3]["eval_hits"] == 0  # < n tokens: empty gram set

    def test_case_and_whitespace_normalized(self, spark):
        ev = spark.createDataFrame([(0, "Alpha  Beta\tGamma")],
                                   "doc_id long, text string")
        docs = spark.createDataFrame([(1, "x alpha beta gamma y")],
                                     "doc_id long, text string")
        r = TD.decontaminate(docs, ev, n=3).collect()[0]
        assert r["eval_hits"] == 1

    def test_join_path_matches_intersect_path(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ev = docs.where(TD.hash_split_col(F.col("doc_id")) == "test")
        a = {(r["doc_id"], r["eval_hits"]) for r in
             TD.decontaminate(docs, ev, n=3).collect()
             if r["eval_hits"] > 0}
        b = {(r["doc_id"], r["eval_hits"]) for r in
             TD.contaminated_ids(docs, ev, n=3).collect()}
        assert a == b and len(a) > 0

    def test_no_corpus_shuffle(self, spark):
        docs, ev = self._corpus(spark)
        plan = TD.decontaminate(docs, ev, n=8)._jdf.queryExecution(
        ).executedPlan().toString()
        # the corpus side must reach the broadcast join without an
        # exchange; the only exchanges belong to the tiny eval agg
        head = plan.split("BroadcastNestedLoopJoin")[0]
        assert "Exchange" not in head


class TestSampleByDomain:
    def _docs(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def test_alpha_one_keeps_everything(self, spark, sf_dir):
        out = TD.sample_by_domain(self._docs(spark, sf_dir), "lang",
                                  "doc_id", alpha=1.0)
        assert out.where(~F.col("sampled")).count() == 0
        assert out.agg(F.min("keep_rate")).collect()[0][0] == 1.0

    def test_alpha_zero_equalizes_expected_counts(self, spark, sf_dir):
        docs = self._docs(spark, sf_dir)
        out = TD.sample_by_domain(docs, "lang", "doc_id", alpha=0.0)
        rates = {r["lang"]: r["keep_rate"] for r in
                 out.select("lang", "keep_rate").distinct().collect()}
        counts = {r["lang"]: r["c"] for r in
                  docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
        mn = min(counts.values())
        for lang, c in counts.items():
            assert rates[lang] == pytest.approx(round(mn / c, 6), abs=1e-9)
        # expected kept per domain ~= min count; sampled counts land
        # within a loose binomial band
        kept = {r["lang"]: r["k"] for r in
                out.where("sampled").groupBy("lang")
                   .agg(F.count("*").alias("k")).collect()}
        for lang in counts:
            assert abs(kept.get(lang, 0) - mn) < 4 * mn ** 0.5 + 5

    def test_deterministic_across_runs(self, spark, sf_dir):
        docs = self._docs(spark, sf_dir)
        a = sorted((r["doc_id"], r["sampled"]) for r in
                   TD.sample_by_domain(docs, "lang", "doc_id").collect())
        b = sorted((r["doc_id"], r["sampled"]) for r in
                   TD.sample_by_domain(docs, "lang", "doc_id").collect())
        assert a == b

    def test_shuffle_join_variant_matches(self, spark, sf_dir):
        docs = self._docs(spark, sf_dir)
        a = sorted((r["doc_id"], r["sampled"], r["keep_rate"]) for r in
                   TD.sample_by_domain(docs, "lang", "doc_id").collect())
        b = sorted((r["doc_id"], r["sampled"], r["keep_rate"]) for r in
                   TD.sample_by_domain(docs, "lang", "doc_id",
                                       broadcast_rates=False).collect())
        assert a == b

    def test_alpha_validation(self, spark, sf_dir):
        with pytest.raises(ValueError, match="alpha"):
            TD.sample_by_domain(self._docs(spark, sf_dir), "lang",
                                "doc_id", alpha=1.5)
