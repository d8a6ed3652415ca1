"""Pages generator + flagship pipeline tests: the north-rule gates.

- byte-identical extracted text per url (input_hint invariant)
- deterministic generation (same rows on every run/partitioning)
- pipeline end-to-end row accounting
- lineage checkpoint/resume
- skew salting behavior
"""

import os

import pytest
from pyspark.sql import functions as F

from georeader_spark.kernels import text as ktext
from georeader_spark.pipeline import extract_stage, pages_pipeline
from georeader_spark.sources.pages import pages, pages_with_truth

N = 3000


class TestPagesGenerator:
    def test_schema(self, spark):
        df = pages(spark, 100)
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang",
        ]
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types["html"] == "binary"
        assert types["warc_ts"] == "timestamp"

    def test_deterministic_across_partitionings(self, spark):
        a = pages(spark, 500, n_partitions=2).orderBy("url").collect()
        b = pages(spark, 500, n_partitions=7).orderBy("url").collect()
        assert a == b

    def test_urls_unique(self, spark):
        df = pages(spark, N)
        assert df.select("url").distinct().count() == N

    def test_extraction_byte_identity(self, spark):
        """The per-row invariant: kernels extract_text(html) == text,
        byte for byte, on every generated page."""
        rows = pages(spark, N).collect()
        for r in rows:
            assert ktext.extract_text(bytes(r.html)) == r.text, r.url

    def test_extraction_udf_matches_column(self, spark):
        out = extract_stage(pages(spark, N))
        n_bad = out.where(~F.col("text_ok")).count()
        assert n_bad == 0
        assert out.where(F.col("lon").isNull()).count() == 0

    def test_geotag_matches_truth(self, spark):
        truth = pages_with_truth(spark, 1000)
        ext = extract_stage(truth.select("url", "warc_ts", "html", "text", "lang"))
        j = ext.select("url", F.col("lon").alias("e_lon"), F.col("lat").alias("e_lat")).join(
            truth.select("url", "lon", "lat"), "url"
        )
        bad = j.where(
            (F.abs(F.col("e_lon") - F.col("lon")) > 1e-9)
            | (F.abs(F.col("e_lat") - F.col("lat")) > 1e-9)
        ).count()
        assert bad == 0

    def test_hot_cluster_fraction(self, spark):
        """~20% of rows in the 5 hot clusters (skew fixture contract)."""
        truth = pages_with_truth(spark, 5000)
        from georeader_spark.sources.pages import HOT_CLUSTERS

        hot = truth.where(
            F.least(
                *[
                    F.abs(F.col("lon") - c[0]) + F.abs(F.col("lat") - c[1])
                    for c in HOT_CLUSTERS
                ]
            )
            < 0.06
        ).count()
        assert 0.15 < hot / 5000 < 0.25


class TestPipeline:
    def test_end_to_end(self, spark):
        out = pages_pipeline(spark, n_rows=N)
        rows = out.collect()
        assert len(rows) > 0
        assert {"cell", "poly_id", "tile_row", "tile_col", "n_pages"} == set(out.columns)
        # hot clusters (Madrid/Paris/Berlin/London/Rome) all sit inside
        # at least one fixture polygon, so matches must be plentiful
        total = sum(r.n_pages for r in rows)
        assert total > N * 0.2

    def test_deterministic(self, spark):
        a = sorted(map(tuple, pages_pipeline(spark, n_rows=1000).collect()))
        b = sorted(map(tuple, pages_pipeline(spark, n_rows=1000).collect()))
        assert a == b


class TestLineage:
    def test_resume_skips_recompute(self, spark, tmp_path):
        from georeader_spark.plans.lineage import StageStore

        store = StageStore(str(tmp_path / "ckpt"))
        calls = []

        def compute():
            calls.append(1)
            return pages(spark, 200).select("url", "lang")

        df1 = store.run_stage(spark, "extract", "fp1", compute)
        assert df1.count() == 200
        df2 = store.run_stage(spark, "extract", "fp1", compute)
        assert df2.count() == 200
        assert len(calls) == 1  # resumed, not recomputed
        # changed input fingerprint -> recompute
        store.run_stage(spark, "extract", "fp2", compute)
        assert len(calls) == 2
        rec = store.lineage("extract")
        assert rec["status"] == "COMPLETE"
        assert rec["row_count"] == 200

    def test_metrics_histogram(self, spark, tmp_path):
        from georeader_spark.functions.geo import cell_encode
        from georeader_spark.plans.lineage import StageStore
        from georeader_spark.sources.pages import pages_with_truth

        store = StageStore(str(tmp_path / "ckpt2"))

        def compute():
            return pages_with_truth(spark, 2000).select(
                "url", cell_encode(F.col("lon"), F.col("lat"), 7).alias("cell")
            )

        store.run_stage(spark, "encode", "fp", compute, cell_col="cell")
        rec = store.lineage("encode")
        assert rec["row_count"] == 2000
        assert sum(rec["cell_histogram"].values()) == 2000
        # skew fixture: hottest cells carry far more than uniform share
        hottest = max(rec["hottest_cells"].values())
        assert hottest > 50  # ~4% of rows in one r=7 cell

    def test_iceberg_format_falls_back_without_catalog(self, spark, tmp_path):
        """format='iceberg' on a session without an Iceberg catalog
        takes the parquet fallback and records it in the lineage row;
        resume still works across the fallback."""
        import pytest

        from georeader_spark.plans.lineage import StageStore

        store = StageStore(
            str(tmp_path / "ckpt_ice"), format="iceberg", catalog="lake"
        )
        assert spark.conf.get("spark.sql.catalog.lake", None) is None
        calls = []

        def compute():
            calls.append(1)
            return pages(spark, 100).select("url", "lang")

        df1 = store.run_stage(spark, "extract", "fp1", compute)
        assert df1.count() == 100
        rec = store.lineage("extract")
        assert rec["storage"] == "parquet-fallback"
        # resume path reads the fallback parquet back
        df2 = store.run_stage(spark, "extract", "fp1", compute)
        assert df2.count() == 100 and len(calls) == 1

        with pytest.raises(ValueError, match="format"):
            StageStore(str(tmp_path / "bad"), format="orc")

    def test_iceberg_branch_routing(self, spark, tmp_path, monkeypatch):
        """When the catalog IS configured as Iceberg, _write routes to
        writeTo(...).using('iceberg').createOrReplace(). The sandbox
        has no Iceberg jar, so exercise the routing with the catalog
        conf set and the writer intercepted — the decision logic and
        table identifier are the code under test."""
        from georeader_spark.plans.lineage import StageStore

        store = StageStore(
            str(tmp_path / "ckpt_ice2"), format="iceberg", catalog="lake",
            namespace="pipe",
        )
        spark.conf.set(
            "spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog"
        )
        try:
            assert store._iceberg_available(spark)
            assert store._table_ident("extract") == "lake.pipe.extract"
            seen = {}

            class FakeWriter:
                def using(self, fmt):
                    seen["using"] = fmt
                    return self

                def createOrReplace(self):
                    seen["committed"] = True

            df = pages(spark, 10).select("url")
            monkeypatch.setattr(
                type(df), "writeTo", lambda self, ident: seen.setdefault(
                    "ident", ident
                ) and None or FakeWriter(),
            )
            assert store._write(df, "extract") == "iceberg"
            assert seen == {
                "ident": "lake.pipe.extract", "using": "iceberg",
                "committed": True,
            }
        finally:
            spark.conf.unset("spark.sql.catalog.lake")


class TestSalting:
    def test_salt_spreads_hot_keys(self, spark):
        from georeader_spark.plans.lineage import salt_for_skew

        df = spark.range(10000).select(
            F.when(F.col("id") % 10 < 6, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
            F.col("id"),
        )
        salted = salt_for_skew(df, "k", hot_threshold=500, n_salts=8, id_col="id")
        per_salt = (
            salted.where(F.col("k") == 1).groupBy("salt").count().collect()
        )
        assert len(per_salt) == 8  # hot key spread over all salts
        counts = [r["count"] for r in per_salt]
        assert max(counts) < 6000 * 0.3  # no salt holds the bulk
        cold = salted.where(F.col("k") != 1).select("salt").distinct().collect()
        assert [r["salt"] for r in cold] == [0]  # cold keys unsalted

    def test_two_phase_agg_equivalence(self, spark):
        from georeader_spark.plans.lineage import salt_for_skew

        df = spark.range(5000).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("v")
        )
        direct = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        salted = salt_for_skew(df, "k", hot_threshold=100, n_salts=4, id_col="v")
        partial = salted.groupBy("k", "salt").agg(F.sum("v").alias("ps"))
        final = {r["k"]: r["s"] for r in partial.groupBy("k").agg(F.sum("ps").alias("s")).collect()}
        assert direct == final
