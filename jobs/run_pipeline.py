#!/usr/bin/env python
"""spark-submit entrypoint for the flagship pages pipeline.

Cluster usage (the north rule's deployment shape):

    zip -r georeader_spark.zip georeader_spark
    spark-submit --py-files georeader_spark.zip \\
        jobs/run_pipeline.py \\
        --input  <pages table path or 'synth:N'> \\
        --output <output table path> \\
        --checkpoint <lineage/checkpoint root>

On a cluster the session master/resources come from spark-submit conf;
locally it falls back to local[cpus]. Every stage goes through
plans/lineage.StageStore, so a re-run with the same input fingerprint
resumes from the last completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running from the repo without --py-files: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True,
                   help="pages parquet path, or synth:N for N generated rows")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="StageStore root for lineage + resume (optional)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit an active session/conf exists; standalone falls
    # back to the tuned local builder
    spark = SparkSession.getActiveSession()
    if spark is None:
        try:
            spark = SparkSession.builder.getOrCreate()
            if spark.sparkContext.master.startswith("local") and not spark.conf.get(
                "spark.sql.adaptive.enabled", None
            ):
                raise RuntimeError  # rebuild with tuned local defaults
        except Exception:
            from georeader_spark.plans.session import get_spark

            spark = get_spark("pages-pipeline")

    from georeader_spark.pipeline import pages_pipeline
    from georeader_spark.sources.pages import pages as synth_pages

    if args.input.startswith("synth:"):
        pages_df = synth_pages(spark, int(args.input.split(":", 1)[1]))
        fingerprint = args.input
    else:
        pages_df = spark.read.parquet(args.input)
        fingerprint = args.input

    t0 = time.time()
    if args.checkpoint:
        from georeader_spark.plans.lineage import StageStore

        store = StageStore(args.checkpoint)
        out = store.run_stage(
            spark,
            "pages_pipeline",
            fingerprint,
            lambda: pages_pipeline(spark, pages_df=pages_df),
            cell_col="cell",
        )
        out.write.mode("overwrite").parquet(args.output)
        n = out.count()
    else:
        out = pages_pipeline(spark, pages_df=pages_df)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()

    print(json.dumps({"rows": n, "elapsed_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
