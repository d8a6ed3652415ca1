"""Stage-by-stage profile of the flagship pages pipeline at a given
parallelism — isolates where 8->32 scaling efficiency is lost.

Usage: python tools/profile_pipeline.py [cpus] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import BENCH_CONF, _scan_conf, ensure_pages_parquet
    from georeader_spark.pipeline import (
        extract_stage,
        pages_pipeline,
        pip_polytable,
    )
    from georeader_spark.functions.geo import cell_encode
    from georeader_spark.operators.pip_join import pip_join
    from georeader_spark.operators.tiling import assign_points_to_tiles
    from georeader_spark.plans.session import get_spark
    from georeader_spark.queries import CELL_R, TILE_SIZE, TILE_TRANSFORM

    n_pages = 4_000_000
    conf = dict(BENCH_CONF)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"pages_{n_pages}_f256.parquet")
    conf.update(_scan_conf(cache, cpus))
    spark = get_spark(f"profile-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus, extra_conf=conf)
    df = spark.read.parquet(cache)

    def timed(label, build):
        # warm once, then best-of-runs
        build().count()
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            n = build().count()
            best = min(best, time.time() - t0)
        print(f"  {label:34s} {best:7.2f}s  ({n} rows)", flush=True)
        return best

    print(f"profile at local[{cpus}] over {n_pages} pages:", flush=True)
    timed("scan only (count)", lambda: df)
    timed("scan+decode html (length sum)",
          lambda: df.select(F.length(F.col("html")).alias("l")).groupBy().sum("l"))
    timed("extract (jvm regexp)", lambda: extract_stage(df))

    def upto_encode():
        ok = extract_stage(df).where(F.col("text_ok") & F.col("lon").isNotNull())
        return ok.withColumn("cell", cell_encode(F.col("lon"), F.col("lat"), CELL_R)) \
                 .select("url", "lon", "lat", "cell")
    timed("extract+filter+encode+select", upto_encode)

    def with_ckpt():
        return upto_encode().localCheckpoint(eager=False)
    timed("...+localCheckpoint", with_ckpt)

    def with_join():
        return pip_join(with_ckpt(), pip_polytable(), r=6)
    timed("...+pip_join", with_join)

    def full_no_ckpt():
        slim = upto_encode()
        joined = pip_join(slim, pip_polytable(), r=6)
        tiled = assign_points_to_tiles(joined, TILE_TRANSFORM, TILE_SIZE,
                                       x_col="lon", y_col="lat")
        return tiled.groupBy("cell", "poly_id", "tile_row", "tile_col").agg(
            F.count("*").alias("n_pages"))
    timed("FULL pipeline (no ckpt)", full_no_ckpt)
    timed("FULL pipeline (as benched)",
          lambda: pages_pipeline(spark, pages_df=df, repartition=False))
    spark.stop()


if __name__ == "__main__":
    main()
