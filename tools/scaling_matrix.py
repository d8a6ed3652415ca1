"""Experiment matrix for the 8->32 scaling gate: flagship pipeline at
{local[8], local[32]} x {lineage-cut variants}, best-of-N fresh-session
runs, codegen-warning capture.

Variants:
  ckpt     — current bench shape (localCheckpoint lineage cut)
  nockpt   — no cut at all (predicate pushdown may duplicate extract)
  barrier  — no materialization; a nondeterministic no-op column blocks
             filter pushdown through the extract projection

Usage: python tools/scaling_matrix.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_variant(spark, df, variant: str):
    from georeader_spark.pipeline import extract_stage, pip_polytable
    from georeader_spark.functions.geo import cell_encode
    from georeader_spark.operators.pip_join import pip_join
    from georeader_spark.operators.tiling import assign_points_to_tiles
    from georeader_spark.queries import CELL_R, TILE_SIZE, TILE_TRANSFORM

    extracted = extract_stage(df)
    ok = extracted.where(F.col("text_ok") & F.col("lon").isNotNull())
    encoded = ok.withColumn("cell", cell_encode(F.col("lon"), F.col("lat"), CELL_R))
    slim = encoded.select("url", "lon", "lat", "cell")
    if variant == "ckpt":
        slim = slim.localCheckpoint(eager=False)
    elif variant == "barrier":
        # monotonically_increasing_id is nondeterministic to Catalyst:
        # filters cannot push through this projection, so the extract
        # expressions are never duplicated into the scan
        slim = slim.withColumn("_b", F.monotonically_increasing_id())
    elif variant != "nockpt":
        raise ValueError(variant)
    joined = pip_join(slim, pip_polytable(), r=6)
    tiled = assign_points_to_tiles(
        joined, TILE_TRANSFORM, TILE_SIZE, x_col="lon", y_col="lat"
    )
    out = tiled.groupBy("cell", "poly_id", "tile_row", "tile_col").agg(
        F.count("*").alias("n_pages")
    )
    return out


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from bench import BENCH_CONF, _scan_conf

    n_pages = 4_000_000
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"pages_{n_pages}_f256.parquet")

    results = {}
    for cpus in (8, 32):
        for variant in ("ckpt", "nockpt", "barrier"):
            from georeader_spark.plans.session import get_spark

            conf = dict(BENCH_CONF)
            conf.update(_scan_conf(cache, cpus))
            spark = get_spark(f"mx-{cpus}-{variant}", master=f"local[{cpus}]",
                              shuffle_partitions=2 * cpus, extra_conf=conf)
            df = spark.read.parquet(cache)
            build_variant(spark, df.limit(2000), variant).count()  # warm
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                n = build_variant(spark, df, variant).count()
                best = min(best, time.time() - t0)
            pps = n_pages / best
            results[(cpus, variant)] = pps
            print(f"local[{cpus}] {variant:8s}: {best:6.2f}s  "
                  f"{pps:9.0f} p/s  ({n} rows)", flush=True)
            spark.stop()
    for variant in ("ckpt", "nockpt", "barrier"):
        e = results[(32, variant)] / (4.0 * results[(8, variant)])
        print(f"{variant:8s} 8->32 efficiency: {e:.3f}")


if __name__ == "__main__":
    main()
