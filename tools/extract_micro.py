"""Micro-benchmark of the extract-stage sub-expressions over the
cached bench pages — identifies which regex pass dominates.

Usage: python tools/extract_micro.py [cpus] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import BENCH_CONF, _scan_conf
    from georeader_spark.plans.session import get_spark

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", "pages_4000000_f256.parquet")
    conf = dict(BENCH_CONF)
    conf.update(_scan_conf(cache, cpus))
    spark = get_spark(f"micro-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus, extra_conf=conf)
    df = spark.read.parquet(cache)

    def timed(label, col):
        # force evaluation via an aggregate over the derived column
        build = lambda: df.select(F.length(col).alias("l")).groupBy().sum("l")
        build().collect()
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            build().collect()
            best = min(best, time.time() - t0)
        print(f"  {label:34s} {best:7.2f}s", flush=True)

    s = F.decode(F.col("html"), "UTF-8")
    print(f"extract micro at local[{cpus}]:", flush=True)
    timed("decode only", s)
    t1 = F.regexp_replace(s, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    timed("script/style (backref)", t1)
    t1b = F.regexp_replace(s, r"(?s)<(?:script|style)\b[^>]*>.*?</(?:script|style)>", " ")
    timed("script/style (no backref, no i)", t1b)
    t2 = F.regexp_replace(t1, r"<[^>]*>", " ")
    timed("... + strip tags", t2)
    t3 = t2
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]:
        t3 = F.replace(t3, F.lit(ent), F.lit(ch))
    timed("... + entities", t3)
    t4 = F.trim(F.regexp_replace(t3, r"\s+", " "))
    timed("... + collapse ws (full text)", t4)
    geo = F.regexp_extract(s, r'<meta\s+name="geo\.position"\s+content="(-?\d+(?:\.\d+)?);(-?\d+(?:\.\d+)?)"', 1)
    timed("geotag regexp_extract (1 pass)", geo)
    # non-regex geotag: substring_index carve
    carve = F.substring_index(
        F.substring_index(s, '<meta name="geo.position" content="', -1), '"', 1
    )
    timed("geotag substring_index carve", carve)
    spark.stop()


if __name__ == "__main__":
    main()
