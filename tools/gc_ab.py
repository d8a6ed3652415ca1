"""Honest GC A/B for the flagship pipeline: ONE python subprocess per
measurement (a stopped SparkSession leaves its JVM gateway alive, so
in-process 'fresh sessions' silently reuse the first JVM's flags —
the round-2 first attempt at this experiment was confounded exactly
that way), variants interleaved across windows, best-of per variant.

Usage: python tools/gc_ab.py [cpus] [windows]
Child: python tools/gc_ab.py --child <cpus> "<java_opts>"
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

VARIANTS = {
    "g1": "-XX:ReservedCodeCacheSize=1g",
    "young40": ("-XX:ReservedCodeCacheSize=1g -XX:+UnlockExperimentalVMOptions "
                "-XX:G1NewSizePercent=40"),
    "parallelgc": "-XX:ReservedCodeCacheSize=1g -XX:+UseParallelGC",
}


def child(cpus: int, opts: str) -> None:
    from bench import BENCH_CONF, _scan_conf
    from georeader_spark.pipeline import pages_pipeline
    from georeader_spark.plans.session import get_spark

    cache = os.path.join(HERE, ".bench_cache", "pages_4000000_f256.parquet")
    conf = dict(BENCH_CONF)
    conf.update(_scan_conf(cache, cpus))
    conf["spark.driver.extraJavaOptions"] = opts
    spark = get_spark(f"gcab-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus, extra_conf=conf)
    df = spark.read.parquet(cache)
    pages_pipeline(spark, pages_df=df.limit(2000), repartition=False).count()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        pages_pipeline(spark, pages_df=df, repartition=False).count()
        best = min(best, time.time() - t0)
    spark.stop()
    print(f"RESULT {4_000_000 / best:.0f}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    best = {k: 0.0 for k in VARIANTS}
    for w in range(windows):
        for name, opts in VARIANTS.items():
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), opts],
                capture_output=True, text=True, timeout=900,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")]
            if not lines:
                print(f"w{w} {name}: FAILED\n{out.stderr[-500:]}", flush=True)
                continue
            pps = float(lines[-1].split()[1])
            best[name] = max(best[name], pps)
            print(f"w{w} {name:12s}: {pps:9.0f} p/s (best {best[name]:9.0f})",
                  flush=True)
    for name, v in best.items():
        print(f"{name:12s}: {v:9.0f} p/s")


if __name__ == "__main__":
    main()
