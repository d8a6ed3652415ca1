"""Per-query isolation harness for the optimization round (guide §1).

NOT the judged bench (bench.py is frozen); this reproduces its exact
methodology — same session config, same warmup, same .count() action,
best-of-N — for a chosen subset of queries, so that a single query can
be iterated on without paying the full suite. Extras:

  --noop      time with the noop sink (computes every column; guide §1.4)
  --explain   dump .explain("formatted") to plans/r06/<name>_<tag>.txt
  --tag TAG   suffix for the explain files (before/after)
  --runs N    best-of-N (default 3)

Usage: python bench_extra.py [--noop] [--explain] [--tag before] q1 q2 ...
An empty query list runs the full HEADLINE set from bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from bench import BENCH_CONF, HEADLINE
    from georeader_spark.plans.session import get_spark
    from georeader_spark.queries import REGISTRY

    names = args.queries or HEADLINE
    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS, extra_conf=BENCH_CONF,
    )
    # same warmup as bench.py: first headline query once, untimed
    REGISTRY[HEADLINE[0]][0](spark, SF_DIR).count()

    out = {}
    for name in names:
        fn, _sql = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain:
            df = fn(spark, SF_DIR)
            os.makedirs("plans/r06", exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        n = None
        for _ in range(args.runs):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                n = df.count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s" + (f" ({n} rows)" if n is not None else ""),
              file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3),
                      "runs": args.runs, "noop": args.noop}))
    spark.stop()


if __name__ == "__main__":
    main()
