"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB over the
same parquet tables, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name ...]

Determinism mode (``--det``): run every queries() entry TWICE under
deliberately different execution environments — pass A at local[8],
shuffle.partitions=8, AQE on; pass B at local[32],
shuffle.partitions=32, AQE off — and diff the order-insensitive value
hashes. Any query whose hash depends on partitioning / summation
order / plan choice (the failure mode that flipped ``text_stats`` on
the round-4 driver) fails here before the driver sees it.

Usage: python tools/check_correctness.py --det [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def run_spark_pass(spark, qs, only, sf_dir, label=""):
    """Run every selected query on ``spark``; return
    name -> {hash, rows, cols, err}. Hashes are the same
    order-insensitive digest the Spark-vs-DuckDB compare uses, so two
    passes agreeing here means the driver-side hash is stable too."""
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = [c.lower() for c in sdf.columns]
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {label}{name}: spark error: {ex}")
            out[name] = {"hash": None, "rows": None, "cols": None,
                         "err": str(ex)[:200]}
            continue
        out[name] = {"hash": value_hash(rows, cols), "rows": len(rows),
                     "cols": sorted(cols), "err": None}
        print(f"ran   {label}{name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
    return out


def det_main(sf_dir, only):
    """Two-environment determinism diff (see module docstring)."""
    from georeader_spark.plans.session import get_spark
    import __spark_entry__ as E

    qs = E.queries()

    spark = get_spark("det-a", master="local[8]", shuffle_partitions=8)
    pass_a = run_spark_pass(spark, qs, only, sf_dir, label="A/")
    spark.stop()

    spark = get_spark(
        "det-b", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    pass_b = run_spark_pass(spark, qs, only, sf_dir, label="B/")
    spark.stop()

    failures = []
    results = {}
    for name in pass_a:
        a, b = pass_a[name], pass_b.get(name, {})
        ok = (a["err"] is None and b.get("err") is None
              and a["hash"] == b.get("hash")
              and a["rows"] == b.get("rows")
              and a["cols"] == b.get("cols"))
        results[name] = {
            "det_match": ok,
            "hash_a": a["hash"], "hash_b": b.get("hash"),
            "rows_a": a["rows"], "rows_b": b.get("rows"),
            "err": a["err"] or b.get("err"),
        }
        print(f"{'OK  ' if ok else 'FAIL'}  det {name}: "
              f"hash {'stable' if ok else 'DIVERGED'} "
              f"rows {a['rows']}/{b.get('rows')}")
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} determinism failures"
          + (f": {failures}" if failures else ""))
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_path} ({len(results)} entries)")
    sys.exit(1 if failures else 0)


def main():
    argv = [a for a in sys.argv[1:] if a != "--det"]
    det = "--det" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if det:
        det_main(sf_dir, only)
        return

    from georeader_spark.plans.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("correctness", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": str(ex)[:200]}
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(s_rows),
                             "oracle_rows": None, "err": "no_oracle"}
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        sh = value_hash(s_rows, s_cols)
        dh = value_hash(d_rows, d_cols)
        ok_hash = sh == dh
        results[name] = {"rows_match": ok_count, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(s_rows),
                         "oracle_rows": len(d_rows), "err": None}
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(s_rows)}/{len(d_rows)} "
            f"cols={'ok' if ok_cols else (s_cols, d_cols)} hash={'ok' if ok_hash else 'MISMATCH'} "
            f"({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                # show a few differing rows for debugging
                s_set = {tuple(map(norm_cell, r)) for r in s_rows}
                d_set = {tuple(map(norm_cell, r)) for r in d_rows}
                print("   spark-only:", list(s_set - d_set)[:3])
                print("   duck-only :", list(d_set - s_set)[:3])

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    out_path = os.environ.get("CHECK_JSON_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_path} ({len(results)} entries)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
