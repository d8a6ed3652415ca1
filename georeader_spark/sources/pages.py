"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
plus generator-known ``lon``/``lat`` ground truth columns (dropped for
the engine-facing table; kept in the ``*_truth`` variant for goldens).

Everything is generated with **pure Spark SQL expressions over
spark.range(n)** — no driver-side loop, no UDF, no RNG state — so the
same generator that makes 10k test rows makes 10^9 bench rows with
perfect determinism and full parallelism (the "synthesise it
deterministically at small scale" requirement; scales per FIXTURES.md §1).

Geotag distribution (FIXTURES.md §1): ~20% of rows land in 5 hot
clusters (a handful of cells) to exercise the salting/skew path; the
rest are uniform over the polygon universe bbox lon [-10, 30],
lat [35, 60].

The ``html`` template and the ``text`` column are two sides of the same
contract: ``kernels.text.extract_text(html) == text`` byte-identically
(the north rule's per-row invariant). tests/test_pages_extraction.py
enforces it; the oracle is the shared kernel module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: 64-word vocabulary; includes non-ASCII words so byte-identity of the
#: extracted text exercises real UTF-8.
VOCAB = [
    "spark", "window", "raster", "tile", "grid", "cell", "join", "shuffle",
    "query", "table", "index", "vector", "page", "crawl", "text", "token",
    "polygon", "point", "bounds", "affine", "transform", "pixel", "band", "mosaic",
    "reproject", "resample", "overlap", "stride", "partition", "salt", "skew", "hash",
    "café", "über", "naïve", "señor", "data", "batch", "stream", "lazy",
    "eager", "scan", "filter", "predicate", "pushdown", "prune", "codegen", "arrow",
    "pandas", "numpy", "kernel", "oracle", "golden", "fixture", "lineage", "metric",
    "resume", "snapshot", "commit", "checkpoint", "broadcast", "sort", "merge", "agg",
]

#: Hot cluster centers (lon, lat) — dense-geotag cities in the bbox.
HOT_CLUSTERS = [
    (-3.70, 40.42),   # Madrid
    (2.35, 48.86),    # Paris
    (13.40, 52.52),   # Berlin
    (-0.13, 51.51),   # London
    (12.50, 41.90),   # Rome
]

#: fraction of rows assigned to hot clusters = HOT_MOD_HIT / HOT_MOD
HOT_MOD = 10
HOT_MOD_HIT = 2  # 20%

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
TS_WINDOW_S = 30 * 86400

BBOX = (-10.0, 35.0, 30.0, 60.0)  # lon_min, lat_min, lon_max, lat_max


def _mix(idc: Column, mult: int, mod: int) -> Column:
    """Deterministic integer mixing: pmod(id * mult, mod)."""
    return F.pmod(idc * F.lit(mult), F.lit(mod))


def _word(idc: Column, salt: int) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    idx = F.pmod(idc * F.lit(2 * salt + 17) + F.lit(salt * salt + 1), F.lit(9973)) % F.lit(64)
    return F.element_at(vocab, (idx + F.lit(1)).cast("int"))


def lon_lat_cols(idc: Column) -> tuple[Column, Column]:
    """Deterministic geotag columns: hot-cluster mixture + uniform rest.

    All values land on a 1e-4-degree lattice so the %.4f formatting in
    the HTML meta tag round-trips exactly through float parsing.
    """
    is_hot = _mix(idc, 1, HOT_MOD) < F.lit(HOT_MOD_HIT)
    cluster = _mix(idc, 1, len(HOT_CLUSTERS))
    c_lon = F.array(*[F.lit(c[0]) for c in HOT_CLUSTERS])
    c_lat = F.array(*[F.lit(c[1]) for c in HOT_CLUSTERS])
    # jitter on a 1e-4 lattice within +-0.025 deg
    j1 = (_mix(idc, 7919, 500) - F.lit(250)).cast("double") / F.lit(10000.0)
    j2 = (_mix(idc, 104729, 500) - F.lit(250)).cast("double") / F.lit(10000.0)
    hot_lon = F.element_at(c_lon, (cluster + 1).cast("int")) + j1
    hot_lat = F.element_at(c_lat, (cluster + 1).cast("int")) + j2
    # uniform over bbox on a 1e-4 lattice
    u_lon = F.lit(BBOX[0]) + _mix(idc, 48271, 400000).cast("double") / F.lit(10000.0)
    u_lat = F.lit(BBOX[1]) + _mix(idc, 69621, 250000).cast("double") / F.lit(10000.0)
    lon = F.round(F.when(is_hot, hot_lon).otherwise(u_lon), 4)
    lat = F.round(F.when(is_hot, hot_lat).otherwise(u_lat), 4)
    return lon, lat


def pages_with_truth(spark: SparkSession, n_rows: int, n_partitions: int | None = None) -> DataFrame:
    """Pages table + generator ground-truth (lon, lat) columns."""
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_rows, 1, n_partitions)
    idc = F.col("id")

    lon, lat = lon_lat_cols(idc)
    site = _mix(idc, 131, 1000)
    url = F.format_string("https://site%05d.example/page/%07d", site, idc)
    warc_ts = F.timestamp_seconds(
        F.lit(EPOCH_2024) + F.pmod(idc * F.lit(2654435761), F.lit(TS_WINDOW_S))
    )
    langs = F.array(F.lit("en"), F.lit("es"), F.lit("fr"), F.lit("de"), F.lit("pt"))
    lang = F.element_at(langs, (F.pmod(idc * F.lit(31) + F.lit(7), F.lit(5)) + 1).cast("int"))

    title = F.format_string("Doc %d %s %s", idc, _word(idc, 1), _word(idc, 2))
    h1 = F.format_string("%s %s %s", _word(idc, 3), _word(idc, 4), _word(idc, 5))
    # body: 8..31 words, two paragraphs
    n_extra = F.pmod(idc, F.lit(24))
    body_words = F.array(*[_word(idc, 10 + k) for k in range(32)])
    body1 = F.array_join(F.slice(body_words, 1, 8), " ")
    body2 = F.array_join(
        F.slice(body_words, 9, 24), " "
    )  # full tail; trim by n_extra below
    body2 = F.when(
        n_extra > 0,
        F.array_join(F.slice(body_words, 9, (n_extra).cast("int")), " "),
    ).otherwise(F.lit(""))

    lat_s = F.format_string("%.4f", lat)
    lon_s = F.format_string("%.4f", lon)

    html = F.format_string(
        '<html><head><meta charset="utf-8">'
        '<meta name="geo.position" content="%s;%s">'
        "<title>%s</title></head>"
        "<body><h1>%s</h1><p>%s</p><p>%s</p>"
        '<script>var tracker = "%s";</script>'
        "</body></html>",
        lat_s, lon_s, title, h1, body1, body2, url,
    )
    # the text contract: extract_text(html) == text, byte-identical.
    # template yields: TITLE H1 BODY1 [BODY2] with single spaces.
    text = F.when(
        n_extra > 0, F.concat_ws(" ", title, h1, body1, body2)
    ).otherwise(F.concat_ws(" ", title, h1, body1))

    out = df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        lon.alias("lon"),
        lat.alias("lat"),
    )
    # Lineage cut: the generator expression tree is ~30 KB and
    # `html`/`text` share word subtrees; Catalyst's predicate pushdown
    # substitutes the tree into every downstream filter reference (it
    # pushes through Repartition barriers too) — measured: a 7 MB
    # filter expression and unbounded codegen time in the extract
    # stage. localCheckpoint severs the logical lineage so downstream
    # plans see plain attributes. Values are unaffected (content is a
    # pure function of id); production inputs are parquet scans, which
    # have no such lineage — this is test/bench-generator plumbing only.
    return out.localCheckpoint(eager=False)


def pages(spark: SparkSession, n_rows: int, n_partitions: int | None = None) -> DataFrame:
    """The engine-facing pages table (input_hint schema, no truth cols)."""
    return pages_with_truth(spark, n_rows, n_partitions).select(
        "url", "warc_ts", "html", "text", "lang"
    )


# ---------------------------------------------------------------------------
# DuckDB twin of the generator (for oracle_sql gates that need the page
# CONTENT, not just the geotag arithmetic — e.g. the WARC round-trip's
# md5(html) comparison). Mirrors pages_with_truth expression by
# expression; tests/test_warc.py pins Spark-vs-DuckDB html byte
# identity (md5 over UTF-8 bytes) so the two generators cannot drift
# silently.
# ---------------------------------------------------------------------------

def _word_sql(salt: int) -> str:
    """DuckDB twin of _word(id, salt) — 1-based list indexing."""
    return (f"voc[CAST((id * {2 * salt + 17} + {salt * salt + 1}) % 9973 "
            f"AS INT) % 64 + 1]")


def pages_sql(n_rows: int) -> str:
    """DuckDB SQL producing ``(id, url, ts_s, lang, html, text)`` for the
    same ``n_rows`` as :func:`pages` — html as VARCHAR whose UTF-8 bytes
    equal the Spark binary column byte-for-byte.

    Formatting identity notes: every float formatted with %.4f sits on
    a 1e-4 lattice (see :func:`lon_lat_cols`), so Java's HALF_UP and
    C-style round-to-nearest agree (no decimal halfway case can arise
    from a lattice double); %05d/%07d/%d agree trivially.
    """
    vocab = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    nc = len(HOT_CLUSTERS)
    cl_lon = " ".join(f"WHEN {i} THEN {c[0]!r}" for i, c in enumerate(HOT_CLUSTERS))
    cl_lat = " ".join(f"WHEN {i} THEN {c[1]!r}" for i, c in enumerate(HOT_CLUSTERS))
    j1 = "(CAST((id * 7919) % 500 - 250 AS DOUBLE) / 10000.0)"
    j2 = "(CAST((id * 104729) % 500 - 250 AS DOUBLE) / 10000.0)"
    u_lon = f"({BBOX[0]!r} + CAST((id * 48271) % 400000 AS DOUBLE) / 10000.0)"
    u_lat = f"({BBOX[1]!r} + CAST((id * 69621) % 250000 AS DOUBLE) / 10000.0)"
    lon = (f"ROUND(CASE WHEN (id % {HOT_MOD}) < {HOT_MOD_HIT} "
           f"THEN (CASE (id % {nc}) {cl_lon} END) + {j1} ELSE {u_lon} END, 4)")
    lat = (f"ROUND(CASE WHEN (id % {HOT_MOD}) < {HOT_MOD_HIT} "
           f"THEN (CASE (id % {nc}) {cl_lat} END) + {j2} ELSE {u_lat} END, 4)")
    body1 = " || ' ' || ".join(_word_sql(10 + k) for k in range(8))
    body2_list = ", ".join(_word_sql(10 + k) for k in range(8, 32))
    return f"""
SELECT id, url, ts_s, lang,
       printf('<html><head><meta charset="utf-8">'
              || '<meta name="geo.position" content="%s;%s">'
              || '<title>%s</title></head>'
              || '<body><h1>%s</h1><p>%s</p><p>%s</p>'
              || '<script>var tracker = "%s";</script>'
              || '</body></html>',
              lat_s, lon_s, title, h1, body1, body2, url) AS html,
       CASE WHEN n_extra > 0
            THEN title || ' ' || h1 || ' ' || body1 || ' ' || body2
            ELSE title || ' ' || h1 || ' ' || body1 END AS text
FROM (
  SELECT id,
         printf('https://site%05d.example/page/%07d',
                CAST((id * 131) % 1000 AS INT), CAST(id AS INT)) AS url,
         {EPOCH_2024} + (id * 2654435761) % {TS_WINDOW_S} AS ts_s,
         (['en','es','fr','de','pt'])[CAST((id * 31 + 7) % 5 AS INT) + 1] AS lang,
         printf('%.4f', {lat}) AS lat_s,
         printf('%.4f', {lon}) AS lon_s,
         printf('Doc %d %s %s', id, {_word_sql(1)}, {_word_sql(2)}) AS title,
         printf('%s %s %s', {_word_sql(3)}, {_word_sql(4)}, {_word_sql(5)}) AS h1,
         {body1} AS body1,
         CASE WHEN id % 24 > 0
              THEN array_to_string(([{body2_list}])[1:CAST(id % 24 AS INT)], ' ')
              ELSE '' END AS body2,
         id % 24 AS n_extra
  FROM (SELECT range AS id, {vocab} AS voc FROM range(0, {n_rows}))
) b
"""
