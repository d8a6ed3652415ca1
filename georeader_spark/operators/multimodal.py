"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (task brief). The Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested; the actual
codec decode is STUBBED (no image/audio libraries in this container)
behind a deterministic fake decoder, clearly marked.

Pattern (mirrors GeoTensor.load_bytes, the reference's own
bytes->array recipe, geotensor.py:2165-2214): binary payload column ->
mapInPandas batch -> numpy array -> feature columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, payload binary"
)


def synth_media(spark: SparkSession, n_rows: int, n_partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload = packed header + bytes
    derived from media_id (stands in for real image/audio bytes)."""
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_rows, 1, n_partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    w = (F.pmod(F.col("id") * 31, F.lit(5)) * 64 + 64).cast("int")
    h = (F.pmod(F.col("id") * 17, F.lit(5)) * 64 + 64).cast("int")
    frames = F.when(kind == "video", (F.pmod(F.col("id"), F.lit(24)) + 8).cast("int")).otherwise(F.lit(1))
    rate = F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(0))
    payload = F.encode(
        F.format_string("FAKEMEDIA:%d", F.col("id")), "UTF-8"
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        w.alias("width"),
        h.alias("height"),
        frames.alias("n_frames"),
        rate.alias("sample_rate"),
        payload.alias("payload"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic fake decoder. A real deployment swaps this
    for PIL/av/soundfile inside the same mapInPandas batch; the Spark
    plumbing (schema in/out, batching, partitioning) is identical.

    Raises NotImplementedError for kinds a real codec would handle but
    the fake cannot — callers route only known-fake payloads here.
    """
    if not payload.startswith(b"FAKEMEDIA:"):
        raise NotImplementedError(
            "real media decode requires codec libraries not present in "
            "this environment; only deterministic fake payloads supported"
        )
    seed = int(payload.split(b":", 1)[1])
    # deterministic pixel field from the id via md5 counter mode over
    # the STRING key "seed:counter" — string-keyed (not packed binary)
    # so any engine with a varchar md5 (DuckDB, Spark) reproduces the
    # identical bytes; the SQL twin in queries._media_features_sql
    # re-derives every pixel
    n = width * height
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    while pos < n:
        h = hashlib.md5(f"{seed}:{counter}".encode()).digest()
        take = min(16, n - pos)
        out[pos : pos + take] = np.frombuffer(h[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out.reshape(height, width)


def media_features(media: DataFrame) -> DataFrame:
    """Decode (fake) + feature-extract per batch: mean/std intensity,
    a 4x4 downsample fingerprint hash. Real decode would slot into the
    same UDF; Arrow batch shape and output schema are production-real.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over column arrays, not iterrows (row boxing is the
            # slow path; per-payload decode is inherently per-row, the
            # numpy work inside is vectorized)
            for mid, kind, width, height, payload in zip(
                pdf["media_id"].to_numpy(),
                pdf["kind"].to_numpy(),
                pdf["width"].to_numpy(),
                pdf["height"].to_numpy(),
                pdf["payload"],
            ):
                arr = _fake_decode(bytes(payload), int(width), int(height))
                # 4x4 block-mean thumbnail -> fingerprint (hashed over
                # the comma-joined decimal bytes, row-major — the
                # engine-independent form of tobytes())
                th = arr[: arr.shape[0] // 4 * 4, : arr.shape[1] // 4 * 4]
                th = th.reshape(4, th.shape[0] // 4, 4, th.shape[1] // 4).mean(axis=(1, 3))
                fp = hashlib.md5(
                    ",".join(
                        str(int(v)) for v in th.astype(np.uint8).flatten()
                    ).encode()
                ).hexdigest()
                # two-moment stats from EXACT integer sums: one double
                # division each, so any engine (the DuckDB twin
                # included) reproduces the doubles bit-for-bit —
                # numpy's pairwise-summed .std() would differ at ~1e-12
                n_px = arr.size
                s1 = int(arr.sum(dtype=np.int64))
                s2 = int((arr.astype(np.int64) ** 2).sum())
                mean = s1 / n_px
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "mean_intensity": mean,
                        "std_intensity": float(np.sqrt(s2 / n_px - mean * mean)),
                        "thumb_fp": fp,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mean_intensity", "std_intensity", "thumb_fp"],
            )

    return media.mapInPandas(
        feats,
        "media_id long, kind string, mean_intensity double, std_intensity double, thumb_fp string",
    )


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per kept
    frame index (pure expressions — sequence + explode; the decode of
    each frame would join in via media_features at scale)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
