"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (task brief). The Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested. Since round 4
the decode is REAL for self-describing formats (kernels/media: PPM/PGM
and BMP images, RIFF PCM WAV audio — pure-spec struct/numpy parsing,
no codec libraries needed); the honest NotImplementedError boundary
remains only for genuinely codec-bound formats (JPEG/MP3/H.264 — the
synthetic ``video`` rows model that side behind a deterministic fake
decoder, clearly marked).

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

from ..kernels import media as kmedia

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, payload binary"
)

#: audio synth constants (closed-form samples so the DuckDB twin can
#: recompute the decoded features; see queries._media_features_sql)
AUDIO_RATE = 16000
AUDIO_SEED_MULT = 2654435761
AUDIO_STEP = 7919


def _md5_pixels(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic pixel field: md5 counter mode over the STRING key
    "seed:counter" — string-keyed (not packed binary) so any engine
    with a varchar md5 (DuckDB, Spark) reproduces identical bytes."""
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


def audio_samples(media_id: int, n: int) -> np.ndarray:
    """Deterministic int16 PCM: ((seed + STEP*t) mod 65536) - 32768."""
    seed = (media_id * AUDIO_SEED_MULT) % 65536
    u = (seed + AUDIO_STEP * np.arange(n, dtype=np.int64)) % 65536
    return (u - 32768).astype(np.int16)


def synth_media(
    spark: SparkSession, n_rows: int, n_partitions: int | None = None,
    payload: bool = True,
) -> DataFrame:
    """Deterministic media table with REAL payloads where the format
    allows: image rows carry a real PGM (P5) wrapping the md5 pixel
    field, audio rows a real PCM WAV of closed-form samples, video
    rows the marked fake (codec formats need libraries this container
    lacks). Generated executor-side in Arrow batches — payload bytes
    never route through the driver.

    ``payload=False`` emits the same metadata columns with an empty
    payload, entirely as JVM expressions (no Python stage): the shape
    for consumers that only read (media_id, kind, n_frames, ...) —
    e.g. frame sampling — where synthesizing megapixel md5 fields per
    row is pure waste and mapInPandas' opacity would defeat column
    pruning anyway (guide §4: prefer built-ins; pass only what the
    function needs)."""
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 8)

    if not payload:
        mid = F.col("id")
        kind = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (mid % 3).cast("int") + 1,
        )
        return spark.range(0, n_rows, 1, n_partitions).select(
            mid.alias("media_id"),
            kind.alias("kind"),
            ((mid * 31 % 5) * 64 + 64).cast("int").alias("width"),
            ((mid * 17 % 5) * 64 + 64).cast("int").alias("height"),
            F.when((mid % 3) == 2, (mid % 24) + 8)
            .otherwise(F.lit(1))
            .cast("int")
            .alias("n_frames"),
            F.when((mid % 3) == 1, F.lit(AUDIO_RATE))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("sample_rate"),
            F.lit(b"").alias("payload"),
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"].to_numpy():
                mid = int(mid)
                w = (mid * 31 % 5) * 64 + 64
                h = (mid * 17 % 5) * 64 + 64
                k = mid % 3
                if k == 0:
                    kind, frames, rate = "image", 1, 0
                    payload = kmedia.encode_ppm(_md5_pixels(mid, w, h))
                elif k == 1:
                    kind, frames, rate = "audio", 1, AUDIO_RATE
                    n = 4000 + (mid % 5) * 1000
                    payload = kmedia.encode_wav(audio_samples(mid, n),
                                                AUDIO_RATE)
                else:
                    kind, frames, rate = "video", (mid % 24) + 8, 0
                    payload = f"FAKEMEDIA:{mid}".encode()
                rows.append({"media_id": mid, "kind": kind, "width": w,
                             "height": h, "n_frames": frames,
                             "sample_rate": rate, "payload": payload})
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "width", "height", "n_frames",
                "sample_rate", "payload"])

    return spark.range(0, n_rows, 1, n_partitions).mapInPandas(
        gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB for codec-bound formats: deterministic fake decoder. A
    real deployment swaps this for PIL/av inside the same mapInPandas
    batch; the Spark plumbing (schema in/out, batching, partitioning)
    is identical. Self-describing formats no longer come here — they
    decode for real via kernels/media.

    Raises NotImplementedError for payloads a real codec would handle
    but the fake cannot — the honest boundary.
    """
    if not payload.startswith(b"FAKEMEDIA:"):
        raise NotImplementedError(
            "codec-bound media decode (JPEG/MP3/H.264...) requires "
            "libraries not present in this environment; self-describing "
            "formats (WAV/PPM/BMP) decode via kernels.media"
        )
    seed = int(payload.split(b":", 1)[1])
    return _md5_pixels(seed, width, height)


def media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per batch: mean/std intensity, a 4x4
    downsample fingerprint hash (images / fake-video frames) or exact
    sample moments + head fingerprint (PCM audio). Routing is by magic
    bytes (kernels.media.sniff_kind): PPM/PGM and WAV decode for REAL;
    FAKEMEDIA marks the codec-stub side; anything else raises at the
    honest boundary. Arrow batch shape and output schema are
    production-real.
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
                b = bytes(payload)
                fmt = kmedia.sniff_kind(b)
                if fmt == "ppm":
                    arr = kmedia.decode_ppm(b)
                elif fmt == "bmp":
                    arr = kmedia.decode_bmp(b)
                elif fmt == "wav":
                    samples, _rate = kmedia.decode_wav(b)
                    # shifted to 0..65535: non-negative exact moments +
                    # head fingerprint, SQL-reproducible closed form
                    u = samples.astype(np.int64).ravel() + 32768
                    n_s = u.size
                    s1 = int(u.sum())
                    s2 = int((u * u).sum())
                    mean = s1 / n_s
                    fp = hashlib.md5(
                        ",".join(str(int(v)) for v in u[:16]).encode()
                    ).hexdigest()
                    rows.append({
                        "media_id": int(mid), "kind": kind,
                        "mean_intensity": mean,
                        "std_intensity": float(
                            np.sqrt(s2 / n_s - mean * mean)),
                        "thumb_fp": fp,
                    })
                    continue
                else:
                    arr = _fake_decode(b, int(width), int(height))
                if arr.ndim == 3:  # RGB (BMP/P6): channel-mean gray
                    arr = arr.mean(axis=2).astype(np.uint8)
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
