"""Pure-spec media codecs for self-describing formats.

The multimodal operators treat image/audio/video as opaque binary +
typed metadata (task brief). This container has no codec libraries,
but three families need none — their formats are fully specified by
public byte-layout documents and decode with struct/numpy alone:

- WAV / RIFF PCM (8/16-bit): the canonical chunk layout
  (RIFF size WAVE, ``fmt `` with audio_format=1, ``data``).
- PPM (P6) / PGM (P5): ASCII header (magic, width, height, maxval)
  + raw samples.
- BMP (Windows V3, 24-bit BI_RGB): BITMAPFILEHEADER +
  BITMAPINFOHEADER, bottom-up rows padded to 4 bytes.

These make the multimodal path REAL for raster images and PCM audio —
operators/multimodal routes by magic bytes and keeps the honest
NotImplementedError boundary only for genuinely codec-bound formats
(JPEG/MP3/H.264...), mirroring the reference's load_bytes which hands
bytes to rasterio/GDAL (geotensor.py:2165-2214).

Encoders exist so synthetic tables and sinks can round-trip; all
functions are numpy-vectorized per payload (the per-payload loop lives
in the operators' Arrow batches).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = [
    "encode_wav", "decode_wav", "encode_ppm", "decode_ppm",
    "encode_bmp", "decode_bmp", "sniff_kind",
]


# --- WAV / RIFF PCM -------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM WAV from int16 samples, shape (n,) mono or (n, ch)."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"int16 samples required, got {s.dtype}")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """-> (samples int16 (n, ch), sample_rate). Walks the chunk list
    (extra chunks like LIST are skipped, as the spec requires)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"compressed WAV (format {audio_format}) needs codec libraries")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif bits == 8:  # 8-bit WAV is unsigned, centered at 128
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    return s.reshape(-1, ch), rate


# --- PPM / PGM ------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (H, W, 3) or P5 (H, W) uint8 -> bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"uint8 image required, got {img.dtype}")
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"(H,W) or (H,W,3) required, got {img.shape}")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def _ppm_tokens(payload: bytes, n: int):
    """First n whitespace-separated header tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset_past_header)."""
    toks = []
    i = 2
    while len(toks) < n:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM/PGM supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=off)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


# --- BMP (V3 24-bit BI_RGB) ----------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("(H,W,3) uint8 required")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h, _, bits, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bits != 24 or comp != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, np.uint8, count=h * stride,
                        offset=off).reshape(h, stride)
    img = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def sniff_kind(payload: bytes) -> str:
    """Magic-byte router used by the multimodal operators."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload.startswith(b"FAKEMEDIA:"):
        return "fake"
    return "unknown"
