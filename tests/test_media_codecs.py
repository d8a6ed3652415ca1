"""Pure-spec media codec tests (kernels/media) + the real-decode
multimodal boundary."""

import struct

import numpy as np
import pytest

from georeader_spark.kernels import media as km

rng = np.random.default_rng(31)


class TestWav:
    def test_roundtrip_mono_stereo(self):
        for ch in (1, 2):
            s = rng.integers(-32768, 32767, (1000, ch)).astype(np.int16)
            data = km.encode_wav(s if ch > 1 else s[:, 0], 16000)
            back, rate = km.decode_wav(data)
            assert rate == 16000
            np.testing.assert_array_equal(back, s.reshape(1000, ch))

    def test_extra_chunk_skipped(self):
        s = rng.integers(-100, 100, 64).astype(np.int16)
        data = km.encode_wav(s, 8000)
        # splice a LIST chunk (odd size -> exercises word-align skip)
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        spliced = data[:12] + extra + data[12:]
        back, rate = km.decode_wav(spliced)
        np.testing.assert_array_equal(back[:, 0], s)

    def test_8bit_pcm(self):
        # hand-built 8-bit unsigned WAV: value 128 -> 0, 129 -> 256
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        raw = bytes([128, 129, 127, 255, 0])
        body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        wav = b"RIFF" + struct.pack("<I", len(body)) + body
        s, rate = km.decode_wav(wav)
        np.testing.assert_array_equal(
            s[:, 0], [0, 256, -256, 32512, -32768])

    def test_errors(self):
        with pytest.raises(ValueError, match="RIFF"):
            km.decode_wav(b"nope" * 4)
        with pytest.raises(ValueError, match="int16"):
            km.encode_wav(np.zeros(4, np.float32), 8000)
        # compressed format code -> honest boundary
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
        body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", 0))
        with pytest.raises(NotImplementedError, match="codec"):
            km.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestPpmBmp:
    def test_ppm_roundtrip_gray_rgb(self):
        g = rng.integers(0, 256, (33, 47)).astype(np.uint8)
        np.testing.assert_array_equal(km.decode_ppm(km.encode_ppm(g)), g)
        c = rng.integers(0, 256, (20, 31, 3)).astype(np.uint8)
        np.testing.assert_array_equal(km.decode_ppm(km.encode_ppm(c)), c)

    def test_ppm_comment_header(self):
        g = rng.integers(0, 256, (4, 5)).astype(np.uint8)
        data = b"P5\n# a comment\n5 4\n255\n" + g.tobytes()
        np.testing.assert_array_equal(km.decode_ppm(data), g)

    def test_bmp_roundtrip_padding(self):
        # width 3 -> 9-byte rows padded to 12: exercises stride logic
        for w in (3, 4, 5):
            img = rng.integers(0, 256, (7, w, 3)).astype(np.uint8)
            np.testing.assert_array_equal(
                km.decode_bmp(km.encode_bmp(img)), img)

    def test_sniff(self):
        g = np.zeros((2, 2), np.uint8)
        assert km.sniff_kind(km.encode_ppm(g)) == "ppm"
        assert km.sniff_kind(
            km.encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
        assert km.sniff_kind(
            km.encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
        assert km.sniff_kind(b"FAKEMEDIA:7") == "fake"
        assert km.sniff_kind(b"\xff\xd8\xff JPEG?") == "unknown"


class TestMultimodalRealDecode:
    def test_synth_payloads_are_real_formats(self, spark):
        from georeader_spark.operators.multimodal import synth_media

        rows = synth_media(spark, 9).collect()
        by_kind = {r["kind"]: bytes(r["payload"]) for r in rows}
        assert km.sniff_kind(by_kind["image"]) == "ppm"
        assert km.sniff_kind(by_kind["audio"]) == "wav"
        assert km.sniff_kind(by_kind["video"]) == "fake"

    def test_wav_payload_decodes_to_closed_form(self, spark):
        from georeader_spark.operators import multimodal as MM

        rows = (MM.synth_media(spark, 9)
                .where("kind = 'audio'").collect())
        for r in rows:
            s, rate = km.decode_wav(bytes(r["payload"]))
            assert rate == MM.AUDIO_RATE
            n = 4000 + (r["media_id"] % 5) * 1000
            np.testing.assert_array_equal(
                s[:, 0], MM.audio_samples(r["media_id"], n))

    def test_unknown_codec_raises(self):
        from georeader_spark.operators.multimodal import _fake_decode

        with pytest.raises(NotImplementedError, match="codec-bound"):
            _fake_decode(b"\xff\xd8\xff fake jpeg", 4, 4)
