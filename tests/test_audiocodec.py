"""WAV codec (functions/audiocodec.py): round-trips, cross-check
against the stdlib wave module, RIFF chunk tolerance, honest gates,
and the decode_audio_stats Spark surface."""

from __future__ import annotations

import io
import struct
import wave

import pytest
from hypothesis import given, settings, strategies as st

from xorq_spark.functions.audiocodec import (
    audio_features,
    decode_audio,
    wav_encode,
)


class TestWavCodec:
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=300,
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
        channels=st.sampled_from([1, 2]),
    )
    @settings(max_examples=50, deadline=None)
    def test_roundtrip(self, samples, rate, channels):
        payload = wav_encode(samples, rate, channels, 2)
        r, ch, sw, got = decode_audio(payload)
        assert (r, ch, sw) == (rate, channels, 2)
        assert got == samples

    def test_cross_check_against_stdlib_wave(self):
        samples = [((i * 37) % 4001) - 2000 for i in range(200)]
        payload = wav_encode(samples, 16000, 2, 2)
        with wave.open(io.BytesIO(payload), "rb") as w:
            assert w.getnchannels() == 2
            assert w.getframerate() == 16000
            assert w.getsampwidth() == 2
            frames = w.readframes(w.getnframes())
        assert list(struct.unpack("<200h", frames)) == samples
        # and our decoder reads a stdlib-wave-written file
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack("<200h", *samples))
        r, ch, sw, got = decode_audio(buf.getvalue())
        assert (r, ch, sw) == (8000, 1, 2) and got == samples

    def test_8bit_pcm(self):
        samples = [-128, -1, 0, 1, 127]
        payload = wav_encode(samples, 8000, 1, 1)
        r, ch, sw, got = decode_audio(payload)
        assert sw == 1 and got == samples

    def test_extra_chunks_tolerated(self):
        samples = [1, -2, 3]
        payload = wav_encode(samples, 8000, 1, 2)
        # splice a LIST chunk between fmt and data
        fmt_end = payload.index(b"data")
        listing = b"LIST" + struct.pack("<I", 4) + b"INFO"
        spliced = payload[:fmt_end] + listing + payload[fmt_end:]
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        assert decode_audio(spliced)[3] == samples

    def test_honest_gates(self):
        with pytest.raises(NotImplementedError, match="MP3"):
            decode_audio(b"ID3\x04" + b"\x00" * 64)
        with pytest.raises(NotImplementedError, match="FLAC"):
            decode_audio(b"fLaC" + b"\x00" * 64)
        with pytest.raises(ValueError):
            decode_audio(b"nonsense")
        # compressed WAV (format tag 85 = MP3-in-WAV)
        fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)
        payload = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError, match="format tag"):
            decode_audio(payload)

    def test_features(self):
        f = audio_features([3, -1, 2, -2, 0])
        assert f["n_samples"] == 5
        assert f["sum_samples"] == 2
        assert f["sum_sq"] == 9 + 1 + 4 + 4
        # sign flips: 3->-1, -1->2, 2->-2, -2->0  => 4
        assert f["n_zero_cross"] == 4


def test_decode_audio_stats_spark(spark):
    import pyspark.sql.functions as F

    from xorq_spark.functions.multimodal import (
        decode_audio_stats,
        synth_wav_assets,
    )

    ids = spark.range(6).select(F.col("id").alias("asset_id"))
    out = {
        r["asset_id"]: r
        for r in decode_audio_stats(synth_wav_assets(ids)).collect()
    }
    for i in range(6):
        ch = 1 + i % 2
        n = (64 + i % 33) * ch
        samples = [((i * 31 + 11 * k) % 4001) - 2000 for k in range(n)]
        f = audio_features(samples)
        r = out[i]
        assert r["channels"] == ch and r["n_samples"] == n
        assert r["sum_samples"] == f["sum_samples"]
        assert r["sum_sq"] == f["sum_sq"]
        assert r["n_zero_cross"] == f["n_zero_cross"]
        assert len(r["pcm_sha256"]) == 64
