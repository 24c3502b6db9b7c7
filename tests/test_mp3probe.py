"""MP3 probe: writer/walker round-trip, CRC and corruption detection,
tag skipping, and the named PCM gate."""

from __future__ import annotations

import pytest

from xorq_spark.functions.mp3probe import (
    BITRATES_KBPS,
    mp3_decode_pcm,
    mp3_probe,
    mp3_write_stream,
)


def _frames(n, kbps=96, short_every=None):
    out = []
    for k in range(n):
        grans = [
            [
                {
                    "part23": (k * 13 + gr) % 4096,
                    "short": short_every is not None
                    and (k + gr) % short_every == 0,
                }
            ]
            for gr in range(2)
        ]
        out.append({"bitrate_kbps": kbps, "padding": k % 3 == 0,
                    "granules": grans})
    return out


def test_cbr_mono_roundtrip():
    p = mp3_write_stream(_frames(10), 44100, 1)
    r = mp3_probe(p)
    assert r["sample_rate"] == 44100 and r["channels"] == 1
    assert r["n_frames"] == 10 and not r["is_vbr"] and not r["has_xing"]
    assert r["bitrate_min_kbps"] == r["bitrate_max_kbps"] == 96
    assert r["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert r["sum_part23"] == sum((k * 13 + gr) % 4096
                                  for k in range(10) for gr in range(2))


def test_vbr_xing_and_tags():
    frames = [dict(f, bitrate_kbps=BITRATES_KBPS[1 + (k % 14)])
              for k, f in enumerate(_frames(20))]
    p = mp3_write_stream(frames, 48000, 1, xing_frames=20,
                         id3v2_junk=77, id3v1=True)
    r = mp3_probe(p)
    assert r["has_xing"] and r["xing_frames"] == 20
    assert r["n_frames"] == 20 and r["is_vbr"]
    assert r["bitrate_min_kbps"] == 32 and r["bitrate_max_kbps"] == 320


def test_crc_verified_and_corruption_caught():
    p = mp3_write_stream(_frames(3), 44100, 1, crc=True)
    assert mp3_probe(p)["n_crc_frames"] == 3
    b = bytearray(p)
    b[8] ^= 1  # side-info byte, CRC-covered
    with pytest.raises(ValueError, match="CRC mismatch"):
        mp3_probe(bytes(b))


def test_stereo_side_info_and_short_blocks():
    frames = []
    for k in range(4):
        grans = [[{"part23": 100 + k, "short": c == 0}
                  for c in range(2)] for _gr in range(2)]
        frames.append({"bitrate_kbps": 128, "padding": 0, "granules": grans})
    p = mp3_write_stream(frames, 32000, 2)
    r = mp3_probe(p)
    assert r["channels"] == 2
    assert r["n_short_granules"] == 4 * 2  # ch 0 of both granules
    assert r["sum_part23"] == sum(4 * (100 + k) for k in range(4))


def test_truncation_and_sync_loss():
    p = mp3_write_stream(_frames(3), 44100, 1)
    with pytest.raises(ValueError, match="truncated"):
        mp3_probe(p[:-5])
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_probe(b"\x00\x00\x00\x00" + p)


def test_named_gates():
    p = bytearray(mp3_write_stream(_frames(1), 44100, 1))
    p[1] = 0xF3  # version bits -> MPEG-2
    with pytest.raises(NotImplementedError, match="MPEG-2"):
        mp3_probe(bytes(p))
    p = bytearray(mp3_write_stream(_frames(1), 44100, 1))
    p[2] &= 0x0F  # bitrate index 0 = free format
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3_probe(bytes(p))
    with pytest.raises(NotImplementedError, match="PCM synthesis"):
        mp3_decode_pcm(b"\xff\xfb\x90\x00")
