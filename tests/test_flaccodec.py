"""FLAC codec (functions/flaccodec.py): roundtrip fuzz against the WAV
twin, every subframe/stereo/residual path, wasted bits, corrupt-stream
and honest-gate behavior, and the decode_audio dispatch."""

import math
import random
import struct

import pytest

from xorq_spark.functions.audiocodec import decode_audio, wav_encode
from xorq_spark.functions.flaccodec import (
    flac_decode,
    flac_encode,
)


def _signal(i, n, ch):
    return [((i * 31 + 11 * k) % 4001) - 2000 for k in range(n * ch)]


def test_roundtrip_fuzz_vs_wav_twin():
    """The fixture schedule of synth_flac_assets: every id decodes to
    EXACTLY the samples its WAV twin carries (losslessness is the whole
    claim), across stereo modes, LPC, RICE2, multi-frame + partial last
    block."""
    for i in range(40):
        ch = 1 + i % 2
        n = 64 + i % 33
        rate = 8000 + (i % 3) * 4000
        s = _signal(i, n, ch)
        mode = (
            ["independent", "left_side", "right_side", "mid_side"][i % 4]
            if ch == 2
            else "independent"
        )
        enc = flac_encode(
            s, rate, ch, blocksize=32, stereo_mode=mode,
            use_lpc=(i % 8 >= 6), rice2=(i % 5 == 0),
        )
        assert flac_decode(enc) == (rate, ch, 16, s)
        # WAV twin decodes to the same samples through the shared path
        assert decode_audio(wav_encode(s, rate, ch, 2))[3] == s


def test_fixed_prediction_genuinely_compresses():
    # a smooth signal under best-FIXED prediction must come out well
    # under raw PCM (the lossless-compression claim, on a signal long
    # enough to amortize headers)
    s = [int(8000 * math.sin(k / 9)) for k in range(1000)]
    enc = flac_encode(s, 8000, 1, blocksize=256)
    assert len(enc) < 2 * len(s) * 0.75, (len(enc), 2 * len(s))
    assert flac_decode(enc)[3] == s


def test_roundtrip_edge_signals():
    rng = random.Random(42)
    cases = [
        [int(2000 * math.sin(k / 5)) for k in range(200)],  # smooth
        [-32768, 32767] * 50,  # extremes (17-bit side channel)
        [7] * 64,  # constant
        [rng.randrange(-32768, 32768) for _ in range(64)],  # noise
        [k * 4 for k in range(50)],  # shared trailing zeros
        [5],  # single sample
    ]
    for s in cases:
        for ch in (1, 2):
            if len(s) % ch:
                continue
            modes = (
                ["independent", "left_side", "right_side", "mid_side"]
                if ch == 2
                else ["independent"]
            )
            for mode in modes:
                for ww in (False, True):
                    enc = flac_encode(
                        s, 8000, ch, stereo_mode=mode, use_wasted=ww
                    )
                    assert flac_decode(enc)[3] == s, (ch, mode, ww)


def test_corrupt_streams_raise_by_name():
    enc = flac_encode([1, 2, 3, 4] * 32, 8000, 1)
    with pytest.raises(ValueError, match="FLAC"):
        flac_decode(enc[:20])
    bad = bytearray(enc)
    bad[50] ^= 0xFF  # inside a frame: CRC-16 must catch it
    with pytest.raises((ValueError, NotImplementedError)):
        flac_decode(bytes(bad))
    with pytest.raises(ValueError, match="fLaC magic"):
        flac_decode(b"NOPE" + enc[4:])
    with pytest.raises(ValueError, match="FLAC"):
        flac_decode(b"fLaC" + b"\x00" * 64)


def test_md5_verification_catches_tampering():
    # flip a bit in the STREAMINFO MD5: frames decode fine, the final
    # PCM signature check must refuse
    enc = bytearray(flac_encode(list(range(-100, 100)), 8000, 1))
    # STREAMINFO body starts at 4 (magic) + 4 (block header); md5 is
    # its last 16 bytes (body is 34 long)
    enc[8 + 18] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(enc))


def test_honest_gates():
    with pytest.raises(NotImplementedError, match="16-bit"):
        flac_encode([1, 2], bits=24)
    with pytest.raises(NotImplementedError, match="channels"):
        flac_encode([1, 2, 3], channels=3)


def test_decode_audio_dispatches_flac():
    s = _signal(5, 70, 2)
    enc = flac_encode(s, 12000, 2, stereo_mode="mid_side")
    assert decode_audio(enc) == (12000, 2, 2, s)
