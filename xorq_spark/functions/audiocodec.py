"""Pure-stdlib WAV (RIFF PCM) audio codec — the audio sibling of
functions/imagecodec.py: real sample math with no external wheels.

- `wav_encode`: minimal RIFF writer (fmt + data chunks, PCM 16-bit or
  8-bit, any channel count / sample rate).
- `decode_audio`: hand-rolled RIFF chunk walk (not the `wave` module —
  the tests cross-check against it): validates RIFF/WAVE magic, walks
  chunks tolerating extras (LIST/fact/cue), reads `fmt ` (PCM only)
  and `data`, unpacks interleaved samples to ints.

Honest gates: compressed WAV (non-PCM format tags), 24/32-bit widths,
and non-WAV containers (MP3/FLAC/OGG sniffed by magic) raise
NotImplementedError naming the missing codec — same contract as the
image side's JPEG gate.
"""

from __future__ import annotations

import struct

_MAGIC_GATES = (
    (b"ID3", "MP3 (ID3)"),
    (b"\xff\xfb", "MP3"),
    (b"fLaC", "FLAC"),
    (b"OggS", "OGG"),
)


def wav_encode(
    samples,
    sample_rate: int = 8000,
    channels: int = 1,
    sampwidth: int = 2,
) -> bytes:
    """Encode interleaved integer samples as a PCM WAV file."""
    if sampwidth == 2:
        data = struct.pack("<%dh" % len(samples), *samples)
    elif sampwidth == 1:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise NotImplementedError(f"sampwidth {sampwidth} not supported")
    byte_rate = sample_rate * channels * sampwidth
    block_align = channels * sampwidth
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate,
        block_align, sampwidth * 8,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_audio(payload: bytes):
    """(sample_rate, channels, sampwidth, samples) from a PCM WAV
    payload. Samples are interleaved ints (16-bit signed or 8-bit
    recentered to signed)."""
    for magic, name in _MAGIC_GATES:
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode requires an audio codec library "
                "(not in this container); only PCM WAV is built in"
            )
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        # LIST/fact/cue/bext/...: skipped, per RIFF
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag not in (1, 0xFFFE):  # PCM / extensible-PCM
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed) requires an audio codec"
        )
    sampwidth = bits // 8
    if sampwidth == 2:
        n = len(data) // 2
        samples = list(struct.unpack("<%dh" % n, data[: n * 2]))
    elif sampwidth == 1:
        samples = [b - 128 for b in data]
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return rate, channels, sampwidth, samples


def audio_features(samples) -> dict:
    """Integer-exact DSP features: sum, energy (sum of squares), and
    zero crossings (sign flips across consecutive samples, negative vs
    non-negative)."""
    zc = sum(
        1
        for a, b in zip(samples, samples[1:])
        if (a < 0) != (b < 0)
    )
    return {
        "n_samples": len(samples),
        "sum_samples": sum(samples),
        "sum_sq": sum(s * s for s in samples),
        "n_zero_cross": zc,
    }
