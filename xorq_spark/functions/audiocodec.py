"""Pure-stdlib WAV (RIFF PCM) audio codec — the audio sibling of
functions/imagecodec.py: real sample math with no external wheels.

- `wav_encode`: minimal RIFF writer (fmt + data chunks, PCM 16-bit or
  8-bit, any channel count / sample rate).
- `decode_audio`: hand-rolled RIFF chunk walk (not the `wave` module —
  the tests cross-check against it): validates RIFF/WAVE magic, walks
  chunks tolerating extras (LIST/fact/cue), reads `fmt ` (PCM only)
  and `data`, unpacks interleaved samples to ints.

FLAC payloads dispatch to the round-8 pure-stdlib decoder
(functions/flaccodec.py — fixed/LPC prediction, Rice coding, stereo
decorrelation). Honest gates: compressed WAV (non-PCM format tags),
24/32-bit widths, and the remaining lossy containers (MP3/OGG sniffed
by magic) raise NotImplementedError naming the missing codec — same
contract as the image side's arithmetic-JPEG gate.
"""

from __future__ import annotations

import struct

_MAGIC_GATES = (
    (b"ID3", "MP3 (ID3)"),
    (b"\xff\xfb", "MP3"),
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
    """(sample_rate, channels, sampwidth, samples) from a PCM WAV or
    FLAC payload (FLAC dispatches to functions/flaccodec.py — round 8
    closed the gate). Samples are interleaved ints (16-bit signed or
    8-bit recentered to signed)."""
    if payload[:4] == b"fLaC":
        from xorq_spark.functions.flaccodec import flac_decode

        rate, channels, bits, samples = flac_decode(payload)
        return rate, channels, bits // 8, samples
    for magic, name in _MAGIC_GATES:
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode requires an audio codec library "
                "(not in this container); only PCM WAV and FLAC are "
                "built in. For MP3, functions/mp3probe.py mp3_probe "
                "covers the stream-audit half (frames, side info, CRC, "
                "Xing, duration) without PCM synthesis"
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


# --- AVI (RIFF) video: uncompressed-DIB frames --------------------------
#
# AVI shares the RIFF container with WAV, so the same chunk walk reads
# it. We support the honest subset a pure-stdlib codec can: 24-bit
# uncompressed DIB ('00db') frames. Compressed fourccs (MJPG/H264/...)
# raise NotImplementedError naming the codec, like the audio gates.


def avi_encode(frames, width: int, height: int, fps: int = 10) -> bytes:
    """Encode a list of frames (each `bytes` of BGR24, bottom-up row
    order, rows padded to 4 bytes — the DIB convention) as an
    uncompressed AVI."""
    row = width * 3
    pad = (-row) % 4
    stride = row + pad
    fsize = stride * height
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame must be {fsize} bytes (got {len(f)})")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, fsize * fps, 0, 0x10, len(frames), 0, 1, fsize,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), fsize, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsize, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_avi(payload: bytes):
    """Shared RIFF/AVI chunk walk:
    (width, height, fps, fourcc, frames-as-stored-bytes)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    def walk(buf, pos, end):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            yield cid, pos + 8, size
            pos += 8 + size + (size & 1)

    width = height = fps = None
    fourcc = b"\x00\x00\x00\x00"
    frames = []
    for cid, off, size in walk(payload, 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])):
        if cid != b"LIST":
            continue
        kind = payload[off : off + 4]
        if kind == b"hdrl":
            for c2, o2, s2 in walk(payload, off + 4, off + size):
                if c2 == b"avih":
                    vals = struct.unpack("<IIIIIIIIIIIIII", payload[o2 : o2 + 56])
                    fps = 1_000_000 // vals[0] if vals[0] else 0
                    width, height = vals[8], vals[9]
                elif c2 == b"LIST" and payload[o2 : o2 + 4] == b"strl":
                    for c3, o3, s3 in walk(payload, o2 + 4, o2 + s2):
                        if c3 == b"strh":
                            fourcc = payload[o3 + 4 : o3 + 8]
        elif kind == b"movi":
            for c2, o2, s2 in walk(payload, off + 4, off + size):
                if c2 in (b"00db", b"00dc"):
                    frames.append(payload[o2 : o2 + s2])
    if width is None:
        raise ValueError("missing hdrl/avih")
    return width, height, fps, fourcc, frames


def decode_video(payload: bytes):
    """(width, height, fps, frames) from an uncompressed-DIB AVI;
    frames are BGR24 bytes in the stored (bottom-up, padded) layout.
    MJPG dispatches to decode_video_mjpeg's domain; other compressed
    fourccs raise NotImplementedError naming the codec."""
    width, height, fps, fourcc, frames = _decode_avi(payload)
    if fourcc == b"MJPG":
        raise NotImplementedError(
            "MJPG AVI carries JPEG frames: use decode_video_mjpeg "
            "(round 9) for per-frame pixel decode"
        )
    if fourcc not in (b"DIB ", b"\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"video fourcc {fourcc!r} requires a codec library; "
            "uncompressed DIB and MJPG are built in"
        )
    return width, height, fps, frames


def avi_encode_mjpeg(jpeg_frames, width: int, height: int, fps: int = 10) -> bytes:
    """Encode pre-encoded JPEG payloads as an MJPEG AVI (fourcc MJPG,
    '00dc' compressed-frame chunks) — the container shape compressed
    multimodal crawl video actually ships (round 9; composes the
    committed baseline-JPEG encoder with this RIFF writer)."""
    for f in jpeg_frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame is not a JPEG (missing SOI)")
    maxf = max((len(f) for f in jpeg_frames), default=0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, maxf * fps, 0, 0x10, len(jpeg_frames), 0, 1, maxf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpeg_frames), maxf, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    # biCompression carries the MJPG fourcc per VfW convention
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", maxf, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_video_mjpeg(payload: bytes):
    """(width, height, fps, frames) from an MJPEG AVI, where each
    frame is DECODED pixels: (w, h, channels, pixel bytes) via the
    committed baseline/progressive JPEG decoder (functions/
    jpegcodec.py). The per-frame dimensions are authoritative (MJPEG
    permits per-frame variation); the container's hdrl w/h is advisory."""
    from xorq_spark.functions.jpegcodec import jpeg_decode

    width, height, fps, fourcc, stored = _decode_avi(payload)
    if fourcc != b"MJPG":
        raise ValueError(f"not an MJPEG AVI (fourcc {fourcc!r})")
    return width, height, fps, [jpeg_decode(f) for f in stored]


def frame_pixel_sums(frame: bytes, width: int, height: int) -> tuple:
    """(sum_b, sum_g, sum_r) over a stored DIB frame, skipping the row
    padding — integer-exact, certifiable."""
    row = width * 3
    stride = row + ((-row) % 4)
    sb = sg = sr = 0
    for y in range(height):
        base = y * stride
        r = frame[base : base + row]
        sb += sum(r[0::3])
        sg += sum(r[1::3])
        sr += sum(r[2::3])
    return sb, sg, sr


def resample_linear(samples, channels: int, rate_in: int, rate_out: int):
    """Integer-exact linear-interpolation resample of interleaved
    samples from rate_in to rate_out — the decode -> RESAMPLE ->
    feature step every training-audio pipeline runs (models want one
    rate; corpora arrive at many).

    Output length per channel M = ((n_in - 1) * rate_out) DIV rate_in
    + 1 (the last output lands on or before the last input — no
    extrapolation). Output sample t reads source position
    p = t * rate_in / rate_out as i = num DIV rate_out,
    f = num MOD rate_out and blends
    ((s[i]+K)*(rate_out-f) + (s[i+1]+K)*f) DIV rate_out - K with
    K = 32768: the shift keeps every numerator nonnegative so
    truncating and flooring division agree — the property that lets a
    SQL oracle replay the resample bit-for-bit (Spark/DuckDB integer
    division diverge on negatives)."""
    if channels < 1 or rate_in < 1 or rate_out < 1:
        raise ValueError("resample_linear: bad channels/rates")
    n_in = len(samples) // channels
    if n_in == 0:
        return []
    K = 32768
    m = ((n_in - 1) * rate_out) // rate_in + 1
    out = [0] * (m * channels)
    for c in range(channels):
        ch = samples[c::channels]
        for t in range(m):
            num = t * rate_in
            i = num // rate_out
            f = num - i * rate_out
            if f == 0:
                v = ch[i]
            else:
                v = (
                    (ch[i] + K) * (rate_out - f)
                    + (ch[i + 1] + K) * f
                ) // rate_out - K
            out[t * channels + c] = v
    return out


def energy_segments(samples, channels: int, frame_len: int = 16) -> dict:
    """VAD-style energy segmentation of channel 0 — the clip-extraction
    primitive of a training-audio pipeline (speech corpora keep active
    spans, drop silence). Frames of `frame_len` samples (partial tail
    kept); a frame is ACTIVE when its mean |sample| is at least the
    whole signal's mean |sample|, compared by integer
    cross-multiplication (sum_abs_frame * n_total >= sum_abs_total *
    len_frame) so a SQL oracle replays the threshold exactly. Returns
    frame/active counts plus the gaps-and-islands segment count and the
    longest active run."""
    ch0 = samples[0::channels] if channels > 1 else list(samples)
    n = len(ch0)
    if n == 0:
        return {"n_frames": 0, "n_active": 0, "n_segments": 0, "max_run": 0}
    total_abs = sum(abs(v) for v in ch0)
    n_frames = (n + frame_len - 1) // frame_len
    n_active = n_segments = max_run = run = 0
    prev_active = False
    for k in range(n_frames):
        fr = ch0[k * frame_len : (k + 1) * frame_len]
        s = sum(abs(v) for v in fr)
        active = s * n >= total_abs * len(fr)
        if active:
            n_active += 1
            run = run + 1 if prev_active else 1
            if not prev_active:
                n_segments += 1
            max_run = max(max_run, run)
        else:
            run = 0
        prev_active = active
    return {
        "n_frames": n_frames,
        "n_active": n_active,
        "n_segments": n_segments,
        "max_run": max_run,
    }
