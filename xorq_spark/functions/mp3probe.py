"""MPEG-1 Layer III (MP3) stream prober — pure stdlib, no wheels.

Round 9 lands the AUDIT half of MP3 support: a strict frame walker
that parses every frame header and side-info block, verifies CRC-16
when present, skips ID3v2/ID3v1 tags, and reads Xing/Info VBR tags —
the corpus-audit shape (duration, bitrate profile, CBR/VBR, channel
mode, window-switching activity) a 100 TB crawl-audio inventory needs
BEFORE anyone decodes PCM. Arrow-batched via mapInPandas in
queries/multimodal.py; zero shuffle.

The PCM synthesis half (scalefactor/Huffman decode, requantize,
stereo, alias reduction, IMDCT, polyphase synthesis) remains an
HONEST NAMED GATE (`mp3_decode_pcm`): the 34 spec Huffman tables are
published data but cannot be reproduced here with certifiable
confidence, and a fixture encoder sharing this module's tables would
not catch a mistranscription — the failure mode the repo's honest-gate
discipline exists to prevent. The probe is table-free: every field it
reads is fixed-width bit layout from ISO 11172-3 §2.4.

Fixture strategy (the FLAC playbook inverted): a committed WRITER
(`mp3_write_stream`) emits syntactically valid streams — correct
frame-length arithmetic (144·bitrate/rate + padding), real CRC-16
(poly 0x8005, init 0xFFFF, over the last 2 header bytes + side info),
correct 17/32-byte side-info bit packing — from closed-form
parameters, so the oracle replays every probed field arithmetically.
A frame-length slip, a CRC bug, or a mis-shifted side-info field
cannot hash-match.

Reference parity: the reference has no codec layer at all
(`/root/reference/python/xorq` ships example media only); this is
LLM-pipeline territory.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

__all__ = ["mp3_write_stream", "mp3_probe", "mp3_decode_pcm", "BITRATES_KBPS"]

# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free format
# (gated), 15 = invalid.
BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
SAMPLE_RATES = (44100, 48000, 32000)  # index 3 reserved

_SAMPLES_PER_FRAME = 1152


class _BitWriter:
    def __init__(self) -> None:
        self._bits: List[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        bits = self._bits
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            b <<= 8 - min(8, len(bits) - i)
            out.append(b)
        return bytes(out)

    def __len__(self) -> int:
        return len(self._bits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._bit = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._d[self._bit >> 3]
            v = (v << 1) | ((byte >> (7 - (self._bit & 7))) & 1)
            self._bit += 1
        return v


def _crc16(data: bytes, crc: int = 0xFFFF) -> int:
    """The MPEG audio CRC: X^16+X^15+X^2+1 (0x8005), MSB-first."""
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            if crc & 0x8000:
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF
            else:
                crc = (crc << 1) & 0xFFFF
    return crc


def _frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


# Deterministic 7-bit filler pattern (i*53 + 17) % 128: period 128, so
# a frame body of any length is a prefix of the tiled pattern. MPEG-1
# Layer III frames cap at 144*320000/32000 + 1 = 1441 bytes.
_FILL_PATTERN = bytes((i * 53 + 17) % 128 for i in range(128)) * 12


def _frame_fill(n: int) -> bytes:
    if n <= len(_FILL_PATTERN):
        return _FILL_PATTERN[:n]
    reps = -(-n // 128)
    return (bytes((i * 53 + 17) % 128 for i in range(128)) * reps)[:n]


def _side_info_bytes(channels: int, granules: List[List[Dict]]) -> bytes:
    """Pack MPEG-1 Layer III side info (17 bytes mono / 32 stereo).
    Each granules[gr][ch] dict may set part23, big_values, global_gain,
    scalefac_compress, short (bool -> window switching, block_type 2).

    Packed as one big-int shift chain (round 10): byte-identical to the
    former per-field _BitWriter walk — the field layout is the T.81-
    style MSB-first concatenation either way — at a fraction of the
    Python-worker CPU (this packer ran once per fixture frame and
    dominated mp3_write_stream's profile). Per (gr, ch) the 59-bit
    word is main fields (12+9+8+4), window-switching flag + block
    layout (23 bits: short sets wsf=1, block_type=2, the fixtures'
    remaining selects/gains zero), then 3 zero flag bits."""
    # prefix: main_data_begin(9) + private(5|3) + scfsi(4*ch), all zero
    bits = 9 + (5 if channels == 1 else 3) + 4 * channels
    acc = 0
    for gr in range(2):
        for ch in range(channels):
            g = granules[gr][ch]
            word = (
                ((g.get("part23", 0) & 0xFFF) << 47)
                | ((g.get("big_values", 0) & 0x1FF) << 38)
                | ((g.get("global_gain", 0) & 0xFF) << 30)
                | ((g.get("scalefac_compress", 0) & 0xF) << 26)
            )
            if g.get("short"):
                word |= (1 << 25) | (2 << 23)
            acc = (acc << 59) | word
            bits += 59
    out = acc.to_bytes(bits // 8, "big")
    assert len(out) == (17 if channels == 1 else 32)
    return out


def mp3_write_stream(
    frames: List[Dict],
    sample_rate: int,
    channels: int,
    crc: bool = False,
    xing_frames: Optional[int] = None,
    id3v2_junk: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Committed fixture writer: a syntactically valid MPEG-1 Layer III
    stream. `frames` is one dict per audio frame with keys
    bitrate_kbps, padding (0/1) and granules (see _side_info_bytes).
    When `xing_frames` is set, a Xing tag frame (side info all zero,
    'Xing' + frame count) is prepended at the first frame's bitrate.
    Frame bodies are filled with deterministic 7-bit bytes (no false
    sync). `id3v2_junk` > 0 prepends an ID3v2 tag of that payload size;
    `id3v1` appends the 128-byte 'TAG' trailer."""
    out = bytearray()
    if id3v2_junk:
        out += b"ID3" + bytes([3, 0, 0])
        out += bytes(
            [
                (id3v2_junk >> 21) & 0x7F,
                (id3v2_junk >> 14) & 0x7F,
                (id3v2_junk >> 7) & 0x7F,
                id3v2_junk & 0x7F,
            ]
        )
        out += bytes((i * 37 + 5) % 128 for i in range(id3v2_junk))

    sr_idx = SAMPLE_RATES.index(sample_rate)
    si_len = 17 if channels == 1 else 32

    def emit(bitrate_kbps: int, padding: int, si: bytes, tag: bytes = b""):
        # 32-bit header packed directly (round 10): byte-identical to
        # the former _BitWriter field walk — MSB-first sync(11),
        # version(2)=MPEG-1, layer(2)=III, protection(1), bitrate(4),
        # rate(2), padding(1), private(1), mode(2), modeext(2),
        # copyright(1), original(1), emphasis(2).
        hdr32 = (
            (0x7FF << 21)
            | (3 << 19)
            | (1 << 17)
            | ((0 if crc else 1) << 16)
            | (BITRATES_KBPS.index(bitrate_kbps) << 12)
            | (sr_idx << 10)
            | (padding << 9)
            | ((3 if channels == 1 else 0) << 6)
            | (1 << 2)  # original
        )
        h = struct.pack(">I", hdr32)
        frame = bytearray(h)
        if crc:
            frame += struct.pack(">H", _crc16(h[2:4] + si))
        frame += si
        frame += tag
        flen = _frame_length(bitrate_kbps, sample_rate, padding)
        body = flen - len(frame)
        if body < 0:
            raise ValueError("frame too small for side info + tag")
        # filler (i*53+17) % 128 has period 128 in i: slice a
        # precomputed pattern instead of a per-byte genexpr (round 10)
        frame += _frame_fill(body)
        out.extend(frame)

    if xing_frames is not None:
        si = bytes(si_len)
        tag = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", xing_frames)
        emit(frames[0]["bitrate_kbps"], 0, si, tag)
    for f in frames:
        emit(
            f["bitrate_kbps"],
            f.get("padding", 0),
            _side_info_bytes(channels, f["granules"]),
        )
    if id3v1:
        out += b"TAG" + bytes((i * 29 + 3) % 128 for i in range(125))
    return bytes(out)


def mp3_probe(payload: bytes) -> Dict:
    """Strict MPEG-1 Layer III stream walk. Returns sample_rate,
    channels, n_frames (audio frames, Xing tag frame excluded),
    has_xing, xing_frames (0 when absent), bitrate_min_kbps,
    bitrate_max_kbps, is_vbr, duration_ms, sum_part23,
    n_short_granules, n_crc_frames (CRC-verified frames incl. the tag
    frame). Raises ValueError on sync loss / CRC mismatch and
    NotImplementedError (by name) for MPEG-2/2.5, Layer I/II and
    free-format streams."""
    pos = 0
    if payload[:3] == b"ID3":
        size = (
            (payload[6] << 21)
            | (payload[7] << 14)
            | (payload[8] << 7)
            | payload[9]
        )
        pos = 10 + size

    sample_rate: Optional[int] = None
    channels: Optional[int] = None
    bitrates: List[int] = []
    has_xing = False
    xing_frames = 0
    sum_part23 = 0
    n_short = 0
    n_crc = 0
    first = True

    while pos + 4 <= len(payload):
        if payload[pos : pos + 3] == b"TAG" and len(payload) - pos == 128:
            break
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"MP3: lost frame sync at offset {pos}")
        version = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if version != 3:
            raise NotImplementedError(
                "unsupported MP3: MPEG-2/2.5 stream (MPEG-1 scope)"
            )
        if layer != 1:
            raise NotImplementedError(
                "unsupported MPEG audio: Layer "
                + {3: "I", 2: "II"}.get(layer, "reserved")
                + " (Layer III scope)"
            )
        protected = (b1 & 1) == 0
        br_idx = (b2 >> 4) & 0xF
        if br_idx == 0:
            raise NotImplementedError(
                "unsupported MP3: free-format bitrate"
            )
        if br_idx == 15:
            raise ValueError("corrupt MP3: invalid bitrate index 15")
        sr_idx = (b2 >> 2) & 3
        if sr_idx == 3:
            raise ValueError("corrupt MP3: reserved sample-rate index")
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 3
        ch = 1 if mode == 3 else 2
        rate = SAMPLE_RATES[sr_idx]
        kbps = BITRATES_KBPS[br_idx]
        if sample_rate is None:
            sample_rate, channels = rate, ch
        elif rate != sample_rate or ch != channels:
            raise ValueError("corrupt MP3: rate/mode change mid-stream")
        flen = _frame_length(kbps, rate, padding)
        if pos + flen > len(payload):
            raise ValueError("corrupt MP3: truncated final frame")

        si_off = pos + 4
        if protected:
            si_off += 2
        si_len = 17 if ch == 1 else 32
        si = payload[si_off : si_off + si_len]
        if protected:
            want = struct.unpack(">H", payload[pos + 4 : pos + 6])[0]
            got = _crc16(payload[pos + 2 : pos + 4] + si)
            if want != got:
                raise ValueError(f"corrupt MP3: CRC mismatch at {pos}")
            n_crc += 1

        tag_off = si_off + si_len
        tag4 = payload[tag_off : tag_off + 4]
        if first and tag4 in (b"Xing", b"Info"):
            has_xing = True
            flags = struct.unpack(">I", payload[tag_off + 4 : tag_off + 8])[0]
            if flags & 1:
                xing_frames = struct.unpack(
                    ">I", payload[tag_off + 8 : tag_off + 12]
                )[0]
            # tag frame carries no audio: excluded from frame stats
        else:
            bitrates.append(kbps)
            # side info decoded from ONE big int (round 10): identical
            # field walk as the former bit-by-bit _BitReader — offsets
            # advance exactly as its read() calls consumed bits
            val = int.from_bytes(si, "big")
            total = len(si) * 8
            off = 9 + (5 if ch == 1 else 3) + 4 * ch
            for _gr in range(2):
                for _c in range(ch):
                    sum_part23 += (val >> (total - off - 12)) & 0xFFF
                    off += 12 + 9 + 8 + 4
                    wsf = (val >> (total - off - 1)) & 1
                    off += 1
                    if wsf:  # window switching
                        if (val >> (total - off - 2)) & 3 == 2:
                            n_short += 1
                        off += 2 + 1 + 10 + 9
                    else:
                        off += 15 + 4 + 3
                    off += 3
        first = False
        pos += flen

    if sample_rate is None:
        raise ValueError("corrupt MP3: no frames")
    n_frames = len(bitrates)
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "n_frames": n_frames,
        "has_xing": has_xing,
        "xing_frames": xing_frames,
        "bitrate_min_kbps": min(bitrates),
        "bitrate_max_kbps": max(bitrates),
        "is_vbr": len(set(bitrates)) > 1,
        "duration_ms": n_frames * _SAMPLES_PER_FRAME * 1000 // sample_rate,
        "sum_part23": sum_part23,
        "n_short_granules": n_short,
        "n_crc_frames": n_crc,
    }


def mp3_decode_pcm(payload: bytes):
    """HONEST NAMED GATE: PCM synthesis (scalefactor + Huffman decode,
    requantize, stereo modes, alias reduction, IMDCT, polyphase filter
    bank) is not implemented — the 34 spec Huffman tables cannot be
    transcribed here with certifiable confidence, and a same-table
    fixture encoder would not catch a mistranscription. Use mp3_probe
    for stream audit; transcode to WAV/FLAC upstream for sample math."""
    raise NotImplementedError(
        "MP3 PCM synthesis not implemented (Huffman-table transcription "
        "is not certifiable offline); mp3_probe covers stream audit"
    )
