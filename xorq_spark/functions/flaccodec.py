"""Pure-stdlib FLAC codec — the lossless audio format a training-audio
corpus actually contains at volume (the audio sibling of the PNG/JPEG/
WebP/GIF image codecs; completes the gate named at audiocodec.py).

Decoder (`flac_decode`): fLaC magic, metadata-block walk (STREAMINFO
parsed, others skipped), per-frame header parse (14-bit sync, blocking
strategy, block-size/sample-rate/channel/sample-size codes, the
UTF-8-style coded frame number, CRC-8 over the header), subframes
CONSTANT / VERBATIM / FIXED orders 0-4 / LPC any order (quantized
coefficients + shift, 64-bit accumulator), Rice-coded residuals
(4-bit RICE and 5-bit RICE2 methods, any partition order, escape
partitions as raw fixed-width residuals), wasted-bits unshift, stereo
decorrelation (independent, left/side, right/side, mid/side), frame
CRC-16, and the STREAMINFO MD5 of the decoded PCM verified when
present. Honest gates raise NotImplementedError by name: variable
blocksize streams, sample widths other than 16, reserved residual
methods / channel assignments / block-size and rate codes.

Encoder (`flac_encode`, the fixture generator): real compression —
per-subframe best FIXED predictor (orders 0-4 by least residual
magnitude), optional deterministic LPC, per-partition optimal Rice
parameter, RICE2 and partition order 1 exercised on schedule, optional
mid/side / left/side stereo decorrelation, wasted-bits detection, and
genuine CRC-8/CRC-16/MD5 — so tests and the certified query decode
honestly compressed streams, never stored literals.

Scale note: runs inside Arrow-batched mapInPandas workers next to the
WAV path (functions/multimodal.py); per-file pure-Python cost is
microseconds-to-milliseconds against the payload I/O that dominates at
100 TB.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Sequence, Tuple

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _make_crc8_table():
    tab = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tab.append(c)
    return tab


def _make_crc16_table():
    tab = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tab.append(c)
    return tab


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# MSB-first bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        # FLAC unary: q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0  # bits consumed in current byte (MSB first)

    def read(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("corrupt FLAC: bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= (1 << (bits - 1)):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1

    def tell_bytes(self) -> int:
        return self.byte


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coding of the frame/sample number (extended
    past U+10FFFF, so not str.encode)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (6 - nbytes) + 1 + 6 * (nbytes - 1):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(br: "_BitReader") -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("corrupt FLAC: bad UTF-8-coded frame number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(s: int) -> int:
    return (s << 1) if s >= 0 else ((-s) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _best_rice_param(residuals: Sequence[int], max_k: int) -> int:
    best_k, best_bits = 0, None
    for k in range(max_k + 1):
        bits = sum((_zigzag(r) >> k) + 1 + k for r in residuals)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def _write_residual(
    bw: "_BitWriter",
    residuals: Sequence[int],
    blocksize: int,
    pred_order: int,
    method: int,
    part_order: int,
):
    bw.write(method, 2)
    bw.write(part_order, 4)
    kbits = 4 if method == 0 else 5
    nparts = 1 << part_order
    per = blocksize >> part_order
    pos = 0
    for p in range(nparts):
        n = per - pred_order if p == 0 else per
        part = residuals[pos : pos + n]
        pos += n
        k = _best_rice_param(part, (1 << kbits) - 2)
        bw.write(k, kbits)
        for r in part:
            u = _zigzag(r)
            bw.write_unary(u >> k)
            bw.write(u, k) if k else None


def _encode_subframe(
    bw: "_BitWriter",
    samples: List[int],
    bps: int,
    use_lpc: bool,
    method: int,
    part_order: int,
    use_wasted: bool,
):
    n = len(samples)
    # wasted bits: common trailing zeros across the subframe
    wasted = 0
    if use_wasted and any(samples):
        wasted = min(
            (s & -s).bit_length() - 1 for s in samples if s
        )
        wasted = max(0, min(wasted, bps - 1))
    if wasted:
        samples = [s >> wasted for s in samples]
        bps -= wasted

    def header(type_code: int):
        bw.write(0, 1)
        bw.write(type_code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if all(s == samples[0] for s in samples):
        header(0)  # CONSTANT
        bw.write_signed(samples[0], bps)
        return
    if use_lpc and n > 4:
        order, shift, prec = 2, 9, 12
        coefs = [3 << 7, -(1 << 7)]  # deterministic; lossless regardless
        header(32 + (order - 1))
        for w in samples[:order]:
            bw.write_signed(w, bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        residuals = [
            samples[i]
            - ((coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift)
            for i in range(order, n)
        ]
        _write_residual(bw, residuals, n, order, method, part_order)
        return
    # best FIXED order by least residual magnitude
    best = None
    for order, coefs in FIXED_COEFS.items():
        if order >= n:
            continue
        res = [
            samples[i]
            - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, n)
        ]
        cost = sum(abs(r) for r in res)
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, residuals, _ = best
    raw_bits = n * bps
    rice_bits = sum(_zigzag(r).bit_length() + 2 for r in residuals)
    if rice_bits > raw_bits * 2:
        header(1)  # VERBATIM fallback
        for s in samples:
            bw.write_signed(s, bps)
        return
    header(8 + order)
    for w in samples[:order]:
        bw.write_signed(w, bps)
    _write_residual(bw, residuals, n, order, method, part_order)


def flac_encode(
    samples: Sequence[int],
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
    blocksize: int = 32,
    stereo_mode: str = "independent",
    use_lpc: bool = False,
    rice2: bool = False,
    use_wasted: bool = False,
) -> bytes:
    """Encode interleaved 16-bit integer samples as a real FLAC stream
    (fixed blocksize; multiple frames when the signal is longer than
    one block; the last frame may be partial). `stereo_mode` one of
    independent / left_side / right_side / mid_side (2ch only)."""
    if bits != 16:
        raise NotImplementedError("flac_encode: only 16-bit supported")
    if channels not in (1, 2):
        raise NotImplementedError("flac_encode: 1 or 2 channels")
    # the frame header is emitted with blocksize code 6 (8-bit "bs-1"
    # field); a blocksize > 256 would silently truncate to the low 8
    # bits and decode to a sample-count/MD5 mismatch — fail at encode
    # time instead (code 7 / 16-bit field is a named non-goal)
    if not 1 <= blocksize <= 256:
        raise NotImplementedError(
            f"flac_encode: blocksize {blocksize} outside 1..256 "
            "(8-bit frame-header field; 16-bit code-7 form not emitted)"
        )
    n_total = len(samples) // channels
    chans = [
        list(samples[c::channels]) for c in range(channels)
    ]
    md5 = hashlib.md5(
        struct.pack("<%dh" % len(samples), *samples)
    ).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n_total, 36)
    body = si.bytes() + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    method = 1 if rice2 else 0
    frame_no = 0
    pos = 0
    while pos < n_total:
        bs = min(blocksize, n_total - pos)
        part_order = 1 if bs % 2 == 0 and bs >= 16 else 0
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(6, 4)  # blocksize-1 in 8 bits at end of header
        bw.write(0, 4)  # sample rate from STREAMINFO
        if channels == 1:
            bw.write(0, 4)
            modes = ["independent"]
        else:
            mode_code = {
                "independent": 1,
                "left_side": 8,
                "right_side": 9,
                "mid_side": 10,
            }[stereo_mode]
            bw.write(mode_code, 4)
            modes = [stereo_mode]
        bw.write(4, 3)  # 16-bit sample size
        bw.write(0, 1)  # reserved
        for b in _utf8_code(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 8)
        assert bw.nbits == 0  # header fields are byte-aligned by spec
        bw.write(crc8(bytes(bw.buf)), 8)

        block = [ch[pos : pos + bs] for ch in chans]
        if channels == 2 and stereo_mode != "independent":
            l, r = block
            if stereo_mode == "left_side":
                sub = [(l, 16), ([a - b for a, b in zip(l, r)], 17)]
            elif stereo_mode == "right_side":
                sub = [([a - b for a, b in zip(l, r)], 17), (r, 16)]
            else:  # mid_side
                sub = [
                    ([(a + b) >> 1 for a, b in zip(l, r)], 16),
                    ([a - b for a, b in zip(l, r)], 17),
                ]
        else:
            sub = [(c, 16) for c in block]
        for cs, bps in sub:
            _encode_subframe(
                bw, cs, bps, use_lpc, method, part_order, use_wasted
            )
        bw.align()
        bw.write(crc16(bytes(bw.buf)), 16)
        out += bw.bytes()
        pos += bs
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_residual(
    br: "_BitReader", blocksize: int, pred_order: int
) -> List[int]:
    method = br.read(2)
    if method > 1:
        raise NotImplementedError(
            f"unsupported FLAC: reserved residual method {method}"
        )
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("corrupt FLAC: partition order does not divide block")
    per = blocksize >> part_order
    out: List[int] = []
    for p in range(nparts):
        n = per - pred_order if p == 0 else per
        if n < 0:
            raise ValueError("corrupt FLAC: predictor order exceeds partition")
        k = br.read(kbits)
        if k == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                out.append(_unzigzag(u))
    return out


def _read_subframe(br: "_BitReader", blocksize: int, bps: int) -> List[int]:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif t == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        coefs = FIXED_COEFS[order]
        samples = [br.read_signed(eff) for _ in range(order)]
        residuals = _read_residual(br, blocksize, order)
        for r in residuals:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif t >= 32:  # LPC
        order = t - 31
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("corrupt FLAC: invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("unsupported FLAC: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        residuals = _read_residual(br, blocksize, order)
        for r in residuals:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise NotImplementedError(f"unsupported FLAC: subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(payload: bytes) -> Tuple[int, int, int, List[int]]:
    """Decode a FLAC stream -> (sample_rate, channels, bits, samples)
    with samples interleaved ints — the same return shape as
    audiocodec.decode_audio so the two formats share the DSP feature
    path. Verifies frame-header CRC-8, frame CRC-16 and (when present)
    the STREAMINFO MD5 of the decoded PCM."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("corrupt FLAC: truncated metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if ln != 34:
                raise ValueError("corrupt FLAC: bad STREAMINFO length")
            br = _BitReader(body)
            min_bs = br.read(16)
            max_bs = br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            n_total = br.read(36)
            md5 = body[18:34]
            streaminfo = (min_bs, max_bs, rate, channels, bits, n_total, md5)
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("corrupt FLAC: no STREAMINFO block")
    min_bs, max_bs, rate, channels, bits, n_total, md5 = streaminfo
    if bits != 16:
        raise NotImplementedError(
            f"unsupported FLAC: {bits}-bit samples (16-bit scope)"
        )

    # STREAMINFO total_samples == 0 is the spec's legal "unknown"
    # marker (live/streamed encodes); the sample loop below trusts it
    # as exact, so an unknown-length stream with frames following the
    # metadata would return [] — a silent wrong result. Gate it by
    # name instead (decode-until-EOF is a named non-goal).
    if n_total == 0 and pos < len(payload):
        raise NotImplementedError(
            "unsupported FLAC: STREAMINFO total_samples=0 (unknown "
            "length) with frame data present; decode-until-EOF not "
            "implemented"
        )

    chans: List[List[int]] = [[] for _ in range(channels)]
    decoded = 0
    while decoded < n_total:
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("corrupt FLAC: lost frame sync")
        br.read(1)
        if br.read(1):
            raise NotImplementedError(
                "unsupported FLAC: variable-blocksize stream"
            )
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        _utf8_decode(br)
        if bs_code == 0:
            raise NotImplementedError("unsupported FLAC: reserved block size")
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if rate_code == 0:
            frate = rate
        elif rate_code in _RATE_TABLE:
            frate = _RATE_TABLE[rate_code]
        elif rate_code == 12:
            frate = br.read(8) * 1000
        elif rate_code == 13:
            frate = br.read(16)
        elif rate_code == 14:
            frate = br.read(16) * 10
        else:
            raise NotImplementedError("unsupported FLAC: invalid rate code")
        if frate != rate:
            raise ValueError("corrupt FLAC: frame rate != STREAMINFO rate")
        if ss_code == 0:
            fbits = bits
        elif ss_code in (1, 2, 4, 5, 6):
            fbits = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}[ss_code]
        else:
            raise NotImplementedError(
                f"unsupported FLAC: sample-size code {ss_code}"
            )
        if fbits != 16:
            raise NotImplementedError(
                f"unsupported FLAC: {fbits}-bit frame (16-bit scope)"
            )
        br.align()
        header_bytes = payload[frame_start : br.tell_bytes()]
        if br.read(8) != crc8(header_bytes):
            raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            if ch_code + 1 != channels:
                raise ValueError("corrupt FLAC: frame channels != STREAMINFO")
            subs = [_read_subframe(br, bs, 16) for _ in range(channels)]
            block = subs
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("corrupt FLAC: stereo assignment on non-2ch")
            if ch_code == 8:  # left/side
                left = _read_subframe(br, bs, 16)
                side = _read_subframe(br, bs, 17)
                block = [left, [a - b for a, b in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(br, bs, 17)
                right = _read_subframe(br, bs, 16)
                block = [[a + b for a, b in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(br, bs, 16)
                side = _read_subframe(br, bs, 17)
                l, r = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    l.append((m + s) >> 1)
                    r.append((m - s) >> 1)
                block = [l, r]
        else:
            raise NotImplementedError(
                f"unsupported FLAC: reserved channel assignment {ch_code}"
            )
        br.align()
        frame_bytes = payload[frame_start : br.tell_bytes()]
        if br.read(16) != crc16(frame_bytes):
            raise ValueError("corrupt FLAC: frame CRC-16 mismatch")
        pos = br.tell_bytes()
        for c in range(channels):
            chans[c].extend(block[c])
        decoded += bs

    if decoded != n_total:
        raise ValueError("corrupt FLAC: decoded sample count mismatch")
    interleaved: List[int] = [0] * (n_total * channels)
    for c in range(channels):
        interleaved[c::channels] = chans[c]
    if md5 != b"\x00" * 16:
        got = hashlib.md5(
            struct.pack("<%dh" % len(interleaved), *interleaved)
        ).digest()
        if got != md5:
            raise ValueError("corrupt FLAC: PCM MD5 mismatch")
    return rate, channels, 16, interleaved
