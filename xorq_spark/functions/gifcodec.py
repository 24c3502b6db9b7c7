"""Pure-stdlib GIF codec (GIF87a/89a, LZW) — the fourth real image
format next to PNG (imagecodec.py), baseline+progressive JPEG
(jpegcodec.py) and lossless WebP/VP8L (webpcodec.py).

Decoder: logical screen descriptor, global/local color tables,
extension-block skipping (graphic control / application / comment),
variable-width LSB-first LZW with clear/EOI codes and 12-bit cap,
interlaced row de-shuffling (the four GIF passes), multi-frame
animations composed onto the canvas at each image's (left, top) with
disposal "leave in place" — enough to decode what mainstream encoders
emit for palette images and simple animations. Transparency IS
composed (transparent indices leave the underlying canvas pixel
untouched); only disposal modes 2/3 (restore-to-background /
restore-to-previous) raise ValueError by name (the honest-gate
discipline: a fake would poison training features silently).

Encoder (fixture generator + re-encode path): palette-quantized single
or multi-frame GIF89a with real LZW compression (dictionary growth,
width bumps, clear-on-full), optional interlace — so tests and the
certified query exercise the decoder against genuinely compressed
streams, not stored literals.

Scale note: runs inside Arrow-batched mapInPandas workers
(functions/multimodal.py) — per-thumbnail pure-Python cost is
microseconds-to-milliseconds against payload I/O at 100 TB.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# the four interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, variable width, clear/EOI)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary: code -> bytes; rebuilt on clear
    table: List[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF: first LZW code unknown")
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt GIF: LZW code out of range")
            out += entry
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                # some encoders omit EOI; stop once the frame is full
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


def _lzw_encode(indices: Sequence[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    if not indices:
        emit(eoi, width)
    else:
        buf = bytes([indices[0]])
        for px in indices[1:]:
            cand = buf + bytes([px])
            if cand in table:
                buf = cand
                continue
            emit(table[buf], width)
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                width = min_code_size + 1
                next_code = eoi + 1
            buf = bytes([px])
        emit(table[buf], width)
        emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("corrupt GIF: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(data[pos : pos + n]) != n:
            raise ValueError("corrupt GIF: truncated sub-block")
        pos += n
    # unreachable


def gif_encode(
    indices: Sequence[int],
    width: int,
    height: int,
    palette: Sequence[Tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a from palette indices + an RGB palette."""
    return gif_encode_frames(
        [indices], width, height, palette, interlace=interlace
    )


def gif_encode_frames(
    frames: Sequence[Sequence[int]],
    width: int,
    height: int,
    palette: Sequence[Tuple[int, int, int]],
    interlace: bool = False,
    delay_cs: int = 10,
) -> bytes:
    """Multi-frame (animated) GIF89a: each frame is a full-canvas index
    array; frames after the first carry a graphic-control extension
    with disposal 'leave in place'."""
    if not (1 <= len(palette) <= 256):
        raise ValueError("palette must have 1..256 entries")
    size_bits = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << size_bits
    min_code = max(2, size_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_bits - 1), 0, 0)
    for i in range(table_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    for fi, fr in enumerate(frames):
        if len(fr) != width * height:
            raise ValueError("frame size mismatch")
        if fi > 0 or len(frames) > 1:
            # graphic control: disposal 1 (leave in place), no transparency
            out += b"\x21\xf9" + _sub_blocks(
                struct.pack("<BHB", 1 << 2, delay_cs, 0)
            )
        ilace_flag = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, ilace_flag
        )
        rows = list(range(height))
        if interlace:
            rows = [
                y for first, step in _INTERLACE for y in range(first, height, step)
            ]
        seq: List[int] = []
        for y in rows:
            seq.extend(fr[y * width : (y + 1) * width])
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(seq, min_code))
    out += b"\x3b"
    return bytes(out)


def gif_decode(data: bytes) -> Tuple[int, int, List[bytes]]:
    """Decode a GIF -> (width, height, [RGB frame bytes]) with frames
    composed onto the logical canvas (disposal 'none'/'leave')."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    global_pal: Optional[List[Tuple[int, int, int]]] = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = [
            tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
        ]
        pos += 3 * n
    canvas = bytearray(width * height * 3)
    frames: List[bytes] = []
    transparent: Optional[int] = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags = payload[0]
                disposal = (flags >> 2) & 0x7
                if disposal > 1:
                    raise ValueError(
                        "unsupported GIF: disposal mode "
                        f"{disposal} (restore-to-bg/previous)"
                    )
                transparent = payload[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, w, h, ip = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = global_pal
        if ip & 0x80:
            n = 2 << (ip & 0x07)
            pal = [
                tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            pos += 3 * n
        if pal is None:
            raise ValueError("corrupt GIF: image without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("corrupt GIF: LZW stream short of pixels")
        rows = list(range(h))
        if ip & 0x40:  # interlaced: rows arrive in pass order
            order = [
                y for first, step in _INTERLACE for y in range(first, h, step)
            ]
            rows = order
        for src_row, y in enumerate(rows):
            for x in range(w):
                v = idx[src_row * w + x]
                if transparent is not None and v == transparent:
                    continue
                if v >= len(pal):
                    raise ValueError("corrupt GIF: palette index out of range")
                cy, cx = top + y, left + x
                if cy >= height or cx >= width:
                    continue
                o = (cy * width + cx) * 3
                canvas[o : o + 3] = bytes(pal[v])
        frames.append(bytes(canvas))
        transparent = None
    if not frames:
        raise ValueError("corrupt GIF: no image blocks")
    return width, height, frames
