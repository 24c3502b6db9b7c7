"""Pure-stdlib PNG codec (zlib + struct): the real decode kernel behind
the multimodal operators.

The container ships no Pillow/libjpeg, but PNG's DEFLATE stream is
stdlib `zlib`, so a complete, spec-conformant subset is implementable
with zero dependencies: 8-bit depth, grayscale / RGB / RGBA color
types, all five scanline filters (None/Sub/Up/Average/Paeth), multiple
IDAT chunks, no interlacing. That covers everything our own encoder
emits plus externally produced baseline PNGs of those color types.

Baseline AND progressive JPEG (functions/jpegcodec.py) and lossless
WebP/VP8L (functions/webpcodec.py) decode for real too; what remains
gated BY NAME is the genuinely out-of-scope perimeter —
arithmetic-coded JPEG, lossy VP8, RIFF/WAV-in-image-path — because a
fake would poison training features silently.

Scale note: these kernels run INSIDE Arrow-batched mapInPandas workers
(functions/multimodal.py) — per-row pure-Python cost on a few-KB
thumbnail is microseconds against the Arrow transfer itself, and the
hot path at 100 TB is dominated by payload I/O, not the unfilter loop.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TO_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward filter (encode side)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i in range(len(row)):
        left = row[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Inverse filter in place (decode side)."""
    if ftype == 0:
        return
    for i in range(len(row)):
        left = row[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"corrupt PNG: filter type {ftype}")
        row[i] = (row[i] + pred) & 0xFF


def png_encode(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Encode raw interleaved 8-bit pixels to a baseline PNG."""
    if channels not in _CHANNELS_TO_COLOR:
        raise ValueError(f"channels must be 1, 3, or 4 (got {channels})")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _CHANNELS_TO_COLOR[channels], 0, 0, 0
    )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(pixels[y * stride : (y + 1) * stride])
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, channels)
        prev = row
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a baseline PNG -> (width, height, channels, pixels).

    Supports bit depth 8, color types 0/2/6, filters 0-4, multi-IDAT,
    non-interlaced. Raises ValueError on anything else (truncated
    stream, CRC-structural issues surface as struct/zlib errors)."""
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLOR_TO_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _COLOR_TO_CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: bad IDAT stream ({exc})") from exc
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: decompressed size mismatch")
    pixels = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_row(ftype, row, prev, channels)
        pixels[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(pixels)


def decode_image(payload: bytes) -> Tuple[int, int, int, bytes]:
    """Dispatch on magic bytes. PNG decodes for real; other formats
    raise NotImplementedError naming the codec they need (a silent fake
    would poison training features)."""
    if payload is None:
        raise NotImplementedError("decode requires a payload; got null")
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return png_decode(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from xorq_spark.functions.jpegcodec import jpeg_decode

        return jpeg_decode(payload)
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"WEBP":
            from xorq_spark.functions.webpcodec import webp_decode

            return webp_decode(payload)
        raise NotImplementedError("RIFF/WAV decode requires a codec library")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from xorq_spark.functions.gifcodec import gif_decode

        w, h, frames = gif_decode(payload)
        return w, h, 3, frames[0]
    raise NotImplementedError(
        f"unrecognized media magic {payload[:4]!r}; only baseline PNG "
        "decodes without a codec library"
    )


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    out_width: int,
    out_height: int,
) -> bytes:
    """Nearest-neighbor resample: out(x,y) = src(floor(x*w/ow),
    floor(y*h/oh)) — integer arithmetic only, bit-identical across
    platforms (no float rounding at pixel boundaries)."""
    stride = width * channels
    out = bytearray(out_width * out_height * channels)
    o = 0
    for oy in range(out_height):
        sy = oy * height // out_height
        base = sy * stride
        for ox in range(out_width):
            sx = ox * width // out_width
            p = base + sx * channels
            out[o : o + channels] = pixels[p : p + channels]
            o += channels
    return bytes(out)
