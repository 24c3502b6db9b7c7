"""GIF codec (functions/gifcodec.py): LZW variable-width round-trips,
interlace de-shuffle, animation composition, KwKwK and clear-on-full
paths, clean errors on malformed streams, decode_image dispatch."""

import random

import pytest

from xorq_spark.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
    gif_encode_frames,
)


def _rgb(pal, idx):
    out = bytearray()
    for v in idx:
        out += bytes(pal[v])
    return bytes(out)


def test_roundtrip_fuzz_plain_and_interlaced():
    rng = random.Random(42)
    for _ in range(25):
        w, h = rng.randrange(1, 48), rng.randrange(1, 48)
        np_ = rng.randrange(2, 257)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(np_)
        ]
        idx = [rng.randrange(np_) for _ in range(w * h)]
        for il in (False, True):
            got = gif_decode(gif_encode(idx, w, h, pal, interlace=il))
            assert got == (w, h, [_rgb(pal, idx)])


def test_lzw_kwkwk_case():
    # the classic aba/abab stream forces code == next_code on decode
    seq = [0, 1, 0, 1, 0, 1, 0, 1, 0]
    enc = _lzw_encode(seq, 2)
    assert list(_lzw_decode(enc, 2, len(seq))) == seq


def test_lzw_clear_on_full_table():
    # >4096 distinct phrases forces the encoder's clear-and-rebuild
    rng = random.Random(7)
    seq = [rng.randrange(4) for _ in range(60_000)]
    enc = _lzw_encode(seq, 2)
    assert list(_lzw_decode(enc, 2, len(seq))) == seq


def test_animation_composes_on_canvas():
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    base = [1] * 9
    # second frame only paints the corner pixel via a small image? the
    # encoder emits full-canvas frames; composition is still exercised
    # by successive frames overwriting
    f2 = [2] * 9
    w, h, frames = gif_decode(gif_encode_frames([base, f2], 3, 3, pal))
    assert (w, h, len(frames)) == (3, 3, 2)
    assert frames[0] == _rgb(pal, base) and frames[1] == _rgb(pal, f2)


def test_extensions_and_trailer_are_walked():
    pal = [(1, 2, 3), (4, 5, 6)]
    enc = bytearray(gif_encode([0, 1, 1, 0], 2, 2, pal))
    # splice a comment extension before the image descriptor
    i = enc.index(0x2C, 13 + 6)
    enc[i:i] = b"\x21\xfe\x05hello\x00"
    assert gif_decode(bytes(enc))[2][0] == _rgb(pal, [0, 1, 1, 0])


def test_malformed_streams_are_clean_errors():
    with pytest.raises(ValueError, match="magic"):
        gif_decode(b"NOTAGIF")
    pal = [(0, 0, 0), (1, 1, 1)]
    enc = bytearray(gif_encode([0, 1], 2, 1, pal))
    with pytest.raises(ValueError):
        gif_decode(bytes(enc[: len(enc) // 2]))


def test_unsupported_disposal_is_named():
    pal = [(0, 0, 0), (1, 1, 1)]
    enc = bytearray(gif_encode_frames([[0, 1], [1, 0]], 2, 1, pal))
    i = enc.index(b"\x21\xf9")
    # graphic control payload starts at i+3 (after len byte); set
    # disposal bits to 2 (restore to background)
    enc[i + 3] = 2 << 2
    with pytest.raises(ValueError, match="disposal"):
        gif_decode(bytes(enc))


def test_decode_image_dispatches_gif():
    from xorq_spark.functions.imagecodec import decode_image

    pal = [(9, 8, 7), (1, 2, 3)]
    idx = [0, 1, 1, 0]
    w, h, ch, px = decode_image(gif_encode(idx, 2, 2, pal))
    assert (w, h, ch) == (2, 2, 3)
    assert px == _rgb(pal, idx)
