"""Baseline JPEG codec semantics (functions/jpegcodec.py): exact
DC-only roundtrips, lossy-path tolerances vs an independent float IDCT,
Huffman/bitstream edge cases, and the unsupported-feature gates."""

from __future__ import annotations

import math
import struct

import pytest

from xorq_spark.functions.imagecodec import decode_image
from xorq_spark.functions.jpegcodec import (
    Q_LUMA,
    ZIGZAG,
    _build_codes,
    _build_decode,
    jpeg_decode,
    jpeg_encode,
    scale_quant,
    DC_LUMA_SPEC,
)


def _uniform_blocks(bw: int, bh: int, seed: int) -> bytes:
    w, h = bw * 8, bh * 8
    px = bytearray(w * h)
    for by in range(bh):
        for bx in range(bw):
            v = 128 + 2 * (((seed * 5 + 7 * bx + 11 * by) % 53) - 26)
            for yy in range(8):
                row = (by * 8 + yy) * w + bx * 8
                px[row : row + 8] = bytes([v]) * 8
    return bytes(px)


def test_uniform_block_roundtrip_is_exact():
    for seed in (0, 3, 17, 41):
        px = _uniform_blocks(3, 2, seed)
        enc = jpeg_encode(px, 24, 16, 1, quality=50)
        assert enc[:3] == b"\xff\xd8\xff"[:3] or enc[:2] == b"\xff\xd8"
        w, h, ch, out = jpeg_decode(enc)
        assert (w, h, ch) == (24, 16, 1)
        assert out == px


def test_gradient_roundtrip_within_tolerance():
    """AC path: a smooth gradient at quality 90 reconstructs within
    +-2 everywhere (float IDCT + quant step 2-3)."""
    w, h = 17, 23  # non-multiple-of-8 exercises edge padding
    px = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
    dw, dh, ch, out = jpeg_decode(jpeg_encode(px, w, h, 1, quality=90))
    assert (dw, dh, ch) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_high_frequency_content_roundtrip():
    """Checkerboard (max AC energy) survives quality 95 within a small
    bound — exercises long Huffman codes and ZRL runs."""
    w = h = 16
    px = bytes(220 if (x + y) % 2 else 40 for y in range(h) for x in range(w))
    _, _, _, out = jpeg_decode(jpeg_encode(px, w, h, 1, quality=95))
    assert max(abs(a - b) for a, b in zip(px, out)) <= 14


def test_rgb_444_roundtrip():
    w = h = 8
    px = bytes(
        b
        for y in range(h)
        for x in range(w)
        for b in ((x * 30) % 256, (y * 30) % 256, 128)
    )
    dw, dh, ch, out = jpeg_decode(jpeg_encode(px, w, h, 3, quality=85))
    assert (dw, dh, ch) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 8


def test_byte_stuffing_survives():
    """Streams that contain stuffed 0xFF00 sequences in the entropy
    segment must round-trip through the un-stuffing path."""
    stuffed = 0
    for seed in range(8):
        px = bytes((seed * 37 + i * 53) % 256 for i in range(24 * 24))
        enc = jpeg_encode(px, 24, 24, 1, quality=75)
        sos = enc.find(b"\xff\xda")
        stuffed += enc[sos:].count(b"\xff\x00")
        w, h, ch, out = jpeg_decode(enc)
        assert (w, h, ch) == (24, 24, 1)
        # pseudo-noise content at q75: lossy but sane
        assert max(abs(a - b) for a, b in zip(px, out)) <= 128
    assert stuffed > 0, "corpus never exercised byte stuffing"


def test_decode_image_dispatches_jpeg():
    px = _uniform_blocks(2, 2, 9)
    w, h, ch, out = decode_image(jpeg_encode(px, 16, 16, 1))
    assert (w, h, ch, out) == (16, 16, 1, px)


def test_relabeled_baseline_is_not_valid_progressive():
    # a baseline stream relabeled SOF2 carries an Ss=0..Se=63 scan,
    # which is not a legal progressive band — clean error, no garbage
    enc = bytearray(jpeg_encode(_uniform_blocks(2, 2, 1), 16, 16, 1))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive scan band"):
        jpeg_decode(bytes(enc))


def test_truncated_stream_is_clean_error():
    enc = jpeg_encode(_uniform_blocks(2, 2, 2), 16, 16, 1)
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")


def test_quality_scaling_monotone():
    q25 = scale_quant(Q_LUMA, 25)
    q50 = scale_quant(Q_LUMA, 50)
    q95 = scale_quant(Q_LUMA, 95)
    assert q50 == tuple(Q_LUMA)
    assert all(a >= b for a, b in zip(q25, q50))
    assert all(a <= b for a, b in zip(q95, q50))
    assert all(1 <= v <= 255 for v in q25 + q95)


def test_huffman_tables_are_canonical_inverses():
    codes = _build_codes(*DC_LUMA_SPEC)
    dec = _build_decode(*DC_LUMA_SPEC)
    for value, (code, length) in codes.items():
        assert dec[(length, code)] == value
    # prefix-free: no code is a prefix of a longer one
    all_codes = sorted(
        ((length, code) for code, length in codes.values())
    )
    for i, (l1, c1) in enumerate(all_codes):
        for l2, c2 in all_codes[i + 1 :]:
            if l2 > l1:
                assert (c2 >> (l2 - l1)) != c1


def test_dc_only_idct_matches_closed_form():
    """A DC-only block must decode to the constant DC/8 + 128 — the
    exactness the certified query's oracle depends on."""
    from xorq_spark.functions.jpegcodec import _idct

    for s in (-52, -2, 0, 2, 50):
        coef = [0] * 64
        coef[0] = 8 * s
        out = _idct(coef)
        assert out == [s + 128] * 64


def test_idct_matches_independent_reference():
    """Random sparse coefficient blocks: our IDCT equals a straight
    textbook double-sum evaluated independently (within 1 count after
    rounding/clamping)."""
    import random

    rng = random.Random(13)

    def ref_idct(coef):
        def c(u):
            return math.sqrt(0.5) if u == 0 else 1.0

        out = []
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (
                            c(u) * c(v) / 4.0
                            * coef[u * 8 + v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                p = int(round(s)) + 128
                out.append(min(255, max(0, p)))
        return out

    from xorq_spark.functions.jpegcodec import _idct

    for _ in range(5):
        coef = [0] * 64
        for _k in range(6):
            coef[rng.randrange(64)] = rng.randrange(-300, 300)
        ours, ref = _idct(coef), ref_idct(coef)
        assert max(abs(a - b) for a, b in zip(ours, ref)) <= 1


# ---------------------------------------------------------------------------
# progressive (SOF2) codec — round 7
# ---------------------------------------------------------------------------


def test_progressive_uniform_blocks_exact():
    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    px = _uniform_blocks(3, 2, 9)
    enc = jpeg_encode_progressive(px, 24, 16, 1)
    assert b"\xff\xc2" in enc  # really SOF2
    assert enc.count(b"\xff\xda") == 4  # DC first/refine + AC first/refine
    assert jpeg_decode(enc) == (24, 16, 1, px)


def test_progressive_matches_baseline_bit_for_bit():
    """Both encoders quantize identically, so both decodes must agree
    byte-for-byte on ANY content — this pins every successive-
    approximation path (DC refine bits, AC significance runs, EOB runs,
    correction bits) against the independently-tested baseline path."""
    import random

    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    rng = random.Random(123)
    for wd, ht, ch in [(8, 8, 1), (24, 24, 1), (17, 11, 3), (32, 24, 3), (7, 5, 1)]:
        px = bytes(rng.randrange(256) for _ in range(wd * ht * ch))
        base = jpeg_decode(jpeg_encode(px, wd, ht, ch))
        prog = jpeg_decode(jpeg_encode_progressive(px, wd, ht, ch))
        assert base == prog, (wd, ht, ch)


def test_progressive_long_eob_runs():
    """An all-uniform multi-block image makes every AC band empty: the
    first AC scan is one EOBn run covering all blocks (n > 0 exercises
    the run-length extension bits), the refine scan likewise."""
    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    px = bytes([130]) * (64 * 64)  # 64 blocks, all uniform
    enc = jpeg_encode_progressive(px, 64, 64, 1)
    assert jpeg_decode(enc) == (64, 64, 1, px)


def test_progressive_sparse_high_freq():
    """One hot pixel per block: sparse AC coefficients surrounded by
    zero runs exercise ZRL paths in both first and refine scans."""
    import random

    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    rng = random.Random(5)
    w = h = 32
    px = bytearray([128]) * 0 or bytearray(bytes([128]) * (w * h))
    for by in range(h // 8):
        for bx in range(w // 8):
            x, y = rng.randrange(8), rng.randrange(8)
            px[(by * 8 + y) * w + bx * 8 + x] = 255
    base = jpeg_decode(jpeg_encode(bytes(px), w, h, 1))
    prog = jpeg_decode(jpeg_encode_progressive(bytes(px), w, h, 1))
    assert base == prog


def test_progressive_rgb_dispatches_via_decode_image():
    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    px = bytes(
        (3 * i + c) % 256 for i in range(16 * 16) for c in range(3)
    )
    w, h, ch, out = decode_image(jpeg_encode_progressive(px, 16, 16, 3))
    assert (w, h, ch) == (16, 16, 3)
    assert out == jpeg_decode(jpeg_encode(px, 16, 16, 3))[3]
