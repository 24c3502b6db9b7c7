"""VP8L (lossless WebP) codec: bit-exact round-trips across every
encoder mode (literal / subtract-green / predictor modes / row
backrefs / color cache / palette incl. sub-byte bundling), container
and corruption handling, and decode_image dispatch."""

import pytest

from xorq_spark.functions.webpcodec import (
    _prefix_encode,
    _prefix_decode,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    webp_decode,
    webp_encode,
)


def _grid(w, h, channels, seed=0):
    """Closed-form pixel grid (the multimodal fixture formula)."""
    out = bytearray(w * h * channels)
    i = 0
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                out[i] = (seed * 7 + 3 * x + 5 * y + 11 * c) % 256
                i += 1
    return bytes(out)


def _roundtrip(w, h, channels, seed=0, **kw):
    src = _grid(w, h, channels, seed)
    payload = webp_encode(src, w, h, channels, **kw)
    dw, dh, dc, rgba = webp_decode(payload)
    assert (dw, dh, dc) == (w, h, 4)
    # compare against RGBA expansion of the source
    for i in range(w * h):
        if channels == 1:
            v = src[i]
            exp = (v, v, v, 255)
        elif channels == 3:
            exp = (*src[3 * i : 3 * i + 3], 255)
        else:
            exp = tuple(src[4 * i : 4 * i + 4])
        got = tuple(rgba[4 * i : 4 * i + 4])
        assert got == exp, f"pixel {i}: {got} != {exp}"
    return payload


def test_roundtrip_literal_rgb():
    _roundtrip(13, 7, 3, seed=1)


def test_roundtrip_literal_gray_and_rgba():
    _roundtrip(8, 8, 1, seed=2)
    _roundtrip(5, 9, 4, seed=3)


def test_roundtrip_subtract_green():
    _roundtrip(11, 6, 3, seed=4, subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    _roundtrip(9, 8, 3, seed=mode, predictor=mode)


def test_roundtrip_predictor_plus_subtract_green():
    _roundtrip(10, 10, 3, seed=5, subtract_green=True, predictor=11)


def test_roundtrip_row_backrefs():
    # repeated rows exercise LZ77 length/distance + the 2-D dist map
    w, h = 16, 12
    row = _grid(w, 1, 3, seed=6)
    src = row * h
    payload = webp_encode(src, w, h, 3, backref_rows=True)
    plain = webp_encode(src, w, h, 3)
    assert len(payload) < len(plain)  # backrefs actually taken
    dw, dh, dc, rgba = webp_decode(payload)
    for i in range(w * h):
        exp = (*row[3 * (i % w) : 3 * (i % w) + 3], 255)
        assert tuple(rgba[4 * i : 4 * i + 4]) == exp


def test_roundtrip_color_cache():
    # few distinct colors -> cache symbols actually fire
    w, h = 12, 10
    src = bytearray()
    for i in range(w * h):
        c = [(10, 20, 30), (200, 100, 0), (1, 2, 3)][i % 3]
        src.extend(c)
    payload = webp_encode(bytes(src), w, h, 3, cache_bits=4)
    dw, dh, dc, rgba = webp_decode(payload)
    for i in range(w * h):
        exp = (*[(10, 20, 30), (200, 100, 0), (1, 2, 3)][i % 3], 255)
        assert tuple(rgba[4 * i : 4 * i + 4]) == exp


def test_roundtrip_palette_unbundled():
    # >16 distinct colors: indices stay one per green byte
    w, h = 10, 6
    src = bytearray()
    for i in range(w * h):
        v = (i * 13) % 20
        src.extend((v * 3, v * 5 % 256, v * 7 % 256))
    payload = webp_encode(bytes(src), w, h, 3, palette=True)
    _, _, _, rgba = webp_decode(payload)
    for i in range(w * h):
        v = (i * 13) % 20
        assert tuple(rgba[4 * i : 4 * i + 4]) == (v * 3, v * 5 % 256, v * 7 % 256, 255)


@pytest.mark.parametrize("ncolors", [2, 4, 16])
def test_roundtrip_palette_bundled(ncolors):
    # <=16 colors: sub-byte index bundling, incl. partial last bundle
    w, h = 11, 5  # 11 not divisible by any bundle width
    src = bytearray()
    for i in range(w * h):
        v = i % ncolors
        src.extend((v * 16 % 256, 255 - v, v))
    payload = webp_encode(bytes(src), w, h, 3, palette=True)
    _, _, _, rgba = webp_decode(payload)
    for i in range(w * h):
        v = i % ncolors
        assert tuple(rgba[4 * i : 4 * i + 4]) == (v * 16 % 256, 255 - v, v, 255)


def test_roundtrip_1x1_and_wide():
    _roundtrip(1, 1, 3, seed=7)
    _roundtrip(64, 1, 3, seed=8)
    _roundtrip(1, 33, 4, seed=9)


def test_prefix_code_roundtrip_exhaustive():
    for v in range(1, 4000):
        code, nb, ev = _prefix_encode(v)
        bw = _BitWriter()
        bw.write(ev, nb)
        br = _BitReader(bw.bytes() + b"\x00")
        assert _prefix_decode(br, code) == v, v


def test_canonical_codes_are_prefix_free():
    lens = [10] * 256 + [4] * 8 + [5] * 8 + [0] * 8
    codes = _canonical_codes(lens)
    seen = set()
    for s, (c, l) in codes.items():
        bits = format(c, f"0{l}b")
        for p in seen:
            assert not bits.startswith(p) and not p.startswith(bits)
        seen.add(bits)


def test_corrupt_container_raises():
    with pytest.raises(ValueError, match="RIFF"):
        webp_decode(b"JUNKJUNKJUNKJUNKJUNKJUNK")
    good = webp_encode(_grid(4, 4, 3), 4, 4, 3)
    with pytest.raises(ValueError, match="signature"):
        webp_decode(good[:20] + b"\x00" + good[21:])


def test_lossy_vp8_gated_by_name():
    import struct

    fake = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="VP8"):
        webp_decode(fake)


def test_decode_image_dispatches_webp():
    from xorq_spark.functions.imagecodec import decode_image

    payload = webp_encode(_grid(6, 4, 3, seed=10), 6, 4, 3)
    w, h, c, px = decode_image(payload)
    assert (w, h, c) == (6, 4, 4)
    # WAV RIFF still gated by name
    import struct

    wav = b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="WAV"):
        decode_image(wav)


# ---------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st


@st.composite
def _images(draw):
    w = draw(st.integers(1, 12))
    h = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([1, 3, 4]))
    px = draw(
        st.binary(min_size=w * h * ch, max_size=w * h * ch)
    )
    return w, h, ch, px


@settings(max_examples=60, deadline=None)
@given(_images(), st.sampled_from(
    [{}, {"subtract_green": True}, {"cache_bits": 3},
     {"backref_rows": True}, {"predictor": 11},
     {"predictor": 12, "subtract_green": True}]
))
def test_roundtrip_random_images_all_modes(img, mode):
    w, h, ch, px = img
    payload = webp_encode(px, w, h, ch, **mode)
    dw, dh, dc, rgba = webp_decode(payload)
    assert (dw, dh, dc) == (w, h, 4)
    for i in range(w * h):
        if ch == 1:
            exp = (px[i], px[i], px[i], 255)
        elif ch == 3:
            exp = (*px[3 * i : 3 * i + 3], 255)
        else:
            exp = tuple(px[4 * i : 4 * i + 4])
        assert tuple(rgba[4 * i : 4 * i + 4]) == exp


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 10), st.integers(1, 8), st.integers(1, 30),
       st.randoms(use_true_random=False))
def test_roundtrip_random_palette_images(w, h, ncolors, rnd):
    colors = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(ncolors)
    ]
    px = bytearray()
    for _ in range(w * h):
        px.extend(colors[rnd.randrange(ncolors)])
    payload = webp_encode(bytes(px), w, h, 3, palette=True)
    _, _, _, rgba = webp_decode(payload)
    for i in range(w * h):
        assert tuple(rgba[4 * i : 4 * i + 3]) == tuple(px[3 * i : 3 * i + 3])


def test_roundtrip_color_transform():
    # cross-channel deltas: g2r/g2b/r2b incl. negative (two's complement)
    _roundtrip(9, 7, 3, seed=11, color_transform=(34, -17, 80))
    _roundtrip(6, 6, 3, seed=12, color_transform=(-128, 127, -1))


def test_roundtrip_color_transform_composes_with_subtract_green():
    _roundtrip(8, 5, 3, seed=13, subtract_green=True,
               color_transform=(25, 50, -75))


@settings(max_examples=25, deadline=None)
@given(_images(), st.tuples(st.integers(-128, 127), st.integers(-128, 127),
                            st.integers(-128, 127)))
def test_roundtrip_random_color_transforms(img, cte):
    w, h, ch, px = img
    payload = webp_encode(px, w, h, ch, color_transform=cte)
    dw, dh, dc, rgba = webp_decode(payload)
    for i in range(w * h):
        if ch == 1:
            exp = (px[i], px[i], px[i], 255)
        elif ch == 3:
            exp = (*px[3 * i : 3 * i + 3], 255)
        else:
            exp = tuple(px[4 * i : 4 * i + 4])
        assert tuple(rgba[4 * i : 4 * i + 4]) == exp


def test_meta_prefix_two_groups_route_correctly():
    """Hand-assemble a VP8L stream with a meta-prefix image splitting an
    8x1 image into two 4-px tiles, each tile with its OWN prefix group
    whose R-tree is a different single-symbol constant — decoding
    proves per-tile group routing."""
    import struct as _struct

    from xorq_spark.functions.webpcodec import (
        _encode_image_stream,
        _g_tree_lengths,
        _argb,
        _write_tree,
    )

    bw = _BitWriter()
    w, h = 8, 1
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    # spatial image: meta-prefix present, huffman_bits = 2 (4-px tiles)
    bw.write(1, 1)
    bw.write(0, 3)  # bits - 2 = 0 -> tile size 4 -> meta is 2x1
    # meta image (entropy-coded, no meta of its own): groups 0 and 1 in
    # (r<<8)|g -> green channel holds the group index
    _encode_image_stream(
        bw, [_argb(255, 0, 0, 0), _argb(255, 0, 1, 0)], 2, 1, False
    )
    bw.write(0, 1)  # no color cache
    # two groups; G tree = complete literal lengths, R tree = a single
    # constant that DIFFERS per group, B/A constants shared
    def write_group(r_const):
        _write_tree(bw, _g_tree_lengths(0))
        # simple single-symbol trees for R/B/A (read zero bits)
        for sym in (r_const, 7, 255):
            bw.write(1, 1)  # simple
            bw.write(0, 1)  # one symbol
            bw.write(1, 1)  # 8-bit
            bw.write(sym, 8)
        # distance tree: single symbol 0
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)

    write_group(11)
    write_group(222)
    # pixel stream: 8 literals, green = x (R/B/A come from group trees)
    from xorq_spark.functions.webpcodec import _canonical_codes

    g_codes = _canonical_codes(_g_tree_lengths(0))
    for x in range(w):
        c, ln = g_codes[x]
        bw.write_code(c, ln)
    data = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + _struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + _struct.pack("<I", len(b"WEBP" + chunk)) + b"WEBP" + chunk

    dw, dh, dc, rgba = webp_decode(payload)
    assert (dw, dh) == (8, 1)
    for x in range(8):
        r, g, b, a = rgba[4 * x : 4 * x + 4]
        assert g == x and b == 7 and a == 255
        assert r == (11 if x < 4 else 222)  # group routing by tile
