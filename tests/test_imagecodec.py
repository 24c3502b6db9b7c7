"""Pure-stdlib PNG codec + real-pixel multimodal operators.

The codec is the round-4 ungating of multimodal decode: every filter
type, color type, and the nearest-neighbor resample are pinned here,
and the Spark-side operators are checked against closed-form pixel
math (the same formulas the DuckDB oracles use in queries/multimodal).
"""

from __future__ import annotations

import hashlib

import pytest

from xorq_spark.functions.imagecodec import (
    decode_image,
    png_decode,
    png_encode,
    resize_nearest,
)


def _grid(w, h, ch, f=lambda x, y, c: (3 * x + 5 * y + 11 * c) % 256):
    return bytes(f(x, y, c) for y in range(h) for x in range(w) for c in range(ch))


class TestPngCodec:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_roundtrip_every_filter(self, filter_type):
        """Each PNG scanline filter must invert exactly — a broken
        Paeth/Average path corrupts pixels silently otherwise."""
        px = _grid(13, 7, 3)
        data = png_encode(px, 13, 7, 3, filter_type=filter_type)
        w, h, ch, out = png_decode(data)
        assert (w, h, ch) == (13, 7, 3)
        assert out == px

    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_color_types(self, channels):
        px = _grid(9, 5, channels)
        w, h, ch, out = png_decode(png_encode(px, 9, 5, channels))
        assert (w, h, ch) == (9, 5, channels)
        assert out == px

    def test_multi_idat_streams_concatenate(self):
        """Decoders must concatenate IDAT chunks before inflating."""
        import struct
        import zlib

        px = _grid(6, 4, 3)
        data = png_encode(px, 6, 4, 3)
        # split the single IDAT into two chunks
        pos = len(b"\x89PNG\r\n\x1a\n")
        out = data[:pos]
        rest = data[pos:]
        while rest:
            (length,) = struct.unpack_from(">I", rest, 0)
            tag = rest[4:8]
            body = rest[8 : 8 + length]
            rest = rest[12 + length :]
            if tag == b"IDAT" and length > 4:
                for part in (body[: length // 2], body[length // 2 :]):
                    out += (
                        struct.pack(">I", len(part))
                        + b"IDAT"
                        + part
                        + struct.pack(">I", zlib.crc32(b"IDAT" + part) & 0xFFFFFFFF)
                    )
            else:
                out += (
                    struct.pack(">I", length)
                    + tag
                    + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
                )
        assert png_decode(bytes(out))[3] == px

    def test_non_png_magic_is_gated(self):
        # JPEG dispatches to the round-6 pure-stdlib decoder; a corrupt
        # stream is a ValueError there, not a codec gate
        with pytest.raises(ValueError, match="JPEG"):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
        # WebP dispatches to the round-6 VP8L decoder; a truncated
        # container is a ValueError there, not a codec gate
        with pytest.raises(ValueError, match="RIFF"):
            decode_image(b"RIFFxxxxWEBP")
        with pytest.raises(NotImplementedError, match="WAV"):
            decode_image(b"RIFFxxxxWAVE" + b"\x00" * 8)
        with pytest.raises(NotImplementedError):
            decode_image(b"\x00\x01\x02\x03")

    def test_corrupt_png_raises_value_error(self):
        data = png_encode(_grid(4, 4, 3), 4, 4, 3)
        with pytest.raises(ValueError):
            png_decode(data[: len(data) // 2])  # truncated
        with pytest.raises(ValueError, match="bit depth|color"):
            # forge a 16-bit-depth IHDR
            import struct
            import zlib

            ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
            forged = (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", len(ihdr))
                + b"IHDR"
                + ihdr
                + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
            )
            png_decode(forged + data[8 + 25 :])

    def test_resize_nearest_matches_closed_form(self):
        """out(x,y,c) must equal src(floor(x*w/ow), floor(y*h/oh), c)."""
        w, h, ch = 10, 6, 3
        px = _grid(w, h, ch)
        ow, oh = 4, 3
        out = resize_nearest(px, w, h, ch, ow, oh)
        for oy in range(oh):
            for ox in range(ow):
                sx, sy = ox * w // ow, oy * h // oh
                for c in range(ch):
                    assert (
                        out[(oy * ow + ox) * ch + c]
                        == px[(sy * w + sx) * ch + c]
                    )

    def test_upscale_also_works(self):
        px = _grid(3, 2, 1)
        out = resize_nearest(px, 3, 2, 1, 6, 4)
        assert len(out) == 24
        assert out[0] == px[0] and out[-1] == px[-1]


class TestSparkPixelOperators:
    def test_decode_image_stats_matches_formula(self, spark):
        """End-to-end through Spark: synth PNG -> real decode -> channel
        sums equal the closed-form grid sums."""
        import pyspark.sql.functions as F

        from xorq_spark.functions.multimodal import (
            decode_image_stats,
            synth_png_assets,
        )

        ids = spark.range(12).select(F.col("id").alias("asset_id"))
        stats = {r["asset_id"]: r for r in decode_image_stats(synth_png_assets(ids)).collect()}
        for i in range(12):
            w, h = 8 + i % 9, 8 + i % 7
            r = stats[i]
            assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
            for c in range(3):
                expect = sum(
                    (i * 7 + 3 * x + 5 * y + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                )
                assert r[f"sum_c{c}"] == expect
            px = bytes(
                (i * 7 + 3 * x + 5 * y + 11 * c) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            assert r["px_sha256"] == hashlib.sha256(px).hexdigest()

    def test_resize_images_decoded_matches_formula(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.multimodal import (
            resize_images_decoded,
            synth_png_assets,
        )

        ids = spark.range(8).select(F.col("id").alias("asset_id"))
        out = {
            r["asset_id"]: r
            for r in resize_images_decoded(synth_png_assets(ids), box=6).collect()
        }
        for i in range(8):
            w, h = 8 + i % 9, 8 + i % 7
            m = max(w, h)
            ow, oh = max(1, w * 6 // m), max(1, h * 6 // m)
            r = out[i]
            assert (r["out_width"], r["out_height"]) == (ow, oh)
            for c in range(3):
                expect = sum(
                    (i * 7 + 3 * (ox * w // ow) + 5 * (oy * h // oh) + 11 * c) % 256
                    for oy in range(oh)
                    for ox in range(ow)
                )
                assert r[f"sum_c{c}"] == expect


class TestCodecProperties:
    """Hypothesis: round-trip identity over arbitrary pixel buffers,
    dims, color types, and filter choices — the PNG spec's whole
    contract in one invariant."""

    def test_roundtrip_random_buffers(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            w=st.integers(1, 24),
            h=st.integers(1, 16),
            ch=st.sampled_from([1, 3, 4]),
            f=st.integers(0, 4),
            data=st.data(),
        )
        def inner(w, h, ch, f, data):
            px = bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=w * h * ch,
                        max_size=w * h * ch,
                    )
                )
            )
            got = png_decode(png_encode(px, w, h, ch, filter_type=f))
            assert got == (w, h, ch, px)

        inner()

    def test_resize_identity_when_same_dims(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(w=st.integers(1, 16), h=st.integers(1, 12))
        def inner(w, h):
            px = _grid(w, h, 3)
            assert resize_nearest(px, w, h, 3, w, h) == px

        inner()
