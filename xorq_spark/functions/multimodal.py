"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

PNG decode is REAL (functions/imagecodec.py — pure-stdlib zlib codec):
decode_image_stats / resize_images_decoded do actual pixel math on
actual PNG bytes, end to end. JPEG/audio/video decode stays honestly
gated behind NotImplementedError (no codec libraries in-container);
for those, the digest-stub variants below certify the Spark plumbing
(schemas, Arrow batch iteration, partitioning) without faking pixels.

Scale notes: binary payloads ride in Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory);
feature extraction is a mapInPandas scan — no shuffle; downstream joins
should carry only the extracted features, never the raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical schema for a multimodal asset column bundle.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _fake_decode_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decoder: a deterministic pseudo-embedding from the payload
    digest. Replace with a real codec (PIL/torchvision/librosa) in a
    container that ships one — the Spark plumbing does not change."""
    if payload is None:
        raise NotImplementedError("real decode requires a media codec; payload missing")
    h = hashlib.sha256(payload).digest()
    return [((h[i] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over asset bundles: iterator of
    Arrow-backed pandas batches in, feature batches out. The iterator
    form never holds more than one batch per worker."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "embedding": pdf["payload"].map(lambda b: _fake_decode_embedding(b, dim)),
                }
            )
            yield out

    return assets.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    The timestamp grid is pure Spark (sequence+explode); the frame decode
    itself is the stubbed part (payload digest stands in for pixels)."""
    grid = assets.filter(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
        "payload",
    )
    return grid.select(
        "asset_id",
        "ts_ms",
        F.sha2(F.concat(F.col("payload"), F.col("ts_ms").cast("string").cast("binary")), 256).alias(
            "frame_digest"
        ),
    )


def make_fake_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests (payload = digest
    bytes of the id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        media = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                media,
                bytearray(payload),
                64 if media == "image" else None,
                64 if media == "image" else None,
                5000 if media != "image" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel path (pure-stdlib PNG codec, functions/imagecodec.py)
# ---------------------------------------------------------------------------

PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
        StructField("px_sha256", StringType()),
    ]
)


def synth_then_stats(ids: DataFrame, synth_batches, stats_batches, schema) -> DataFrame:
    """Run a fixture synth generator and its decode/probe generator as
    ONE Python stage (round 10, guide §4.1/§8): composing the batch
    generators keeps the synthesized payload bytes inside the worker.
    With the chained operators every payload crossed the Arrow boundary
    TWICE (synth out, decode in) and paid a second Python-runner stage
    per task; fused, only id rows enter and stat rows leave. Values are
    identical by construction — the decode generator consumes exactly
    the pandas frames the synth generator yields (pinned by
    tests/test_mm_fused.py). The standalone operators remain the public
    API for real (non-synthesized) asset tables."""

    def fused(it):
        yield from stats_batches(synth_batches(it))

    return ids.mapInPandas(fused, schema)


def synth_png_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic PNG fixture generator: for each id, a real encoded
    PNG whose pixels follow the closed-form grid
    ``channel c at (x, y) = (id*7 + 3x + 5y + 11c) mod 256`` with
    ``width = 8 + id%9`` and ``height = 8 + id%7``. The closed form is
    what makes real decoding CERTIFIABLE: an SQL oracle recomputes the
    expected channel sums from the formula while Spark recovers them
    from the decoded bytes — hash equality proves the codec."""
    from xorq_spark.functions.imagecodec import png_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            widths, heights = [], []
            for i in pdf[id_col].tolist():
                w, h = 8 + i % 9, 8 + i % 7
                px = bytes(
                    (i * 7 + 3 * x + 5 * y + 11 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                payloads.append(png_encode(px, w, h, 3))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return ids.mapInPandas(batches, ASSET_SCHEMA)


def synth_jpeg_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic baseline-JPEG fixture generator: for each id, a
    REAL Huffman+DCT-encoded grayscale JPEG of uniform 8x8 blocks,
    block (bx, by) value = 128 + 2*(((id*5 + 7bx + 11by) mod 53) - 26),
    width = 8*(2 + id%3), height = 8*(2 + id%2). Uniform blocks have
    zero AC energy and an even level-shifted DC, so quantization at the
    Annex-K quality-50 DC step of 16 is EXACT and decode(encode(img))
    reproduces the source grid bit-for-bit — the closed form an SQL
    oracle replays (the lossy-format twist on synth_png_assets)."""
    from xorq_spark.functions.jpegcodec import jpeg_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, widths, heights = [], [], []
            for i in pdf[id_col].tolist():
                bw, bh = 2 + i % 3, 2 + i % 2
                w, h = 8 * bw, 8 * bh
                px = bytearray(w * h)
                for by in range(bh):
                    for bx in range(bw):
                        v = 128 + 2 * (((i * 5 + 7 * bx + 11 * by) % 53) - 26)
                        for yy in range(8):
                            row = (by * 8 + yy) * w + bx * 8
                            px[row : row + 8] = bytes([v]) * 8
                payloads.append(jpeg_encode(bytes(px), w, h, 1, quality=50))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return ids.mapInPandas(batches, ASSET_SCHEMA)


def synth_jpeg_progressive_assets_batches(id_col: str = "asset_id"):
    """Deterministic PROGRESSIVE-JPEG fixture generator (SOF2 streams):
    for each id, a REAL progressive-encoded grayscale JPEG (DC first +
    DC refine + AC first/refine scans with EOB-run coding) of uniform
    8x8 blocks, block (bx, by) value =
    128 + 2*(((id*7 + 5bx + 13by) mod 53) - 26),
    width = 8*(2 + id%4), height = 8*(2 + id%3). Uniform blocks keep
    quantization exact (the synth_jpeg_assets argument), so the decoded
    sums are the same closed form an SQL oracle replays — while the
    stream exercises the successive-approximation decode paths a
    baseline JPEG never touches. (Non-uniform/AC refinement paths are
    pytest-fuzzed against the baseline decoder: tests/test_jpegcodec.py.)"""
    from xorq_spark.functions.jpegcodec import jpeg_encode_progressive

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, widths, heights = [], [], []
            for i in pdf[id_col].tolist():
                bw, bh = 2 + i % 4, 2 + i % 3
                w, h = 8 * bw, 8 * bh
                px = bytearray(w * h)
                for by in range(bh):
                    for bx in range(bw):
                        v = 128 + 2 * (((i * 7 + 5 * bx + 13 * by) % 53) - 26)
                        for yy in range(8):
                            row = (by * 8 + yy) * w + bx * 8
                            px[row : row + 8] = bytes([v]) * 8
                payloads.append(
                    jpeg_encode_progressive(bytes(px), w, h, 1, quality=50)
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return batches


def synth_jpeg_progressive_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_jpeg_progressive_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_jpeg_progressive_assets_batches(id_col), ASSET_SCHEMA)


def synth_webp_assets_batches(id_col: str = "asset_id"):
    """Deterministic lossless-WebP fixture generator: for each id a REAL
    VP8L-encoded RGB image of the closed-form grid
    pixel(x, y, c) = (id*7 + 3x + 5y + 11c) mod 256,
    width = 4 + id%5, height = 4 + id%3. The encoder MODE rotates by
    id%5 — plain literals / subtract-green / whole-image predictor
    (id%14) / color-cache + row-backrefs / cross-channel color
    transform — so the certified decode
    exercises the transform inversion, LZ77 and cache paths, not just
    literal Huffman reads. VP8L is lossless, so the decoded sums are
    the same closed form regardless of mode (functions/webpcodec.py)."""
    from xorq_spark.functions.webpcodec import webp_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, widths, heights = [], [], []
            for i in pdf[id_col].tolist():
                w, h = 4 + i % 5, 4 + i % 3
                px = bytearray(w * h * 3)
                k = 0
                for y in range(h):
                    for x in range(w):
                        for c in range(3):
                            px[k] = (i * 7 + 3 * x + 5 * y + 11 * c) % 256
                            k += 1
                mode = i % 5
                kw = {}
                if mode == 1:
                    kw = {"subtract_green": True}
                elif mode == 2:
                    kw = {"predictor": i % 14}
                elif mode == 3:
                    kw = {"cache_bits": 4, "backref_rows": True}
                elif mode == 4:
                    kw = {"color_transform": (37, -21, 64)}
                payloads.append(webp_encode(bytes(px), w, h, 3, **kw))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return batches


def synth_webp_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_webp_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_webp_assets_batches(id_col), ASSET_SCHEMA)


def _channel_sums(pixels: bytes, channels: int) -> list:
    sums = [0, 0, 0]
    for c in range(min(channels, 3)):
        sums[c] = sum(pixels[c::channels])
    return sums


def decode_image_stats_batches():
    """REAL image decode: parse each payload's PNG stream (inflate,
    unfilter, de-interleave) and emit exact per-channel pixel sums +
    the decoded-buffer digest. Integer outputs keep the oracle compare
    exact — no float tolerance hiding a broken filter path."""
    from xorq_spark.functions.imagecodec import decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, ch, px = decode_image(bytes(payload))
                s = _channel_sums(px, ch)
                rows.append(
                    (
                        aid,
                        w,
                        h,
                        ch,
                        s[0],
                        s[1],
                        s[2],
                        hashlib.sha256(px).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "width",
                    "height",
                    "channels",
                    "sum_c0",
                    "sum_c1",
                    "sum_c2",
                    "px_sha256",
                ],
            )

    return batches


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """See decode_image_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        decode_image_stats_batches(), PIXEL_STATS_SCHEMA
    )


RESIZED_PIXELS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
    ]
)


def resize_images_decoded(assets: DataFrame, box: int = 6) -> DataFrame:
    """REAL resize: decode PNG -> aspect-fit target dims (integer
    product/single division) -> nearest-neighbor resample -> re-encode
    -> decode AGAIN and emit the resized image's channel sums. The
    double round-trip certifies encoder and decoder against each other;
    the nearest-neighbor map (src = floor(out*dim/out_dim)) is integer
    math an SQL oracle reproduces exactly."""
    from xorq_spark.functions.imagecodec import (
        decode_image,
        png_decode,
        png_encode,
        resize_nearest,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, ch, px = decode_image(bytes(payload))
                m = max(w, h)
                ow, oh = max(1, w * box // m), max(1, h * box // m)
                resized = resize_nearest(px, w, h, ch, ow, oh)
                rw, rh, rch, rpx = png_decode(png_encode(resized, ow, oh, ch))
                assert (rw, rh, rch) == (ow, oh, ch) and rpx == resized
                s = _channel_sums(rpx, rch)
                rows.append((aid, ow, oh, s[0], s[1], s[2]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "out_width",
                    "out_height",
                    "sum_c0",
                    "sum_c1",
                    "sum_c2",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, RESIZED_PIXELS_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_digest", StringType()),
    ]
)


def _fit_box(w: int, h: int, box: int) -> tuple:
    """Aspect-preserving fit into a box×box square. Integer-product-
    then-single-division keeps the arithmetic bit-identical across
    engines (no chained float ops near integer boundaries)."""
    m = max(w, h)
    return max(1, int(w * box / m)), max(1, int(h * box / m))


def _fake_resample(payload: bytes, w: int, h: int) -> str:
    """STUB resampler: deterministic digest of (payload, target dims).
    A real implementation decodes with PIL/torchvision and re-encodes;
    this keeps the contract (bytes+dims -> new payload identity)
    testable without codecs."""
    if payload is None:
        raise NotImplementedError("real resize requires a media codec; payload missing")
    return hashlib.sha256(payload + f"{w}x{h}".encode()).hexdigest()


def resize_images(assets: DataFrame, box: int = 64) -> DataFrame:
    """Batch image resize plan: aspect-preserving target dims computed
    JVM-side (exactly reproducible), the resample kernel an
    Arrow-batched mapInPandas pass over the payload bytes — no shuffle,
    scan-speed, payloads never leave the partition. Output carries only
    dims + the resized payload identity; downstream joins never drag
    raw bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "out_width": pdf["out_width"],
                    "out_height": pdf["out_height"],
                    "resized_digest": [
                        _fake_resample(p, w, h)
                        for p, w, h in zip(
                            pdf["payload"], pdf["out_width"], pdf["out_height"]
                        )
                    ],
                }
            )

    m = F.greatest("width", "height")
    with_dims = assets.withColumns(
        {
            "out_width": F.greatest(
                F.lit(1), F.floor(F.col("width") * box / m)
            ).cast("int"),
            "out_height": F.greatest(
                F.lit(1), F.floor(F.col("height") * box / m)
            ).cast("int"),
        }
    )
    return with_dims.select(
        "asset_id", "payload", "out_width", "out_height"
    ).mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("sum_sq", LongType()),
        StructField("n_zero_cross", LongType()),
        StructField("pcm_sha256", StringType()),
    ]
)


def synth_wav_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic WAV fixture generator: for each id, a real PCM
    16-bit WAV whose interleaved samples follow the closed form
    ``s(id, n) = ((id*31 + 11*n) mod 4001) - 2000`` with
    ``frames = 64 + id%33``, ``channels = 1 + id%2`` and
    ``rate = 8000 + (id%3)*4000``. Same certification trick as
    synth_png_assets: the SQL oracle recomputes sums/energy/zero
    crossings from the formula while Spark recovers them from the
    DECODED bytes — a broken RIFF walk or PCM unpack cannot
    hash-match."""
    from xorq_spark.functions.audiocodec import wav_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, rates, durs = [], [], []
            for i in pdf[id_col].tolist():
                ch = 1 + i % 2
                frames = 64 + i % 33
                rate = 8000 + (i % 3) * 4000
                n = frames * ch
                samples = [((i * 31 + 11 * k) % 4001) - 2000 for k in range(n)]
                payloads.append(wav_encode(samples, rate, ch, 2))
                rates.append(rate)
                durs.append(frames * 1000 // rate)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": payloads,
                    "width": pd.array([None] * len(payloads), dtype="Int32"),
                    "height": pd.array([None] * len(payloads), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                }
            )

    return ids.mapInPandas(batches, ASSET_SCHEMA)


def synth_flac_assets_batches(id_col: str = "asset_id"):
    """Deterministic FLAC fixture generator: the SAME closed-form
    signal as synth_wav_assets (``s(id, n) = ((id*31 + 11*n) mod 4001)
    - 2000``, ``frames = 64 + id%33``, ``channels = 1 + id%2``,
    ``rate = 8000 + (id%3)*4000``) but genuinely FLAC-COMPRESSED by the
    committed encoder (functions/flaccodec.py), with the decoder's
    paths exercised on schedule: stereo ids rotate left/side /
    right/side / mid/side / independent decorrelation, id%8>=6 uses
    LPC subframes, id%5==0 uses RICE2 residuals, and the 32-sample
    blocksize forces multi-frame streams with a partial last frame.
    Lossless means the WAV oracle replays features unchanged — a Rice
    slip, a CRC bug, or a broken decorrelation cannot hash-match."""
    from xorq_spark.functions.flaccodec import flac_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, durs = [], []
            for i in pdf[id_col].tolist():
                ch = 1 + i % 2
                frames = 64 + i % 33
                rate = 8000 + (i % 3) * 4000
                n = frames * ch
                samples = [((i * 31 + 11 * k) % 4001) - 2000 for k in range(n)]
                mode = (
                    ["independent", "left_side", "right_side", "mid_side"][
                        i % 4
                    ]
                    if ch == 2
                    else "independent"
                )
                payloads.append(
                    flac_encode(
                        samples,
                        rate,
                        ch,
                        blocksize=32,
                        stereo_mode=mode,
                        use_lpc=(i % 8 >= 6),
                        rice2=(i % 5 == 0),
                    )
                )
                durs.append(frames * 1000 // rate)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": payloads,
                    "width": pd.array([None] * len(payloads), dtype="Int32"),
                    "height": pd.array([None] * len(payloads), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                }
            )

    return batches


def synth_flac_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_flac_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_flac_assets_batches(id_col), ASSET_SCHEMA)


def decode_audio_stats_batches():
    """REAL audio decode: walk each payload's RIFF chunks, unpack PCM,
    and emit integer-exact DSP features (sum, energy, zero crossings)
    plus the raw-PCM digest. Arrow-batched mapInPandas, no shuffle —
    scan-speed over any corpus of audio blobs."""
    from xorq_spark.functions.audiocodec import audio_features, decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, ch, sw, samples = decode_audio(bytes(payload))
                f = audio_features(samples)
                import struct as _struct

                pcm = _struct.pack("<%dh" % len(samples), *samples)
                rows.append(
                    (
                        aid,
                        rate,
                        ch,
                        f["n_samples"],
                        f["sum_samples"],
                        f["sum_sq"],
                        f["n_zero_cross"],
                        hashlib.sha256(pcm).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "sample_rate",
                    "channels",
                    "n_samples",
                    "sum_samples",
                    "sum_sq",
                    "n_zero_cross",
                    "pcm_sha256",
                ],
            )

    return batches


def decode_audio_stats(assets: DataFrame) -> DataFrame:
    """See decode_audio_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        decode_audio_stats_batches(), AUDIO_STATS_SCHEMA
    )


RESAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_samples", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def resample_audio_stats(assets: DataFrame, rate_out: int = 16000) -> DataFrame:
    """REAL decode -> RESAMPLE -> feature chain: each payload (WAV or
    FLAC — decode_audio dispatches) is decoded, linearly resampled to
    `rate_out` with the integer-exact kernel
    (audiocodec.resample_linear), and reduced to integer DSP features.
    Arrow-batched mapInPandas, no shuffle — the one-rate normalization
    every training-audio pipeline runs before featurization."""
    from xorq_spark.functions.audiocodec import decode_audio, resample_linear

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, ch, _sw, samples = decode_audio(bytes(payload))
                out = resample_linear(samples, ch, rate, rate_out)
                rows.append(
                    (
                        aid,
                        rate_out,
                        ch,
                        len(out),
                        sum(out),
                        sum(v * v for v in out),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "sample_rate",
                    "channels",
                    "n_samples",
                    "sum_samples",
                    "sum_sq",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, RESAMPLE_STATS_SCHEMA
    )


SEGMENT_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_active", LongType()),
        StructField("n_segments", LongType()),
        StructField("max_run", LongType()),
    ]
)


def audio_segment_stats(assets: DataFrame, frame_len: int = 16) -> DataFrame:
    """REAL decode -> SEGMENT chain: each payload decodes (WAV or FLAC)
    and runs the VAD-style energy segmentation
    (audiocodec.energy_segments) — active-frame counts, segment count,
    longest run. Arrow-batched mapInPandas, no shuffle."""
    from xorq_spark.functions.audiocodec import decode_audio, energy_segments

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _rate, ch, _sw, samples = decode_audio(bytes(payload))
                g = energy_segments(samples, ch, frame_len)
                rows.append(
                    (
                        aid,
                        g["n_frames"],
                        g["n_active"],
                        g["n_segments"],
                        g["max_run"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "n_frames",
                    "n_active",
                    "n_segments",
                    "max_run",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, SEGMENT_STATS_SCHEMA
    )


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_b", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_r", LongType()),
    ]
)


def synth_avi_assets_batches(id_col: str = "asset_id"):
    """Deterministic AVI fixture generator: real uncompressed-DIB AVI
    files whose pixel at storage (x, y), channel c (B,G,R), frame f is
    ``(id*13 + 7f + 3x + 5y + 17c) mod 256`` with ``width = 4+id%5``
    (odd widths exercise DIB row padding), ``height = 3+id%4`` and
    ``frames = 2+id%3``. Closed form → SQL-recomputable → the decoder
    is certifiable frame by frame."""
    from xorq_spark.functions.audiocodec import avi_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, ws, hs, durs = [], [], [], []
            for i in pdf[id_col].tolist():
                w, h, nf = 4 + i % 5, 3 + i % 4, 2 + i % 3
                stride = w * 3 + ((-(w * 3)) % 4)
                frames = []
                for f in range(nf):
                    buf = bytearray(stride * h)
                    for y in range(h):
                        for x in range(w):
                            for c in range(3):
                                buf[y * stride + x * 3 + c] = (
                                    i * 13 + 7 * f + 3 * x + 5 * y + 17 * c
                                ) % 256
                    frames.append(bytes(buf))
                payloads.append(avi_encode(frames, w, h, fps=10))
                ws.append(w)
                hs.append(h)
                durs.append(nf * 100)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "video",
                    "payload": payloads,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                }
            )

    return batches


def synth_avi_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_avi_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_avi_assets_batches(id_col), ASSET_SCHEMA)


def decode_video_stats_batches():
    """REAL video decode: walk the AVI RIFF tree, pull each
    uncompressed DIB frame, emit one row per frame with integer-exact
    per-channel pixel sums (padding excluded). Arrow-batched
    mapInPandas — the per-frame explode happens Python-side inside the
    batch, so the Spark shape is the standard frame-sampling pipeline."""
    from xorq_spark.functions.audiocodec import decode_video, frame_pixel_sums

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, _fps, frames = decode_video(bytes(payload))
                for fi, fr in enumerate(frames):
                    sb, sg, sr = frame_pixel_sums(fr, w, h)
                    rows.append((aid, fi, w, h, sb, sg, sr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_idx", "width", "height",
                    "sum_b", "sum_g", "sum_r",
                ],
            )

    return batches


def decode_video_stats(assets: DataFrame) -> DataFrame:
    """See decode_video_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        decode_video_stats_batches(), VIDEO_STATS_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("h_lo", LongType()),
        StructField("h_hi", LongType()),
    ]
)


def image_dhash_batches():
    """Perceptual difference-hash over REAL decoded pixels: integer
    luma ((299r + 587g + 114b) // 1000), nearest-neighbor sample onto
    the canonical 9×8 dHash grid (sx = x·w//9, sy = y·h//8 — the same
    integer NN map the certified resize uses), bit b=y·8+x set when
    gray(x,y) < gray(x+1,y) strictly. Packed as two 32-bit words
    (h_lo = bits 0..31, h_hi = bits 32..63) so every value stays
    positive int64 on any engine. All-integer: bit-identical
    everywhere, SQL-replayable."""
    from xorq_spark.functions.imagecodec import decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, ch, px = decode_image(bytes(payload))
                a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                if ch >= 3:
                    gray = (
                        a[:, :, 0].astype(np.int64) * 299
                        + a[:, :, 1].astype(np.int64) * 587
                        + a[:, :, 2].astype(np.int64) * 114
                    ) // 1000
                else:
                    gray = a[:, :, 0].astype(np.int64)
                sx = (np.arange(9) * w) // 9
                sy = (np.arange(8) * h) // 8
                g = gray[np.ix_(sy, sx)]
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64)  # 8x8
                flat = bits.reshape(-1)  # b = y*8 + x
                lo = int((flat[:32] << np.arange(32, dtype=np.int64)).sum())
                hi = int((flat[32:] << np.arange(32, dtype=np.int64)).sum())
                rows.append((aid, lo, hi))
            yield pd.DataFrame(rows, columns=["asset_id", "h_lo", "h_hi"])

    return batches


def image_dhash(assets: DataFrame) -> DataFrame:
    """See image_dhash_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        image_dhash_batches(), DHASH_SCHEMA
    )


def image_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    id_col: str = "asset_id",
) -> DataFrame:
    """Near-duplicate IMAGE pairs from dHashes: 16-bit band blocking
    (pigeonhole: hamming <= 3·bands_missed guarantees a shared band at
    small distances; larger thresholds trade recall like any LSH),
    then EXACT hamming verification via xor + bit_count. Returns
    (id_a, id_b, hamming).

    Scale: the classic two-phase shape — candidates from 4 band-keyed
    equi-joins (shuffle carries 16-bit keys + ids only), verification
    is two xors per candidate. Never all-pairs."""
    b = hashes.select(
        F.col(id_col).alias("id"),
        "h_lo",
        "h_hi",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("h_lo") % 65536).alias("key")),
                F.struct(F.lit(1).alias("band"), (F.col("h_lo") / 65536).cast("long").alias("key")),
                F.struct(F.lit(2).alias("band"), (F.col("h_hi") % 65536).alias("key")),
                F.struct(F.lit(3).alias("band"), (F.col("h_hi") / 65536).cast("long").alias("key")),
            )
        ).alias("bk"),
    ).select("id", "h_lo", "h_hi", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h_lo").alias("la"),
            F.col("a.h_hi").alias("ha"),
            F.col("b.h_lo").alias("lb"),
            F.col("b.h_hi").alias("hb"),
        )
        .distinct()
    )
    ham = (
        F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
        + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    )
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def synth_png_pairs_batches(id_col: str = "asset_id"):
    """Near-duplicate PNG pair generator: assets 2k and 2k+1 share the
    closed-form pixel grid of base=k (same dims), with the ODD asset
    perturbed at source pixel (0,0), channel 0, by +37 mod 256 — a
    small localized edit, the image analog of a one-word text change.
    Closed-form (including the perturbation) → the dHash pipeline is
    SQL-replayable end to end."""
    from xorq_spark.functions.imagecodec import png_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, ws, hs = [], [], []
            for i in pdf[id_col].tolist():
                base, odd = i // 2, i % 2
                w, h = 8 + base % 9, 8 + base % 7
                cx, cy = 3 + base % 11, 5 + base % 13
                px = bytearray(
                    (base * 7 + cx * x * x + cy * y * y + x * y + 11 * c)
                    % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                if odd:
                    px[0] = (px[0] + 37) % 256
                payloads.append(png_encode(bytes(px), w, h, 3))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return batches


def synth_png_pairs(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_png_pairs_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_png_pairs_batches(id_col), ASSET_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("fp", LongType()),
    ]
)


def synth_wav_pairs(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Near-duplicate WAV pair generator: assets 2k and 2k+1 share
    base=k's closed-form samples ``((base*31 + 11k + base*k) mod 4001)
    - 2000`` (base-keyed so unrelated clips fingerprint apart); the
    ODD asset perturbs sample 0 by +150 — a click at the start, the
    audio analog of a one-pixel edit."""
    from xorq_spark.functions.audiocodec import wav_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, durs = [], []
            for i in pdf[id_col].tolist():
                base, odd = i // 2, i % 2
                n = 256 + base % 65
                samples = [
                    ((base * 31 + 11 * k + base * k) % 4001) - 2000
                    for k in range(n)
                ]
                if odd:
                    samples[0] += 150
                payloads.append(wav_encode(samples, 8000, 1, 2))
                durs.append(n * 1000 // 8000)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": payloads,
                    "width": pd.array([None] * len(payloads), dtype="Int32"),
                    "height": pd.array([None] * len(payloads), dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                }
            )

    return ids.mapInPandas(batches, ASSET_SCHEMA)


def audio_fingerprint(assets: DataFrame, n_frames: int = 32) -> DataFrame:
    """Acoustic fingerprint over REAL decoded samples — the audio
    analog of image_dhash: balanced-partition the stream into
    `n_frames` frames (frame(k) = k·n_frames // n, the SQL-replayable
    integer map), exact int64 energy per frame, bit i set when
    e_i < e_{i+1} strictly. n_frames-1 gradient bits in ONE positive
    int64 word; robust to level-preserving edits, all-integer,
    engine-reproducible."""
    from xorq_spark.functions.audiocodec import decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _r, _c, _w, samples = decode_audio(bytes(payload))
                s = np.asarray(samples, dtype=np.int64)
                n = len(s)
                e = np.zeros(n_frames, dtype=np.int64)
                if n:
                    fr = (np.arange(n) * n_frames) // n
                    np.add.at(e, fr, s * s)
                bits = (e[:-1] < e[1:]).astype(np.int64)
                fp = int((bits << np.arange(n_frames - 1, dtype=np.int64)).sum())
                rows.append((aid, fp))
            yield pd.DataFrame(rows, columns=["asset_id", "fp"])

    return assets.select("asset_id", "payload").mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


def audio_neardup_pairs(
    fps: DataFrame, max_hamming: int = 4, id_col: str = "asset_id"
) -> DataFrame:
    """Near-duplicate audio pairs: 16-bit band blocking over the
    fingerprint word, exact xor/bit_count Hamming verify — the same
    two-phase shape as image_neardup_pairs."""
    b = fps.select(
        F.col(id_col).alias("id"),
        "fp",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("fp") % 65536).alias("key")),
                F.struct(F.lit(1).alias("band"), (F.col("fp") / 65536).cast("long").alias("key")),
            )
        ).alias("bk"),
    ).select("id", "fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def synth_gif_assets_batches(id_col: str = "asset_id"):
    """Deterministic animated-GIF fixture generator: for each id a REAL
    LZW-compressed GIF89a (functions/gifcodec.py) of
    width = 5 + id%6, height = 4 + id%5, n_frames = 2 + id%2, palette
    size np = 4 + id%5 with palette[i] = ((17i + id) % 256,
    (29i + 2id) % 256, (43i + 3id) % 256); frame f's index at (x, y) is
    (id*3 + x + 2*y + f) mod np. Odd ids encode INTERLACED, so the
    four-pass row de-shuffle is on the certified path; every frame is
    full-canvas with disposal 'leave in place', so the composed last
    frame is the closed form an SQL oracle replays."""
    from xorq_spark.functions.gifcodec import gif_encode_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, widths, heights = [], [], []
            for i in pdf[id_col].tolist():
                w, h = 5 + i % 6, 4 + i % 5
                np_ = 4 + i % 5
                pal = [
                    ((17 * p + i) % 256, (29 * p + 2 * i) % 256,
                     (43 * p + 3 * i) % 256)
                    for p in range(np_)
                ]
                frames = [
                    [
                        (i * 3 + x + 2 * y + f) % np_
                        for y in range(h)
                        for x in range(w)
                    ]
                    for f in range(2 + i % 2)
                ]
                payloads.append(
                    gif_encode_frames(
                        frames, w, h, pal, interlace=(i % 2 == 1)
                    )
                )
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array([None] * len(payloads), dtype="Int32"),
                }
            )

    return batches


def synth_gif_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_gif_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_gif_assets_batches(id_col), ASSET_SCHEMA)


GIF_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
    ]
)


def decode_gif_stats_batches():
    """REAL animated-GIF decode: parse each payload (LZW, interlace,
    multi-frame canvas composition) and emit the frame count plus exact
    per-channel pixel sums of the LAST composed frame."""
    from xorq_spark.functions.gifcodec import gif_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, frames = gif_decode(bytes(payload))
                s = _channel_sums(frames[-1], 3)
                rows.append((aid, w, h, len(frames), s[0], s[1], s[2]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "n_frames",
                    "sum_c0", "sum_c1", "sum_c2",
                ],
            )

    return batches


def decode_gif_stats(assets: DataFrame) -> DataFrame:
    """See decode_gif_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        decode_gif_stats_batches(), GIF_STATS_SCHEMA
    )


MP3_PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("has_xing", BooleanType()),
        StructField("xing_frames", LongType()),
        StructField("bitrate_min_kbps", IntegerType()),
        StructField("bitrate_max_kbps", IntegerType()),
        StructField("is_vbr", BooleanType()),
        StructField("duration_ms", LongType()),
        StructField("sum_part23", LongType()),
        StructField("n_short_granules", LongType()),
        StructField("n_crc_frames", LongType()),
    ]
)


ASSET_MIN_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def synth_mp3_assets_batches(id_col: str = "asset_id"):
    """Deterministic MP3 fixture generator (functions/mp3probe.py
    mp3_write_stream): per asset_id i — rate cycles 44100/48000/32000
    (i%3), channels 1+i%2, 40+i%17 audio frames; i%4==0 streams are
    VBR (bitrate index 1+(i+3k)%14 per frame) with a Xing tag frame,
    others CBR at index 1+i%14; i%6==0 streams carry real CRC-16 on
    every frame; i%5==0 get an ID3v2 prefix (50+i%100 junk bytes) and
    i%7==0 the 128-byte ID3v1 trailer; padding bit (i+k)%3==0.
    Side-info fields are closed-form in (i, k, gr, ch) so the oracle
    replays every probed value arithmetically."""
    from xorq_spark.functions.mp3probe import BITRATES_KBPS, mp3_write_stream

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                rate = (44100, 48000, 32000)[i % 3]
                ch = 1 + i % 2
                n = 40 + i % 17
                vbr = i % 4 == 0
                frames = []
                for k in range(n):
                    idx = 1 + ((i + 3 * k) % 14) if vbr else 1 + (i % 14)
                    grans = [
                        [
                            {
                                "part23": (i * 7 + k * 13 + gr * 5 + c * 3)
                                % 4096,
                                "big_values": (i + k) % 288,
                                "global_gain": (i + 2 * k) % 256,
                                "scalefac_compress": k % 16,
                                "short": (i + k + 2 * gr + c) % 5 == 0,
                            }
                            for c in range(ch)
                        ]
                        for gr in range(2)
                    ]
                    frames.append(
                        {
                            "bitrate_kbps": BITRATES_KBPS[idx],
                            "padding": 1 if (i + k) % 3 == 0 else 0,
                            "granules": grans,
                        }
                    )
                payloads.append(
                    mp3_write_stream(
                        frames,
                        rate,
                        ch,
                        crc=(i % 6 == 0),
                        xing_frames=n if vbr else None,
                        id3v2_junk=(50 + i % 100) if i % 5 == 0 else 0,
                        id3v1=(i % 7 == 0),
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    return batches


def synth_mp3_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_mp3_assets_batches — one Python stage over the ids."""
    return ids.select(F.col(id_col)).mapInPandas(
        synth_mp3_assets_batches(id_col), ASSET_MIN_SCHEMA
    )


def probe_mp3_stats_batches():
    """REAL MP3 stream audit (functions/mp3probe.py mp3_probe): walk
    frames, parse side info, verify CRC-16, read Xing/ID3 tags; emit
    the corpus-audit profile. Arrow-batched mapInPandas, no shuffle."""
    from xorq_spark.functions.mp3probe import mp3_probe

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                r = mp3_probe(bytes(payload))
                rows.append(
                    (
                        aid,
                        r["sample_rate"],
                        r["channels"],
                        r["n_frames"],
                        r["has_xing"],
                        r["xing_frames"],
                        r["bitrate_min_kbps"],
                        r["bitrate_max_kbps"],
                        r["is_vbr"],
                        r["duration_ms"],
                        r["sum_part23"],
                        r["n_short_granules"],
                        r["n_crc_frames"],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MP3_PROBE_SCHEMA])

    return batches


def probe_mp3_stats(assets: DataFrame) -> DataFrame:
    """See probe_mp3_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        probe_mp3_stats_batches(), MP3_PROBE_SCHEMA
    )


MJPEG_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_pixels", LongType()),
    ]
)


def synth_mjpeg_assets_batches(id_col: str = "asset_id"):
    """Deterministic MJPEG-AVI fixture generator: per asset i, an AVI
    (fourcc MJPG) of 3+i%4 REAL baseline-JPEG frames built by the
    committed encoder, each frame the DC-exact uniform-block grid of
    synth_jpeg_assets with per-frame drift — block (bx, by) of frame k
    is 128 + 2*(((i*5 + 3k + 7bx + 11by) mod 53) - 26), so quality-50
    quantization is exact and the oracle replays every decoded pixel
    sum in closed form. width 8*(2+i%3), height 8*(2+i%2)."""
    from xorq_spark.functions.audiocodec import avi_encode_mjpeg
    from xorq_spark.functions.jpegcodec import jpeg_encode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, widths, heights = [], [], []
            for i in pdf[id_col].tolist():
                bw, bh = 2 + i % 3, 2 + i % 2
                w, h = 8 * bw, 8 * bh
                nf = 3 + i % 4
                jf = []
                for k in range(nf):
                    px = bytearray(w * h)
                    for by in range(bh):
                        for bx in range(bw):
                            v = 128 + 2 * (
                                ((i * 5 + 3 * k + 7 * bx + 11 * by) % 53) - 26
                            )
                            for yy in range(8):
                                row = (by * 8 + yy) * w + bx * 8
                                px[row : row + 8] = bytes([v]) * 8
                    jf.append(jpeg_encode(bytes(px), w, h, 1, quality=50))
                payloads.append(avi_encode_mjpeg(jf, w, h, fps=10))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "video",
                    "payload": payloads,
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "duration_ms": pd.array(
                        [None] * len(payloads), dtype="Int32"
                    ),
                }
            )

    return batches


def synth_mjpeg_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_mjpeg_assets_batches — one Python stage over the id frame."""
    return ids.mapInPandas(synth_mjpeg_assets_batches(id_col), ASSET_SCHEMA)


def decode_mjpeg_frame_stats_batches():
    """REAL compressed-video decode: walk the MJPG AVI container,
    Huffman+DCT-decode every JPEG frame (functions/jpegcodec.py), emit
    one row per frame with its integer-exact pixel sum. Arrow-batched
    mapInPandas, no shuffle."""
    from xorq_spark.functions.audiocodec import decode_video_mjpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _w, _h, _fps, frames = decode_video_mjpeg(bytes(payload))
                for k, (fw, fh, _ch, pix) in enumerate(frames):
                    rows.append((aid, k, fw, fh, sum(pix)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MJPEG_FRAME_SCHEMA]
            )

    return batches


def decode_mjpeg_frame_stats(assets: DataFrame) -> DataFrame:
    """See decode_mjpeg_frame_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        decode_mjpeg_frame_stats_batches(), MJPEG_FRAME_SCHEMA
    )


PDF_TEXT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_pages", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("n_lines", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def synth_pdf_assets_batches(id_col: str = "asset_id"):
    """Deterministic PDF fixture generator (functions/pdfcodec.py
    pdf_write): per asset i — 1+i%4 pages, page p carries 1+(i+p)%3
    text lines of closed-form content (every fifth line adds a
    parens+backslash suffix to exercise literal-string escaping);
    even assets Flate-compress their content streams; i%5==0 assets
    get a real INCREMENTAL UPDATE section appending one page (the
    /Prev xref chain of edited PDFs)."""
    from xorq_spark.functions.pdfcodec import pdf_write

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                np_ = 1 + i % 4
                pages = []
                for p in range(np_):
                    lines = []
                    for l in range(1 + (i + p) % 3):
                        line = (
                            f"Doc {i} page {p} line {l} "
                            f"token{(i*7 + p*3 + l) % 100}"
                        )
                        if (i + p + l) % 5 == 0:
                            line += " (q\\e)"
                        lines.append(line)
                    pages.append(lines)
                payloads.append(
                    pdf_write(
                        pages,
                        compress=(i % 2 == 0),
                        incremental_extra_page=(
                            [f"Appendix {i}"] if i % 5 == 0 else None
                        ),
                    )
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "document",
                    "payload": payloads,
                }
            )

    return batches


def synth_pdf_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """See synth_pdf_assets_batches — one Python stage over the ids."""
    return ids.select(F.col(id_col)).mapInPandas(
        synth_pdf_assets_batches(id_col), ASSET_MIN_SCHEMA
    )


def extract_pdf_text_stats_batches():
    """REAL PDF text extraction (functions/pdfcodec.py): xref walk
    (incl. /Prev chains), page tree, Flate-decoded content streams,
    BT/ET text operators — emit page/char/line counts and the md5 of
    the extracted text. Arrow-batched mapInPandas, no shuffle."""
    from xorq_spark.functions.pdfcodec import pdf_extract

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_pages, text, _info = pdf_extract(bytes(payload))
                rows.append(
                    (
                        aid,
                        n_pages,
                        len(text),
                        sum(1 for ln in text.split("\n") if ln),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PDF_TEXT_SCHEMA])

    return batches


def extract_pdf_text_stats(assets: DataFrame) -> DataFrame:
    """See extract_pdf_text_stats_batches — one Python stage over the payloads."""
    return assets.select("asset_id", "payload").mapInPandas(
        extract_pdf_text_stats_batches(), PDF_TEXT_SCHEMA
    )


DOCX_TEXT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_paras", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("n_lines", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def synth_docx_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic DOCX fixture generator (functions/docxcodec.py
    docx_write): per asset i — 1+i%4 body paragraphs, paragraph p
    carries 1+(i+p)%3 runs of closed-form content (every fifth
    paragraph appends a run with `&`, `<`, `>` and an embedded TAB to
    exercise entity escaping and w:tab splitting); i%4==0 assets get a
    trailing 2x2 table."""
    from xorq_spark.functions.docxcodec import docx_write

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                paras = []
                for p in range(1 + i % 4):
                    runs = [
                        f"w{(i*7 + p*3 + r) % 100} "
                        for r in range(1 + (i + p) % 3)
                    ]
                    if (i + p) % 5 == 0:
                        runs.append(f"A&B <q>\te{p}")
                    paras.append(runs)
                table = (
                    [
                        [f"T{i}r{r}c{c}" for c in range(2)]
                        for r in range(2)
                    ]
                    if i % 4 == 0
                    else None
                )
                payloads.append(docx_write(paras, table=table))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "document",
                    "payload": payloads,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(batches, schema)


def extract_docx_text_stats(assets: DataFrame) -> DataFrame:
    """REAL DOCX text extraction (functions/docxcodec.py): OPC zip
    walk, ElementTree parse of word/document.xml, document-order
    paragraph + table walk with w:tab/w:br handling — emit body
    paragraph count, char/line counts and the md5 of the extracted
    text. Arrow-batched mapInPandas, no shuffle."""
    from xorq_spark.functions.docxcodec import docx_extract

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_paras, text = docx_extract(bytes(payload))
                rows.append(
                    (
                        aid,
                        n_paras,
                        len(text),
                        text.count("\n"),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DOCX_TEXT_SCHEMA]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, DOCX_TEXT_SCHEMA
    )


EPUB_TEXT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_chapters", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("n_lines", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def synth_epub_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic EPUB fixture generator (functions/epubcodec.py
    epub_write): per asset i — 1+i%3 chapters, chapter c carries
    1+(i+c)%3 paragraphs of closed-form content (every fourth
    paragraph appends `&x<y` for entity coverage; the final token of
    every paragraph is <em>-wrapped to exercise nested-inline
    flattening). ODD assets get a REVERSED spine, so an extractor
    that walks zip order instead of spine order cannot hash-match."""
    from xorq_spark.functions.epubcodec import epub_write

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                nch = 1 + i % 3
                chapters = []
                for c in range(nch):
                    paras = []
                    for q in range(1 + (i + c) % 3):
                        ptext = (
                            f"Ch {c} of {i} para {q} "
                            f"tok{(i*5 + c*3 + q) % 50}"
                        )
                        if (i + c + q) % 4 == 0:
                            ptext += " &x<y"
                        paras.append(ptext)
                    chapters.append(paras)
                spine = (
                    list(range(nch - 1, -1, -1))
                    if i % 2 == 1
                    else list(range(nch))
                )
                payloads.append(
                    epub_write(chapters, spine_order=spine, em_token=True)
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "document",
                    "payload": payloads,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(batches, schema)


def extract_epub_text_stats(assets: DataFrame) -> DataFrame:
    """REAL EPUB text extraction (functions/epubcodec.py): OCF
    mimetype check, container.xml -> OPF rootfile, manifest/spine
    walk, XHTML chapter parse in SPINE order — emit chapter count,
    char/line counts and the md5 of the extracted text. Arrow-batched
    mapInPandas, no shuffle."""
    from xorq_spark.functions.epubcodec import epub_extract

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_ch, text = epub_extract(bytes(payload))
                rows.append(
                    (
                        aid,
                        n_ch,
                        len(text),
                        text.count("\n"),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EPUB_TEXT_SCHEMA]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, EPUB_TEXT_SCHEMA
    )


RTF_TEXT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_paras", IntegerType()),
        StructField("n_chars", LongType()),
        StructField("n_lines", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def synth_rtf_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic RTF fixture generator (functions/rtfcodec.py
    rtf_write): per asset i — 1+i%4 paragraphs of closed-form content;
    every fourth paragraph appends literal braces, a backslash and an
    e-acute (escaped-literal + cp1252 ``\\'hh`` coverage); every fifth
    appends U+03C0 (the ``\\uN?`` Unicode-escape path, pi being
    outside cp1252)."""
    from xorq_spark.functions.rtfcodec import rtf_write

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf[id_col].tolist():
                paras = []
                for q in range(1 + i % 4):
                    ptext = f"Rtf {i} para {q} tok{(i*3 + q) % 40}"
                    if (i + q) % 4 == 0:
                        ptext += " {b}\\" + chr(233)
                    if (i + q) % 5 == 0:
                        ptext += chr(960)
                    paras.append(ptext)
                payloads.append(rtf_write(paras))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": "document",
                    "payload": payloads,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(batches, schema)


def extract_rtf_text_stats(assets: DataFrame) -> DataFrame:
    """REAL RTF text extraction (functions/rtfcodec.py): group-stack
    tokenizer, destination skipping, cp1252/Unicode escapes — emit
    paragraph count, char/line counts and the md5 of the extracted
    text. Arrow-batched mapInPandas, no shuffle."""
    from xorq_spark.functions.rtfcodec import rtf_extract

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_paras, text = rtf_extract(bytes(payload))
                rows.append(
                    (
                        aid,
                        n_paras,
                        len(text),
                        text.count("\n"),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RTF_TEXT_SCHEMA]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        batches, RTF_TEXT_SCHEMA
    )
