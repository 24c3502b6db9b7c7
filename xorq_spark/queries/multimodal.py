"""Multimodal queries. Two tiers:

1. REAL pixel math (round 4): mm_decode_png_stats / mm_resize_decoded
   encode genuine PNG payloads (pure-stdlib codec,
   functions/imagecodec.py), decode them — inflate, unfilter,
   de-interleave — inside Arrow-batched mapInPandas, and emit exact
   integer channel sums. The pixels follow a closed-form grid, so the
   DuckDB oracle recomputes the expected sums from the formula while
   Spark recovers them from the decoded bytes: hash equality certifies
   the codec and the pipeline end to end.
2. Plumbing with stub digests: formats with no in-container codec
   (JPEG/audio/video) keep deterministic digest kernels so the Spark
   plumbing — binary columns, schema contracts, frame-grid explode —
   stays oracle-checked without faking pixels.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions.multimodal import extract_features
from xorq_spark.queries.base import query, t, widen


def _fixture_ids(spark, sf_dir, bound: int, npar: int = None):
    """Asset-id frame for the codec fixture queries, rebalanced to a
    FEW compute partitions (not cluster width): the codec work is a
    (now fused, round 10) Python stage, and at this asset count the
    per-task Python-runner round-trips of a 32-way layout cost more
    than the codec work itself — round-9 npar sweep at sf0.1:
    progressive JPEG 0.82s serial / 0.54s 8-way / 0.90s 32-way; FLAC
    0.37 / 0.45 / 0.83. After the round-10 DCT vectorization + stage
    fusion the codec CPU is ~10x smaller, so the width was re-measured
    (XORQ_MM_FIXTURE_NPAR A/B hook; interleaved 8-vs-4 over all nine
    fixture queries: 4 wins/ties 7 of 9, geomean -6%) and the default
    dropped to 4. At real scale asset tables arrive in many splits and
    the per-task batch is what amortizes the boundary (guide SS4.1)."""
    import os

    if npar is None:
        npar = int(os.environ.get("XORQ_MM_FIXTURE_NPAR", "4"))
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < bound)
        .select(F.col("doc_id").alias("asset_id"))
        .repartition(npar)
    )


def _pinned_order(df, *cols):
    """Pin a Python-stage pipeline's output before the final global
    sort (round 9, guide §1.4/§2): ``orderBy`` plans a range exchange
    whose RangePartitioner SAMPLING pass re-executes the entire child
    — and a codec pipeline has no intermediate shuffle for the sample
    to reuse, so every encode+decode Python stage ran TWICE per
    action (measured: mjpeg 1.27 s -> 0.72 s with the pin). The lazy
    localCheckpoint materializes the decoded rows once inside the
    same job chain; the sample and the sort then read the pinned RDD.
    Row content and final order are bit-identical (same orderBy).
    XORQ_PIN_ORDER=0 restores plain orderBy (round 10 — the shared
    A/B / plan-inspection hook queries.base.pinned_order honors)."""
    import os

    if os.environ.get("XORQ_PIN_ORDER", "1") == "0":
        return df.orderBy(*cols)
    return df.localCheckpoint(eager=False).orderBy(*cols)



@query(
    "mm_extract_features",
    oracle="""
    SELECT doc_id,
           octet_length(text::BLOB)::BIGINT AS n_bytes,
           sha256(text) AS sha256,
           list_transform(range(0, 8),
                          i -> ('0x' || substr(sha256(text), i*2 + 1, 2))::INT) AS emb_bytes
    FROM documents ORDER BY doc_id
    """,
)
def mm_extract_features(spark, sf_dir):
    """mapInPandas feature extraction over binary payloads. The stub
    embedding is digest-derived; emitting the recovered digest bytes
    (exact ints) instead of float32s keeps the oracle compare exact."""
    docs = widen(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    feats = extract_features(assets, dim=8)
    out = feats.select(
        F.col("asset_id").alias("doc_id"),
        "n_bytes",
        "sha256",
        F.transform(
            "embedding",
            lambda x: F.round((x + 1.0) / 2.0 * 255.0).cast("int"),
        ).alias("emb_bytes"),
    )
    return _pinned_order(out, "doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    WITH assets AS (
      SELECT doc_id, text, ((doc_id % 5) + 1) * 1000 AS duration_ms
      FROM documents WHERE doc_id < 50),
    grid AS (
      SELECT doc_id, unnest(range(0, duration_ms, 1000)) AS ts_ms, text
      FROM assets)
    SELECT doc_id, ts_ms::BIGINT AS ts_ms,
           sha256(text || ts_ms::VARCHAR) AS frame_digest
    FROM grid ORDER BY doc_id, ts_ms
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: sequence+explode timestamp grid per
    asset (pure JVM), stubbed per-frame digest (real decoder would swap
    in here; the Spark plumbing is the deliverable)."""
    from xorq_spark.functions.multimodal import frame_sample

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        ((F.col("doc_id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return (
        frame_sample(assets, every_ms=1000)
        .select(F.col("asset_id").alias("doc_id"), F.col("ts_ms").cast("bigint").alias("ts_ms"), "frame_digest")
        .orderBy("doc_id", "ts_ms")
    )


@query(
    "mm_resize_plan",
    oracle="""
    WITH assets AS (
      SELECT doc_id,
             text,
             (320 + (doc_id % 7) * 80)::INT AS width,
             (240 + (doc_id % 5) * 60)::INT AS height
      FROM documents),
    dims AS (
      SELECT doc_id, text, width, height,
             greatest(1, CAST(floor(width * 64.0 / greatest(width, height)) AS INT)) AS out_width,
             greatest(1, CAST(floor(height * 64.0 / greatest(width, height)) AS INT)) AS out_height
      FROM assets)
    SELECT doc_id, out_width, out_height,
           sha256(text || CAST(out_width AS VARCHAR) || 'x' || CAST(out_height AS VARCHAR)) AS resized_digest
    FROM dims ORDER BY doc_id
    """,
)
def mm_resize_plan(spark, sf_dir):
    """Aspect-preserving batch resize (functions/multimodal.py
    resize_images): target dims computed JVM-side with
    integer-product/single-division arithmetic (bit-identical in both
    engines), the resample kernel a deterministic digest stub running
    in Arrow-batched mapInPandas — the real-codec swap point. Synthetic
    per-doc dims exercise every aspect ratio bucket."""
    from xorq_spark.functions.multimodal import resize_images

    docs = widen(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (320 + (F.col("doc_id") % 7) * 80).cast("int").alias("width"),
        (240 + (F.col("doc_id") % 5) * 60).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return _pinned_order(
        resize_images(assets, box=64).select(
            F.col("asset_id").alias("doc_id"),
            "out_width",
            "out_height",
            "resized_digest",
        ),
        "doc_id",
    )


@query(
    "mm_decode_png_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT asset_id, w, h, unnest(range(0, w)) AS x FROM ids),
    g AS (SELECT asset_id, w, h, x, unnest(range(0, h)) AS y FROM gx)
    SELECT asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(sum((asset_id*7 + 3*x + 5*y) % 256) AS BIGINT) AS sum_c0,
           CAST(sum((asset_id*7 + 3*x + 5*y + 11) % 256) AS BIGINT) AS sum_c1,
           CAST(sum((asset_id*7 + 3*x + 5*y + 22) % 256) AS BIGINT) AS sum_c2
    FROM g GROUP BY asset_id, w, h ORDER BY asset_id
    """,
)
def mm_decode_png_stats(spark, sf_dir):
    """REAL PNG decode, certified: Spark encodes deterministic PNGs
    (pixel(c,x,y) = (id*7+3x+5y+11c) mod 256), decodes them with the
    pure-stdlib codec (functions/imagecodec.py), and emits exact
    per-channel sums; the oracle recomputes the sums from the closed
    form. A broken inflate/unfilter path cannot hash-match."""
    from xorq_spark.functions.multimodal import (
        decode_image_stats,
        synth_png_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    return _pinned_order(
        decode_image_stats(synth_png_assets(ids)).drop("px_sha256"),
        "asset_id",
    )


@query(
    "mm_decode_jpeg_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 2 + doc_id % 3 AS bw, 2 + doc_id % 2 AS bh
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT asset_id, bw, bh, unnest(range(0, bw)) AS bx FROM ids),
    g AS (SELECT asset_id, bw, bh, bx, unnest(range(0, bh)) AS by FROM gx)
    SELECT asset_id,
           CAST(bw * 8 AS INT) AS width,
           CAST(bh * 8 AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(sum(64 * (128 + 2 * (((asset_id*5 + 7*bx + 11*by) % 53)
                                     - 26))) AS BIGINT) AS sum_c0,
           CAST(0 AS BIGINT) AS sum_c1,
           CAST(0 AS BIGINT) AS sum_c2
    FROM g GROUP BY asset_id, bw, bh ORDER BY asset_id
    """,
)
def mm_decode_jpeg_stats(spark, sf_dir):
    """REAL baseline-JPEG decode, certified: Spark Huffman+DCT-encodes
    deterministic grayscale JPEGs (functions/jpegcodec.py — pure
    stdlib), decodes them back through the full marker-parse → Huffman
    → dequant → IDCT pipeline, and emits exact pixel sums. The fixture
    grid is uniform 8x8 blocks with even level-shifted values, so
    quantization is exact and the SQL oracle replays the decoded sums
    in closed form — a broken Huffman table, DC predictor, dequant, or
    IDCT path cannot hash-match. (Lossy/AC/chroma paths are pytest-
    covered: tests/test_jpegcodec.py.)"""
    from xorq_spark.functions.multimodal import (
        decode_image_stats,
        synth_jpeg_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    return _pinned_order(
        decode_image_stats(synth_jpeg_assets(ids)).drop("px_sha256"),
        "asset_id",
    )


@query(
    "mm_decode_jpeg_progressive",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 2 + doc_id % 4 AS bw, 2 + doc_id % 3 AS bh
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT asset_id, bw, bh, unnest(range(0, bw)) AS bx FROM ids),
    g AS (SELECT asset_id, bw, bh, bx, unnest(range(0, bh)) AS by FROM gx)
    SELECT asset_id,
           CAST(bw * 8 AS INT) AS width,
           CAST(bh * 8 AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(sum(64 * (128 + 2 * (((asset_id*7 + 5*bx + 13*by) % 53)
                                     - 26))) AS BIGINT) AS sum_c0,
           CAST(0 AS BIGINT) AS sum_c1,
           CAST(0 AS BIGINT) AS sum_c2
    FROM g GROUP BY asset_id, bw, bh ORDER BY asset_id
    """,
)
def mm_decode_jpeg_progressive(spark, sf_dir):
    """REAL progressive-JPEG decode, certified (round 7 — closes the
    last real-world image-format gap): Spark encodes SOF2 streams whose
    scan script is libjpeg's shape (interleaved DC first at Al=1, DC
    refine, per-component AC first/refine with EOB-run coding), decodes
    them through the full successive-approximation pipeline
    (functions/jpegcodec.py G.2 decoder), and emits exact pixel sums.
    Uniform 8x8 blocks keep quantization exact, so the SQL oracle
    replays decoded sums in closed form — a broken DC refinement bit,
    EOB-run count, or band flush cannot hash-match. (AC-refinement
    significance/correction paths on dense coefficients are
    pytest-fuzzed bit-identical to the baseline decoder:
    tests/test_jpegcodec.py.)"""
    from xorq_spark.functions.multimodal import (
        PIXEL_STATS_SCHEMA,
        decode_image_stats_batches,
        synth_jpeg_progressive_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_jpeg_progressive_assets_batches(),
        decode_image_stats_batches(),
        PIXEL_STATS_SCHEMA,
    )
    return _pinned_order(stats.drop("px_sha256"), "asset_id")


@query(
    "mm_resize_decoded",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 64),
    dims AS (
      SELECT asset_id, w, h,
             greatest(1, w * 6 // greatest(w, h)) AS ow,
             greatest(1, h * 6 // greatest(w, h)) AS oh
      FROM ids),
    gx AS (SELECT asset_id, w, h, ow, oh, unnest(range(0, ow)) AS ox FROM dims),
    g AS (SELECT asset_id, w, h, ow, oh, ox, unnest(range(0, oh)) AS oy FROM gx),
    src AS (
      SELECT asset_id, ow, oh,
             (ox * w) // ow AS sx,
             (oy * h) // oh AS sy
      FROM g)
    SELECT asset_id,
           CAST(ow AS INT) AS out_width,
           CAST(oh AS INT) AS out_height,
           CAST(sum((asset_id*7 + 3*sx + 5*sy) % 256) AS BIGINT) AS sum_c0,
           CAST(sum((asset_id*7 + 3*sx + 5*sy + 11) % 256) AS BIGINT) AS sum_c1,
           CAST(sum((asset_id*7 + 3*sx + 5*sy + 22) % 256) AS BIGINT) AS sum_c2
    FROM src GROUP BY asset_id, ow, oh ORDER BY asset_id
    """,
)
def mm_resize_decoded(spark, sf_dir):
    """REAL resize: decode -> nearest-neighbor resample -> re-encode ->
    decode again (double round-trip pins encoder against decoder); the
    oracle replays the integer NN map src=floor(out*dim/out_dim) on the
    closed-form pixel grid."""
    from xorq_spark.functions.multimodal import (
        resize_images_decoded,
        synth_png_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    return _pinned_order(
        resize_images_decoded(synth_png_assets(ids), box=6), "asset_id"
    )


@query(
    "mm_decode_wav_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 2 AS ch,
             64 + doc_id % 33 AS frames,
             CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate
      FROM documents WHERE doc_id < 64),
    s AS (
      SELECT asset_id, ch, rate, k,
             ((asset_id*31 + 11*k) % 4001) - 2000 AS v
      FROM (SELECT asset_id, ch, rate,
                   unnest(range(0, frames * ch)) AS k
            FROM ids)),
    zc AS (
      SELECT asset_id,
             CAST(sum(CASE WHEN (prev < 0) <> (v < 0) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_zero_cross
      FROM (SELECT asset_id, v,
                   lag(v) OVER (PARTITION BY asset_id ORDER BY k) AS prev
            FROM s)
      WHERE prev IS NOT NULL GROUP BY asset_id)
    SELECT s.asset_id,
           any_value(s.rate) AS sample_rate,
           CAST(any_value(s.ch) AS INT) AS channels,
           count(*) AS n_samples,
           CAST(sum(s.v) AS BIGINT) AS sum_samples,
           CAST(sum(s.v * s.v) AS BIGINT) AS sum_sq,
           any_value(zc.n_zero_cross) AS n_zero_cross
    FROM s JOIN zc USING (asset_id)
    GROUP BY s.asset_id
    ORDER BY s.asset_id
    """,
)
def mm_decode_wav_stats(spark, sf_dir):
    """REAL audio decode (functions/audiocodec.py): hand-rolled RIFF
    chunk walk + PCM unpack inside Arrow-batched mapInPandas, emitting
    integer-exact DSP features (sum, energy, zero crossings). Payloads
    are genuine PCM WAV files whose samples follow a closed form, so
    the DuckDB oracle recomputes every feature from the formula while
    Spark recovers them from the decoded bytes — a broken chunk walk,
    a signedness slip, or an interleave error cannot hash-match."""
    from xorq_spark.functions.multimodal import (
        decode_audio_stats,
        synth_wav_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    assets = synth_wav_assets(ids)
    return _pinned_order(
        decode_audio_stats(assets).drop("pcm_sha256"), "asset_id"
    )


@query(
    "mm_decode_avi_frames",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
             2 + doc_id % 3 AS nf
      FROM documents WHERE doc_id < 64),
    fr AS (SELECT asset_id, w, h, unnest(range(0, nf)) AS f FROM ids),
    px AS (
      SELECT asset_id, w, h, f, x, unnest(range(0, h)) AS y
      FROM (SELECT asset_id, w, h, f, unnest(range(0, w)) AS x FROM fr))
    SELECT asset_id,
           CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(sum((asset_id*13 + 7*f + 3*x + 5*y) % 256) AS BIGINT) AS sum_b,
           CAST(sum((asset_id*13 + 7*f + 3*x + 5*y + 17) % 256) AS BIGINT) AS sum_g,
           CAST(sum((asset_id*13 + 7*f + 3*x + 5*y + 34) % 256) AS BIGINT) AS sum_r
    FROM px
    GROUP BY asset_id, f, w, h
    ORDER BY asset_id, frame_idx
    """,
)
def mm_decode_avi_frames(spark, sf_dir):
    """REAL video decode (functions/audiocodec.py avi/DIB): walk the
    RIFF tree of genuine uncompressed AVI files, recover every frame,
    and emit per-frame integer channel sums (DIB row padding
    excluded — an off-by-one in the stride shows immediately). The
    DuckDB oracle recomputes each frame's sums from the closed-form
    pixel formula. Compressed fourccs stay honestly gated."""
    from xorq_spark.functions.multimodal import (
        VIDEO_STATS_SCHEMA,
        decode_video_stats_batches,
        synth_avi_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_avi_assets_batches(),
        decode_video_stats_batches(),
        VIDEO_STATS_SCHEMA,
    )
    return _pinned_order(stats, "asset_id", "frame_idx")


@query(
    "mm_image_dhash_pairs",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS aid, doc_id // 2 AS base, doc_id % 2 AS odd,
             8 + (doc_id // 2) % 9 AS w, 8 + (doc_id // 2) % 7 AS h
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT aid, base, odd, w, h, unnest(range(0, 9)) AS x FROM ids),
    grid AS (SELECT aid, base, odd, w, h, x, unnest(range(0, 8)) AS y FROM gx),
    src AS (
      SELECT aid, base, odd, x, y,
             (x * w) // 9 AS sx, (y * h) // 8 AS sy
      FROM grid),
    gray AS (
      SELECT aid, x, y,
             (299 * ((base*7 + (3 + base % 11)*sx*sx + (5 + base % 13)*sy*sy
                      + sx*sy
                      + CASE WHEN odd = 1 AND sx = 0 AND sy = 0
                             THEN 37 ELSE 0 END) % 256)
              + 587 * ((base*7 + (3 + base % 11)*sx*sx + (5 + base % 13)*sy*sy
                        + sx*sy + 11) % 256)
              + 114 * ((base*7 + (3 + base % 11)*sx*sx + (5 + base % 13)*sy*sy
                        + sx*sy + 22) % 256)) // 1000 AS g
      FROM src),
    bits AS (
      SELECT a.aid, a.y * 8 + a.x AS b,
             CASE WHEN a.g < c.g THEN 1 ELSE 0 END AS bit
      FROM gray a JOIN gray c
        ON a.aid = c.aid AND a.y = c.y AND c.x = a.x + 1
      WHERE a.x < 8),
    words AS (
      SELECT aid,
             CAST(sum(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b)
                           ELSE 0 END) AS BIGINT) AS h_lo,
             CAST(sum(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32))
                           ELSE 0 END) AS BIGINT) AS h_hi
      FROM bits GROUP BY aid),
    bands AS (
      SELECT aid, h_lo, h_hi, band,
             CASE band WHEN 0 THEN h_lo % 65536
                       WHEN 1 THEN h_lo // 65536
                       WHEN 2 THEN h_hi % 65536
                       ELSE h_hi // 65536 END AS key
      FROM words CROSS JOIN range(0, 4) r(band)),
    cand AS (
      SELECT DISTINCT a.aid AS id_a, b.aid AS id_b,
             a.h_lo AS la, a.h_hi AS ha, b.h_lo AS lb, b.h_hi AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.aid < b.aid)
    SELECT id_a, id_b,
           CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS INT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 10
    ORDER BY id_a, id_b
    """,
)
def mm_image_dhash_pairs(spark, sf_dir):
    """IMAGE near-duplicate detection on REAL pixels
    (functions/multimodal.py image_dhash + image_neardup_pairs): the
    multimodal leg of the dedup matrix next to text MinHash and
    embedding cosine. dHash = integer luma → NN 9×8 grid →
    horizontal-gradient bits; pairs via 16-bit band blocking + exact
    xor/bit_count Hamming. Assets come in perturbed near-dup pairs
    (one source pixel edited), and the DuckDB oracle replays the
    ENTIRE pipeline — luma, NN map, every bit, the banding, and the
    Hamming verify — from the closed-form pixel formula."""
    from xorq_spark.functions.multimodal import (
        DHASH_SCHEMA,
        image_dhash_batches,
        image_neardup_pairs,
        synth_png_pairs_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    hashes = synth_then_stats(
        ids,
        synth_png_pairs_batches(),
        image_dhash_batches(),
        DHASH_SCHEMA,
    )
    # Pin the hash frame (round 10): the banding self-join consumes it
    # on BOTH sides, and profiling showed the fused synth+dhash Python
    # stage materializing twice (0.26 s each, per-job attribution). The
    # lazy checkpoint computes it once inside the first consumer's job.
    # XORQ_PIN_ORDER=0 exposes the unpinned plan (shared hook).
    # (r09's note about NOT pinning applied to pinned_order on the
    # FINAL sort, which only added a barrier — that stays un-pinned.)
    import os

    if os.environ.get("XORQ_PIN_ORDER", "1") != "0":
        hashes = hashes.localCheckpoint(eager=False)
    return (
        image_neardup_pairs(hashes, max_hamming=10)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


@query(
    "mm_audio_fp_pairs",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS aid, doc_id // 2 AS base, doc_id % 2 AS odd,
             256 + (doc_id // 2) % 65 AS n
      FROM documents WHERE doc_id < 64),
    s AS (
      SELECT aid, n, k,
             ((base*31 + 11*k + base*k) % 4001) - 2000
               + CASE WHEN odd = 1 AND k = 0 THEN 150 ELSE 0 END AS v
      FROM (SELECT aid, base, odd, n, unnest(range(0, n)) AS k FROM ids)),
    e AS (
      SELECT aid, (k * 32) // n AS f, CAST(sum(v * v) AS BIGINT) AS e
      FROM s GROUP BY aid, (k * 32) // n),
    bits AS (
      SELECT a.aid, a.f AS i,
             CASE WHEN a.e < b.e THEN 1 ELSE 0 END AS bit
      FROM e a JOIN e b ON a.aid = b.aid AND b.f = a.f + 1),
    words AS (
      SELECT aid,
             CAST(sum(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS fp
      FROM bits GROUP BY aid),
    bands AS (
      SELECT aid, fp, band,
             CASE band WHEN 0 THEN fp % 65536 ELSE fp // 65536 END AS key
      FROM words CROSS JOIN range(0, 2) r(band)),
    cand AS (
      SELECT DISTINCT a.aid AS id_a, b.aid AS id_b, a.fp AS fa, b.fp AS fb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.aid < b.aid)
    SELECT id_a, id_b,
           CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 4
    ORDER BY id_a, id_b
    """,
)
def mm_audio_fp_pairs(spark, sf_dir):
    """AUDIO near-duplicate detection on REAL decoded samples
    (functions/multimodal.py audio_fingerprint + audio_neardup_pairs):
    frame-energy gradient bits (the acoustic dHash), 16-bit band
    blocking, exact Hamming verify — completing the dedup matrix's
    multimodal row (text MinHash / embedding cosine / image dHash /
    audio fingerprint). Clips come in perturbed near-dup pairs (a
    click at sample 0) over base-keyed waveforms; the oracle replays
    frames, energies, every bit, and the banding from the closed
    form."""
    from xorq_spark.functions.multimodal import (
        audio_fingerprint,
        audio_neardup_pairs,
        synth_wav_pairs,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    fps = audio_fingerprint(synth_wav_pairs(ids))
    # NOT pinned — same banding-join shape as mm_image_dhash_pairs.
    return (
        audio_neardup_pairs(fps, max_hamming=4)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


@query(
    "mm_decode_webp_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT asset_id, w, h, unnest(range(0, w)) AS x FROM ids),
    g AS (SELECT asset_id, w, h, x, unnest(range(0, h)) AS y FROM gx)
    SELECT asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(4 AS INT) AS channels,
           CAST(sum((asset_id*7 + 3*x + 5*y) % 256) AS BIGINT) AS sum_c0,
           CAST(sum((asset_id*7 + 3*x + 5*y + 11) % 256) AS BIGINT) AS sum_c1,
           CAST(sum((asset_id*7 + 3*x + 5*y + 22) % 256) AS BIGINT) AS sum_c2
    FROM g GROUP BY asset_id, w, h ORDER BY asset_id
    """,
)
def mm_decode_webp_stats(spark, sf_dir):
    """REAL lossless-WebP (VP8L) decode, certified: Spark encodes the
    closed-form RGB grid through functions/webpcodec.py (modes rotating
    per id across literal / subtract-green / predictor / color-cache +
    LZ77 row-backref paths), decodes each payload back through the full
    prefix-code → transform-inversion pipeline, and emits exact channel
    sums the SQL oracle recomputes from the formula — a broken Huffman
    table, predictor mode, cache slot, or backref distance cannot
    hash-match (the lossless sibling of mm_decode_jpeg_stats)."""
    from xorq_spark.functions.multimodal import (
        PIXEL_STATS_SCHEMA,
        decode_image_stats_batches,
        synth_then_stats,
        synth_webp_assets_batches,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_webp_assets_batches(),
        decode_image_stats_batches(),
        PIXEL_STATS_SCHEMA,
    )
    return _pinned_order(stats.drop("px_sha256"), "asset_id")


@query(
    "mm_decode_gif_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             5 + doc_id % 6 AS w, 4 + doc_id % 5 AS h,
             4 + doc_id % 5 AS np, 2 + doc_id % 2 AS nf
      FROM documents WHERE doc_id < 64),
    gx AS (SELECT asset_id, w, h, np, nf, unnest(range(0, w)) AS x FROM ids),
    g AS (SELECT asset_id, w, h, np, nf, x, unnest(range(0, h)) AS y FROM gx),
    px AS (
      SELECT asset_id, w, h, nf,
             (asset_id*3 + x + 2*y + (nf - 1)) % np AS pi
      FROM g)
    SELECT asset_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(nf AS INT) AS n_frames,
           CAST(sum((17*pi + asset_id) % 256) AS BIGINT) AS sum_c0,
           CAST(sum((29*pi + 2*asset_id) % 256) AS BIGINT) AS sum_c1,
           CAST(sum((43*pi + 3*asset_id) % 256) AS BIGINT) AS sum_c2
    FROM px GROUP BY asset_id, w, h, nf ORDER BY asset_id
    """,
)
def mm_decode_gif_stats(spark, sf_dir):
    """REAL animated-GIF decode, certified (round 7 — the fourth real
    image codec beside PNG/JPEG/WebP): Spark LZW-encodes deterministic
    multi-frame GIF89a fixtures (odd ids interlaced), decodes them back
    through the full container walk — variable-width LSB-first LZW with
    clear/EOI and the 12-bit cap, four-pass interlace de-shuffle,
    frame-by-frame canvas composition — and emits the frame count plus
    exact pixel sums of the composed last frame; the SQL oracle replays
    the palette map and index grid in closed form, so a broken code
    width bump, interlace pass, or composition order cannot hash-match.
    (KwKwK, clear-on-full and malformed-stream paths are pytest-fuzzed:
    tests/test_gifcodec.py.)"""
    from xorq_spark.functions.multimodal import (
        GIF_STATS_SCHEMA,
        decode_gif_stats_batches,
        synth_gif_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_gif_assets_batches(),
        decode_gif_stats_batches(),
        GIF_STATS_SCHEMA,
    )
    return _pinned_order(stats, "asset_id")


@query(
    "mm_decode_flac_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 2 AS ch,
             64 + doc_id % 33 AS frames,
             CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate
      FROM documents WHERE doc_id < 64),
    s AS (
      SELECT asset_id, ch, rate, k,
             ((asset_id*31 + 11*k) % 4001) - 2000 AS v
      FROM (SELECT asset_id, ch, rate,
                   unnest(range(0, frames * ch)) AS k
            FROM ids)),
    zc AS (
      SELECT asset_id,
             CAST(sum(CASE WHEN (prev < 0) <> (v < 0) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_zero_cross
      FROM (SELECT asset_id, v,
                   lag(v) OVER (PARTITION BY asset_id ORDER BY k) AS prev
            FROM s)
      WHERE prev IS NOT NULL GROUP BY asset_id)
    SELECT s.asset_id,
           any_value(s.rate) AS sample_rate,
           CAST(any_value(s.ch) AS INT) AS channels,
           count(*) AS n_samples,
           CAST(sum(s.v) AS BIGINT) AS sum_samples,
           CAST(sum(s.v * s.v) AS BIGINT) AS sum_sq,
           any_value(zc.n_zero_cross) AS n_zero_cross
    FROM s JOIN zc USING (asset_id)
    GROUP BY s.asset_id
    ORDER BY s.asset_id
    """,
)
def mm_decode_flac_stats(spark, sf_dir):
    """REAL FLAC decode (functions/flaccodec.py, round 8 — closes the
    gate named since round 5): payloads are genuinely FLAC-compressed
    streams built by the committed encoder (fixed/LPC prediction, Rice
    + RICE2 residuals, left/right/mid-side stereo decorrelation on
    schedule, multi-frame with partial last block), decoded inside
    Arrow-batched mapInPandas through the SAME audio-stats path as the
    WAV twin. Because FLAC is lossless, the oracle is the WAV query's
    closed form verbatim — a Rice/CRC/decorrelation bug cannot
    hash-match. Reference parity: xorq ships audio via its multimodal
    examples; this engine decodes the dominant lossless training-audio
    format natively."""
    from xorq_spark.functions.multimodal import (
        AUDIO_STATS_SCHEMA,
        decode_audio_stats_batches,
        synth_flac_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_flac_assets_batches(),
        decode_audio_stats_batches(),
        AUDIO_STATS_SCHEMA,
    )
    return _pinned_order(stats.drop("pcm_sha256"), "asset_id")


@query(
    "mm_audio_resample",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 2 AS ch,
             64 + doc_id % 33 AS frames,
             CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate
      FROM documents WHERE doc_id < 64),
    m AS (SELECT asset_id, ch, rate, frames,
                 ((frames - 1) * 16000) // rate + 1 AS m
          FROM ids),
    tt AS (SELECT asset_id, ch, rate, m,
                  unnest(range(0, m)) AS tpos
           FROM m),
    cc AS (SELECT asset_id, ch, rate, tpos,
                  unnest(range(0, ch)) AS c
           FROM tt),
    rs AS (SELECT asset_id, ch, c,
                  (tpos * rate) // 16000 AS i,
                  tpos * rate - ((tpos * rate) // 16000) * 16000 AS f
           FROM cc),
    v AS (SELECT asset_id, ch, c,
                 CASE WHEN f = 0
                      THEN ((asset_id*31 + 11*(i*ch + c)) % 4001) - 2000
                      ELSE ((((asset_id*31 + 11*(i*ch + c)) % 4001) - 2000
                              + 32768) * (16000 - f)
                            + (((asset_id*31 + 11*((i+1)*ch + c)) % 4001)
                               - 2000 + 32768) * f) // 16000 - 32768
                 END AS v
          FROM rs)
    SELECT asset_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(any_value(ch) AS INT) AS channels,
           count(*) AS n_samples,
           CAST(sum(v) AS BIGINT) AS sum_samples,
           CAST(sum(v * v) AS BIGINT) AS sum_sq
    FROM v GROUP BY asset_id ORDER BY asset_id
    """,
)
def mm_audio_resample(spark, sf_dir):
    """REAL decode -> RESAMPLE -> feature chain (round 8): FLAC
    payloads decode through functions/flaccodec.py, linearly resample
    to one target rate (16 kHz — the one-rate normalization every
    training-audio pipeline runs; sources arrive at 8/12/16 kHz so
    up-, down- and identity-resampling all execute), and reduce to
    integer DSP features. The resample kernel is integer-exact by
    construction (audiocodec.resample_linear: the +32768 shift keeps
    every division nonnegative, where Spark and DuckDB integer
    division would diverge on negatives) so the oracle replays decode
    AND resample bit-for-bit from the closed-form signal."""
    from xorq_spark.functions.multimodal import (
        resample_audio_stats,
        synth_flac_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    return _pinned_order(
        resample_audio_stats(synth_flac_assets(ids), 16000), "asset_id"
    )


@query(
    "mm_audio_energy_segments",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             1 + doc_id % 2 AS ch,
             64 + doc_id % 33 AS frames
      FROM documents WHERE doc_id < 64),
    s AS (
      SELECT asset_id,
             j,
             j // 16 AS k,
             abs(((asset_id*31 + 11*(j*ch)) % 4001) - 2000) AS a
      FROM (SELECT asset_id, ch, unnest(range(0, frames)) AS j FROM ids)),
    fr AS (
      SELECT asset_id, k,
             CAST(sum(a) AS BIGINT) AS sa,
             count(*) AS len_k
      FROM s GROUP BY asset_id, k),
    tot AS (
      SELECT asset_id,
             CAST(sum(a) AS BIGINT) AS ta,
             count(*) AS n
      FROM s GROUP BY asset_id),
    act AS (
      SELECT fr.asset_id, fr.k,
             (fr.sa * tot.n >= tot.ta * fr.len_k) AS active,
             lag((fr.sa * tot.n >= tot.ta * fr.len_k))
               OVER (PARTITION BY fr.asset_id ORDER BY fr.k) AS prev
      FROM fr JOIN tot USING (asset_id)),
    runs AS (
      SELECT asset_id, k, active,
             k - CAST(row_number() OVER (
                   PARTITION BY asset_id, active ORDER BY k) AS BIGINT)
               AS grp
      FROM act)
    SELECT act.asset_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN act.active THEN 1 ELSE 0 END) AS BIGINT)
             AS n_active,
           CAST(sum(CASE WHEN act.active
                          AND (act.prev IS NULL OR NOT act.prev)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
           CAST(COALESCE((SELECT max(cnt) FROM (
               SELECT count(*) AS cnt FROM runs r
               WHERE r.asset_id = act.asset_id AND r.active
               GROUP BY r.grp)), 0) AS BIGINT) AS max_run
    FROM act GROUP BY act.asset_id ORDER BY act.asset_id
    """,
)
def mm_audio_energy_segments(spark, sf_dir):
    """REAL decode -> VAD-style energy segmentation (round 8): WAV
    payloads decode and channel 0 is framed at 16 samples; a frame is
    active when its mean |sample| reaches the signal mean, compared by
    integer cross-multiplication (engine-exact); gaps-and-islands over
    the active flags give segment count and longest run — the
    clip-extraction primitive of a speech-corpus pipeline. The oracle
    replays framing, threshold and islands from the closed-form signal
    with window functions."""
    from xorq_spark.functions.multimodal import (
        audio_segment_stats,
        synth_wav_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    return _pinned_order(
        audio_segment_stats(synth_wav_assets(ids), 16), "asset_id"
    )


@query(
    "mm_probe_mp3_stats",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             list_extract([44100, 48000, 32000], 1 + doc_id % 3) AS rate,
             1 + doc_id % 2 AS ch,
             40 + doc_id % 17 AS n,
             doc_id % 4 = 0 AS vbr,
             doc_id % 6 = 0 AS crc
      FROM documents WHERE doc_id < 64),
    fr AS (SELECT asset_id, vbr, unnest(range(0, n)) AS k FROM ids),
    kb AS (SELECT asset_id,
                  list_extract(
                    [32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                    CASE WHEN vbr THEN 1 + (asset_id + 3 * k) % 14
                         ELSE 1 + asset_id % 14 END) AS kbps
           FROM fr),
    br AS (SELECT asset_id, CAST(min(kbps) AS INT) AS bmin,
                  CAST(max(kbps) AS INT) AS bmax,
                  count(DISTINCT kbps) > 1 AS is_vbr
           FROM kb GROUP BY asset_id),
    gc AS (SELECT i.asset_id, f.k, unnest(range(0, 2)) AS gr, i.ch
           FROM ids i JOIN fr f USING (asset_id)),
    gcc AS (SELECT asset_id, k, gr, unnest(range(0, ch)) AS c FROM gc),
    p23 AS (SELECT asset_id,
                   CAST(sum((asset_id*7 + k*13 + gr*5 + c*3) % 4096)
                        AS BIGINT) AS sum_part23,
                   CAST(sum(CASE WHEN (asset_id + k + 2*gr + c) % 5 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_short_granules
            FROM gcc GROUP BY asset_id)
    SELECT i.asset_id,
           CAST(i.rate AS INT) AS sample_rate,
           CAST(i.ch AS INT) AS channels,
           CAST(i.n AS BIGINT) AS n_frames,
           i.vbr AS has_xing,
           CAST(CASE WHEN i.vbr THEN i.n ELSE 0 END AS BIGINT) AS xing_frames,
           br.bmin AS bitrate_min_kbps,
           br.bmax AS bitrate_max_kbps,
           br.is_vbr,
           CAST(i.n * 1152 * 1000 // i.rate AS BIGINT) AS duration_ms,
           p23.sum_part23,
           p23.n_short_granules,
           CAST(CASE WHEN i.crc
                     THEN i.n + CASE WHEN i.vbr THEN 1 ELSE 0 END
                     ELSE 0 END AS BIGINT) AS n_crc_frames
    FROM ids i JOIN br USING (asset_id) JOIN p23 USING (asset_id)
    ORDER BY i.asset_id
    """,
)
def mm_probe_mp3_stats(spark, sf_dir):
    """REAL MP3 stream audit (functions/mp3probe.py, round 9 — the
    staged half of the MP3 gate): payloads are syntactically valid
    MPEG-1 Layer III streams built by the committed writer (correct
    144·bitrate/rate+padding frame arithmetic, real CRC-16, packed
    17/32-byte side info, Xing/ID3v2/ID3v1 tags on schedule), walked
    frame by frame inside Arrow-batched mapInPandas: header fields,
    per-granule side info (part2_3_length, window switching), CRC
    verification, VBR detection, duration. The oracle replays every
    field from the fixture's closed forms — a frame-length slip, CRC
    bug, or mis-shifted side-info read cannot hash-match. PCM
    synthesis stays a named gate (mp3probe.mp3_decode_pcm)."""
    from xorq_spark.functions.multimodal import (
        MP3_PROBE_SCHEMA,
        probe_mp3_stats_batches,
        synth_mp3_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 64)
    stats = synth_then_stats(
        ids,
        synth_mp3_assets_batches(),
        probe_mp3_stats_batches(),
        MP3_PROBE_SCHEMA,
    )
    return _pinned_order(stats, "asset_id")


@query(
    "mm_decode_mjpeg_frames",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id,
             2 + doc_id % 3 AS bw,
             2 + doc_id % 2 AS bh,
             3 + doc_id % 4 AS nf
      FROM documents WHERE doc_id < 48),
    fr AS (SELECT asset_id, bw, bh, unnest(range(0, nf)) AS k FROM ids),
    bx AS (SELECT asset_id, bw, bh, k, unnest(range(0, bw)) AS bx FROM fr),
    grid AS (SELECT asset_id, bw, bh, k, bx, unnest(range(0, bh)) AS by
             FROM bx),
    s AS (SELECT asset_id, k,
                 CAST(sum(64 * (128 + 2 * (((asset_id*5 + 3*k + 7*bx + 11*by)
                                            % 53) - 26))) AS BIGINT)
                   AS sum_pixels
          FROM grid GROUP BY asset_id, k)
    SELECT i.asset_id, CAST(s.k AS BIGINT) AS frame_id,
           CAST(8 * i.bw AS INT) AS width,
           CAST(8 * i.bh AS INT) AS height,
           s.sum_pixels
    FROM ids i JOIN s USING (asset_id)
    ORDER BY i.asset_id, frame_id
    """,
)
def mm_decode_mjpeg_frames(spark, sf_dir):
    """REAL compressed-video decode (round 9 — closes the MJPEG half
    of the compressed-video gate): MJPG AVIs built by the committed
    writer (avi_encode_mjpeg) around REAL baseline-JPEG frames from
    the committed encoder, then container-walked and Huffman+DCT
    DECODED per frame inside Arrow-batched mapInPandas. Frames are
    DC-exact uniform-block grids (the proven synth_jpeg_assets trick
    with per-frame drift), so the oracle replays every decoded pixel
    sum in closed form — a container slip or a codec regression cannot
    hash-match. This is the shape real multimodal crawl video ships:
    compressed frames in a RIFF container, not raw DIBs."""
    from xorq_spark.functions.multimodal import (
        MJPEG_FRAME_SCHEMA,
        decode_mjpeg_frame_stats_batches,
        synth_mjpeg_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 48)
    stats = synth_then_stats(
        ids,
        synth_mjpeg_assets_batches(),
        decode_mjpeg_frame_stats_batches(),
        MJPEG_FRAME_SCHEMA,
    )
    return _pinned_order(stats, "asset_id", "frame_id")


@query(
    "mm_extract_pdf_text",
    oracle=r"""
    WITH ids AS (
      SELECT doc_id AS asset_id, 1 + doc_id % 4 AS np,
             doc_id % 5 = 0 AS inc
      FROM documents WHERE doc_id < 48),
    pg AS (SELECT asset_id, unnest(range(0, np)) AS p FROM ids),
    ln AS (SELECT asset_id, p,
                  unnest(range(0, 1 + (asset_id + p) % 3)) AS l
           FROM pg),
    lt AS (SELECT asset_id, p, l,
                  'Doc ' || asset_id || ' page ' || p || ' line ' || l
                  || ' token' || ((asset_id*7 + p*3 + l) % 100)
                  || CASE WHEN (asset_id + p + l) % 5 = 0
                          THEN ' (q\e)' ELSE '' END AS line
           FROM ln),
    base AS (SELECT asset_id,
                    string_agg(line || chr(10), '' ORDER BY p, l) AS text
             FROM lt GROUP BY asset_id),
    whole AS (SELECT i.asset_id,
                     b.text || CASE WHEN i.inc
                                    THEN 'Appendix ' || i.asset_id || chr(10)
                                    ELSE '' END AS text,
                     i.np + CASE WHEN i.inc THEN 1 ELSE 0 END AS n_pages
              FROM ids i JOIN base b USING (asset_id))
    SELECT asset_id,
           CAST(n_pages AS INT) AS n_pages,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, chr(10))) - 1 AS BIGINT) AS n_lines,
           md5(text) AS text_md5
    FROM whole ORDER BY asset_id
    """,
)
def mm_extract_pdf_text(spark, sf_dir):
    """REAL PDF text extraction (functions/pdfcodec.py, round 9):
    payloads are genuine multi-page PDFs built by the committed writer
    — page tree, per-page content streams (Flate-compressed on even
    assets), literal-string escapes, correct xref tables, and real
    INCREMENTAL-UPDATE sections (/Prev chains) on every fifth asset —
    then parsed back inside Arrow-batched mapInPandas: xref walk,
    object tokenizer, zlib inflate, BT/ET text operators. The oracle
    rebuilds the expected text closed-form and compares page counts,
    char/line counts and the md5 of every extracted character — a
    slipped xref offset, a broken escape, or a lost page cannot
    hash-match. Encrypted files, xref streams (PDF 1.5+) and non-Flate
    filters raise NotImplementedError by name."""
    from xorq_spark.functions.multimodal import (
        PDF_TEXT_SCHEMA,
        extract_pdf_text_stats_batches,
        synth_pdf_assets_batches,
        synth_then_stats,
    )

    ids = _fixture_ids(spark, sf_dir, 48)
    stats = synth_then_stats(
        ids,
        synth_pdf_assets_batches(),
        extract_pdf_text_stats_batches(),
        PDF_TEXT_SCHEMA,
    )
    return _pinned_order(stats, "asset_id")


@query(
    "mm_extract_docx_text",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 1 + doc_id % 4 AS np,
             doc_id % 4 = 0 AS has_tbl
      FROM documents WHERE doc_id < 48),
    pg AS (SELECT asset_id, unnest(range(0, np)) AS p FROM ids),
    rn AS (SELECT asset_id, p,
                  unnest(range(0, 1 + (asset_id + p) % 3)) AS r
           FROM pg),
    rt AS (SELECT asset_id, p, r,
                  'w' || ((asset_id*7 + p*3 + r) % 100) || ' ' AS rt
           FROM rn),
    pt AS (SELECT asset_id, p,
                  string_agg(rt, '' ORDER BY r)
                  || CASE WHEN (asset_id + p) % 5 = 0
                          THEN 'A&B <q>' || chr(9) || 'e' || p
                          ELSE '' END AS ptext
           FROM rt GROUP BY asset_id, p),
    base AS (SELECT asset_id,
                    string_agg(ptext || chr(10), '' ORDER BY p) AS text
             FROM pt GROUP BY asset_id),
    whole AS (SELECT i.asset_id, i.np,
                     b.text || CASE WHEN i.has_tbl
                       THEN 'T' || i.asset_id || 'r0c0' || chr(9)
                         || 'T' || i.asset_id || 'r0c1' || chr(10)
                         || 'T' || i.asset_id || 'r1c0' || chr(9)
                         || 'T' || i.asset_id || 'r1c1' || chr(10)
                       ELSE '' END AS text
              FROM ids i JOIN base b USING (asset_id))
    SELECT asset_id,
           CAST(np AS INT) AS n_paras,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, chr(10))) - 1 AS BIGINT) AS n_lines,
           md5(text) AS text_md5
    FROM whole ORDER BY asset_id
    """,
)
def mm_extract_docx_text(spark, sf_dir):
    """REAL DOCX text extraction (functions/docxcodec.py, round 9):
    payloads are genuine OPC packages built by the committed writer —
    [Content_Types].xml, package rels, a wordprocessingml
    word/document.xml with multi-run paragraphs (xml:space-preserved
    trailing spaces), XML entities (&, <, >), w:tab elements splitting
    runs, and a trailing w:tbl on every fourth asset — then parsed
    back inside Arrow-batched mapInPandas: zip central-directory walk,
    ElementTree parse, document-order body walk. The oracle rebuilds
    the expected text closed-form and compares paragraph counts,
    char/line counts and the md5 of every extracted character — a
    dropped run, a broken entity, or a skipped table row cannot
    hash-match. CFB/OLE containers (legacy .doc, encrypted OOXML)
    raise NotImplementedError by name."""
    from xorq_spark.functions.multimodal import (
        extract_docx_text_stats,
        synth_docx_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 48)
    return _pinned_order(
        extract_docx_text_stats(synth_docx_assets(ids)), "asset_id"
    )


@query(
    "mm_extract_epub_text",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS asset_id, 1 + doc_id % 3 AS nch
      FROM documents WHERE doc_id < 48),
    sp AS (SELECT asset_id, nch, unnest(range(0, nch)) AS j FROM ids),
    ch AS (SELECT asset_id, j,
                  CASE WHEN asset_id % 2 = 1 THEN nch - 1 - j
                       ELSE j END AS c
           FROM sp),
    pq AS (SELECT asset_id, j, c,
                  unnest(range(0, 1 + (asset_id + c) % 3)) AS q
           FROM ch),
    pt AS (SELECT asset_id, j, q,
                  'Ch ' || c || ' of ' || asset_id || ' para ' || q
                  || ' tok' || ((asset_id*5 + c*3 + q) % 50)
                  || CASE WHEN (asset_id + c + q) % 4 = 0
                          THEN ' &x<y' ELSE '' END AS ptext
           FROM pq),
    base AS (SELECT asset_id,
                    string_agg(ptext || chr(10), '' ORDER BY j, q) AS text
             FROM pt GROUP BY asset_id)
    SELECT b.asset_id,
           CAST(i.nch AS INT) AS n_chapters,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, chr(10))) - 1 AS BIGINT) AS n_lines,
           md5(text) AS text_md5
    FROM base b JOIN ids i ON b.asset_id = i.asset_id
    ORDER BY b.asset_id
    """,
)
def mm_extract_epub_text(spark, sf_dir):
    """REAL EPUB text extraction (functions/epubcodec.py, round 9):
    payloads are genuine OCF packages built by the committed writer —
    stored-first mimetype, container.xml, OPF manifest + spine, XHTML
    chapters with entities and <em>-nested tokens — then parsed back
    inside Arrow-batched mapInPandas: container walk, OPF parse,
    chapters read in SPINE order (odd assets ship a REVERSED spine, so
    zip-order extraction cannot hash-match). The oracle rebuilds the
    expected text closed-form, replaying the spine permutation
    arithmetically, and compares chapter counts, char/line counts and
    the md5 of every extracted character. DRM (encryption.xml) raises
    NotImplementedError by name."""
    from xorq_spark.functions.multimodal import (
        extract_epub_text_stats,
        synth_epub_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 48)
    return _pinned_order(
        extract_epub_text_stats(synth_epub_assets(ids)), "asset_id"
    )


@query(
    "mm_extract_rtf_text",
    oracle=r"""
    WITH ids AS (
      SELECT doc_id AS asset_id, 1 + doc_id % 4 AS np
      FROM documents WHERE doc_id < 48),
    pq AS (SELECT asset_id, np, unnest(range(0, np)) AS q FROM ids),
    pt AS (SELECT asset_id, q,
                  'Rtf ' || asset_id || ' para ' || q
                  || ' tok' || ((asset_id*3 + q) % 40)
                  || CASE WHEN (asset_id + q) % 4 = 0
                          THEN ' {b}\' || chr(233) ELSE '' END
                  || CASE WHEN (asset_id + q) % 5 = 0
                          THEN chr(960) ELSE '' END AS ptext
           FROM pq),
    base AS (SELECT asset_id,
                    string_agg(ptext || chr(10), '' ORDER BY q) AS text
             FROM pt GROUP BY asset_id)
    SELECT b.asset_id,
           CAST(i.np AS INT) AS n_paras,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, chr(10))) - 1 AS BIGINT) AS n_lines,
           md5(text) AS text_md5
    FROM base b JOIN ids i USING (asset_id)
    ORDER BY b.asset_id
    """,
)
def mm_extract_rtf_text(spark, sf_dir):
    """REAL RTF text extraction (functions/rtfcodec.py, round 9):
    payloads are genuine RTF built by the committed writer — font and
    color tables, an ignorable {\\*\\generator} destination, escaped
    braces/backslashes, cp1252 \\'hh escapes (e-acute) and \\uN?
    Unicode escapes (U+03C0, outside cp1252) — then tokenized back
    inside Arrow-batched mapInPandas: group stack, destination
    skipping, \\ucN fallback handling. The oracle rebuilds the
    expected text closed-form (chr(233)/chr(960) arithmetic) and
    compares paragraph counts, char/line counts and the md5 of every
    extracted character — a leaked font-table token, a broken escape,
    or a swallowed brace cannot hash-match. \\bin embedded binary
    raises NotImplementedError by name."""
    from xorq_spark.functions.multimodal import (
        extract_rtf_text_stats,
        synth_rtf_assets,
    )

    ids = _fixture_ids(spark, sf_dir, 48)
    return _pinned_order(
        extract_rtf_text_stats(synth_rtf_assets(ids)), "asset_id"
    )
