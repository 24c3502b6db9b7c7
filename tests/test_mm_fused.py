"""Fused fixture stage (round 10): synth_then_stats composes a synth
batch generator with its decode/probe generator inside ONE mapInPandas,
so the payload bytes never re-cross the Arrow boundary. These tests pin
that the fused path's rows are IDENTICAL to the chained operators'."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _ids(spark, bound=16, npar=2):
    return (
        spark.range(bound)
        .select(F.col("id").alias("asset_id"))
        .repartition(npar)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "synth_name,decode_name,schema_name",
    [
        ("synth_jpeg_progressive_assets", "decode_image_stats", "PIXEL_STATS_SCHEMA"),
        ("synth_webp_assets", "decode_image_stats", "PIXEL_STATS_SCHEMA"),
        ("synth_gif_assets", "decode_gif_stats", "GIF_STATS_SCHEMA"),
        ("synth_flac_assets", "decode_audio_stats", "AUDIO_STATS_SCHEMA"),
        ("synth_avi_assets", "decode_video_stats", "VIDEO_STATS_SCHEMA"),
        ("synth_mjpeg_assets", "decode_mjpeg_frame_stats", "MJPEG_FRAME_SCHEMA"),
        ("synth_mp3_assets", "probe_mp3_stats", "MP3_PROBE_SCHEMA"),
        ("synth_pdf_assets", "extract_pdf_text_stats", "PDF_TEXT_SCHEMA"),
        ("synth_png_pairs", "image_dhash", "DHASH_SCHEMA"),
    ],
)
def test_fused_matches_chained(spark, synth_name, decode_name, schema_name):
    import xorq_spark.functions.multimodal as mm

    synth = getattr(mm, synth_name)
    decode = getattr(mm, decode_name)
    synth_batches = getattr(mm, synth_name + "_batches")
    decode_batches = getattr(mm, decode_name + "_batches")
    schema = getattr(mm, schema_name)

    chained = decode(synth(_ids(spark)))
    fused = mm.synth_then_stats(
        _ids(spark), synth_batches(), decode_batches(), schema
    )
    assert fused.schema == chained.schema
    assert _rows(fused) == _rows(chained)
