"""Multimodal near-duplicate removal: the dedup matrix's media legs —
image dHash and acoustic fingerprints over REAL decoded payloads,
sharing the text pipeline's connected-components + canonical-keep
machinery:

1. decode PNGs, hash with `image_dhash` (integer luma, NN 9×8 grid),
2. decode WAVs, hash with `audio_fingerprint` (frame-energy bits),
3. band-blocked candidate pairs + exact Hamming verify per modality,
4. pairs → `connected_components` → keep the min-id asset per cluster
   (the same star-contraction CC the text MinHash pipeline uses).

    python examples/multimodal_dedup.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions.dedup import connected_components
from xorq_spark.functions.multimodal import (
    audio_fingerprint,
    audio_neardup_pairs,
    image_dhash,
    image_neardup_pairs,
    synth_png_pairs,
    synth_wav_pairs,
)
from xorq_spark.session import connect


def dedup_assets(pairs, assets, id_col="asset_id"):
    comps = connected_components(pairs, "id_a", "id_b")
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return assets.join(losers, id_col, "left_anti")


def main() -> None:
    spark = connect(app_name="multimodal_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(32).select(F.col("id").alias("asset_id"))

    images = synth_png_pairs(ids)
    img_pairs = image_neardup_pairs(image_dhash(images), max_hamming=10)
    kept_images = dedup_assets(img_pairs.select("id_a", "id_b"), images)

    audio = synth_wav_pairs(ids)
    aud_pairs = audio_neardup_pairs(audio_fingerprint(audio), max_hamming=4)
    kept_audio = dedup_assets(aud_pairs.select("id_a", "id_b"), audio)

    n_img, k_img = images.count(), kept_images.count()
    n_aud, k_aud = audio.count(), kept_audio.count()
    print(f"images: {n_img} -> {k_img} after dHash dedup")
    print(f"audio:  {n_aud} -> {k_aud} after fingerprint dedup")
    # every planted (2k, 2k+1) pair collapses to one survivor
    assert k_img <= n_img - 16 + 1  # 16 planted dup pairs in 32 assets
    assert k_aud <= n_aud - 16 + 1
    assert k_img > 0 and k_aud > 0


if __name__ == "__main__":
    main()
