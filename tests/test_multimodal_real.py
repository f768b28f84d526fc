"""DFT filter-bank energies over the real WAV codec path."""

def test_wav_spectral_planted_period4_pattern(spark):
    # a period-4 sample pattern concentrates energy at bin 8
    # (8 cycles / 32 samples); bins 1, 2, 4 see whole periods and
    # cancel to exactly zero after the integer rounding
    from searchengine_spark.operators.multimodal import (
        q_wav_spectral_bins,
        wav_media_from_documents,
        wav_spectral_bins,
    )

    text = "Aa!z" * 8  # 32 chars, period 4
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text)), (2, "B" * 32, "en", "s", 32)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {
        r["media_id"]: r
        for r in wav_spectral_bins(wav_media_from_documents(docs)).collect()
    }
    periodic, constant = rows[1], rows[2]
    assert periodic["p8"] > 0
    assert periodic["p1"] == periodic["p2"] == periodic["p4"] == 0
    # constant signal: zero energy at every nonzero frequency
    assert all(constant[f"p{k}"] == 0 for k in (1, 2, 4, 8))


def test_wav_spectral_covers_full_clips_only(spark, sf_dir):
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.multimodal import (
        WAV_SAMPLES,
        q_wav_spectral_bins,
    )

    out = q_wav_spectral_bins(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    want = docs.filter(F.length(F.coalesce("text", F.lit(""))) >= WAV_SAMPLES).count()
    assert out.count() == want
    assert out.filter((F.col("p1") < 0) | (F.col("p8") < 0)).count() == 0
