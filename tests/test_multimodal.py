"""Multimodal plumbing tests: binary columns, Arrow-batched decode,
frame sampling, native binary stats. Codecs are deterministic fakes
(container has no imaging libs); the dataflow is the real thing."""

import pytest

from searchengine_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    decode_real_media,
    encode_fake_media,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", encode_fake_media("image", 640, 480, bytes([10, 20, 30]))),
        (2, "image", encode_fake_media("image", 32, 32, bytes([100]))),
        (3, "audio", encode_fake_media("audio", 16000, 48000, bytes([1, 2, 3, 4]))),
        (4, "video", encode_fake_media("video", 5, 4, bytes(range(20)))),
        (5, "image", None),  # null payload must not crash the batch
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_decode_media(media):
    got = {r.media_id: r for r in decode_media(media).collect()}
    assert got[1].dim_a == 640 and got[1].dim_b == 480
    assert got[1].n_bytes == 3 and got[1].mean_byte == pytest.approx(20.0)
    assert got[3].dim_a == 16000 and got[3].dim_b == 48000
    assert got[5].dim_a == 0 and got[5].n_bytes == 0


def test_sample_frames(media):
    frames = sample_frames(media.filter("media_type = 'video'"), every_nth=2).collect()
    # video 4: 5 frames of 4 bytes, sampled 0,2,4
    assert [(f.media_id, f.frame_no) for f in frames] == [(4, 0), (4, 2), (4, 4)]
    assert frames[0].frame == bytes([0, 1, 2, 3])
    assert frames[1].frame == bytes([8, 9, 10, 11])


def test_media_stats_native(media):
    stats = {r.media_type: r for r in media_stats(media).collect()}
    assert stats["image"].n_items == 3
    assert stats["video"].total_bytes == 10 + 20
    assert stats["audio"].max_bytes == 14


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real_media(b"xx", "image")


def test_resize_halves_dims_and_stays_decodable(spark, sf_dir):
    from searchengine_spark.io import load_table
    from searchengine_spark.operators.multimodal import (
        decode_media,
        fake_media_from_documents,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = fake_media_from_documents(docs)
    before = {r.media_id: r for r in decode_media(media).collect()}
    after = {r.media_id: r for r in decode_media(resize_images(media)).collect()}
    assert set(after) == set(before)
    for mid, b in before.items():
        a = after[mid]
        assert a.dim_a == b.dim_a // 2 and a.dim_b == b.dim_b // 2
        # subsampled body: every 2nd byte -> ceil(n/2)
        assert a.n_bytes == (b.n_bytes + 1) // 2


def test_extract_features_feeds_similarity_ops(spark, sf_dir):
    """The feature output contract must plug straight into the
    embedding operators (cosine top-k over extracted features)."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        fake_media_from_documents,
    )
    from searchengine_spark.operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = extract_features(fake_media_from_documents(docs))
    rows = feats.collect()
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in rows)
    # determinism
    again = {r.media_id: r.feature for r in feats.collect()}
    assert all(again[r.media_id] == r.feature for r in rows)

    qv = feats.limit(1).select(F.col("feature").alias("qvec"))
    top = cosine_topk(
        feats, qv, k=5, id_col="media_id", vec_col="feature"
    ).collect()
    assert len(top) == 5
    assert top[0].cosine >= top[-1].cosine


def test_resize_passes_non_image_rows_through(spark):
    import pandas as pd

    from searchengine_spark.operators.multimodal import (
        encode_fake_media,
        resize_images,
    )

    rows = [
        (1, "image", encode_fake_media("image", 8, 6, b"abcdefgh")),
        (2, "audio", encode_fake_media("audio", 44100, 100, b"xyz")),
        (3, "video", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, media_type string, payload binary"
    )
    got = {r.media_id: r for r in resize_images(media).collect()}
    # image row resized
    assert got[1].payload[:2] == b"IM" and got[1].payload != rows[0][2]
    # audio row byte-identical, magic intact
    assert bytes(got[2].payload) == rows[1][2]
    # NULL stays NULL
    assert got[3].payload is None


def test_decode_oracles_survive_non_ascii_and_null_text(spark, tmp_path):
    """The ascii/'replace' encode (non-ASCII char -> '?' = 63, NULL
    text -> empty body) must be mirrored byte-for-byte by the DuckDB
    oracles — planted fixture with exactly the rows current testdata
    lacks, so a future drift can't silently split Spark and oracle."""
    import pandas as pd

    from searchengine_spark.operators.multimodal import ORACLES, QUERIES
    from tests.helpers import assert_matches_oracle

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["plain ascii text", "café naïve 中文!", None, ""],
            "lang": ["en"] * 4,
            "source": ["planted"] * 4,
            "n_chars": [16, 12, 0, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    for name in ("mm_media_decode_stats", "mm_png_decode_stats"):
        assert_matches_oracle(
            QUERIES[name](spark, str(tmp_path)), ORACLES[name], str(tmp_path), name
        )


def test_sample_frames_real_avi_container(spark):
    """sample_frames demuxes REAL RIFF/AVI payloads (codecs.demux_avi)
    and samples every_nth frame; corrupt containers are skipped, fake
    'VI'-header payloads still work side by side."""
    from searchengine_spark.operators.codecs import encode_avi
    from searchengine_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_fake_media,
        sample_frames,
    )

    frames = [f"frame-{i}".encode() for i in range(6)]
    avi = encode_avi(frames, width=32, height=32)
    fake = encode_fake_media("video", 4, 3, b"abcdefghijkl")  # 4 frames x 3 bytes
    corrupt = b"RIFF\x08\x00\x00\x00AVI " + b"\xff" * 4
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi)), (2, "video", bytearray(fake)),
         (3, "video", bytearray(corrupt))],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(media, every_nth=2).collect()
    got = sorted((r.media_id, r.frame_no, bytes(r.frame)) for r in rows)
    assert got == [
        (1, 0, b"frame-0"), (1, 2, b"frame-2"), (1, 4, b"frame-4"),
        (2, 0, b"abc"), (2, 2, b"ghi"),
    ]


def test_box2_resize_exact_on_planted_gradient(spark):
    """8x8 gradient 0..63 -> each 2x2 block average is exact integer
    arithmetic; verify the decoded 4x4 against a hand computation."""
    import numpy as np

    from searchengine_spark.operators.codecs import decode_png, encode_png
    from searchengine_spark.operators.multimodal import resize_media_box2

    src = np.arange(64, dtype=np.uint8).reshape(8, 8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(src)))],
        "media_id bigint, media_type string, payload binary",
    )
    out = resize_media_box2(media).collect()
    assert len(out) == 1
    w, h, c, arr = decode_png(bytes(out[0]["payload"]))
    assert (w, h, c) == (4, 4, 1)
    expect = (
        src.astype(np.int64).reshape(4, 2, 4, 2).sum(axis=(1, 3)) // 4
    ).astype(np.uint8)
    assert np.array_equal(arr[:, :, 0], expect)


def test_box2_resize_passes_through_non_images(spark):
    """NULL, non-image, and malformed payloads survive untouched."""
    from searchengine_spark.operators.multimodal import resize_media_box2

    rows = [
        (1, "audio", bytearray(b"RIFFjunk")),
        (2, "image", None),
        (3, "image", bytearray(b"not a png at all")),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, media_type string, payload binary"
    )
    got = {r["media_id"]: r["payload"] for r in resize_media_box2(media).collect()}
    assert bytes(got[1]) == b"RIFFjunk"
    assert got[2] is None
    assert bytes(got[3]) == b"not a png at all"


def test_wav_features_planted_exact(spark):
    """'A@?@' -> samples (1,-0,...): verify energy/ZCR by hand.
    codes: A=65->256, @=64->0, ?=63->-256, B=66->512."""
    from searchengine_spark.operators.multimodal import (
        wav_features,
        wav_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(1, "A?B?A?B?"), (2, None), (3, "@@@@@@@@")],
        "doc_id bigint, text string",
    )
    got = {
        r["media_id"]: r
        for r in wav_features(wav_media_from_documents(docs)).collect()
    }
    # doc 1: samples alternate 256,-256,512,-256,... -> 7 sign flips,
    # energy = 256^2*2 + 256^2*... compute: [256,-256,512,-256,256,-256,512,-256]
    s = [256, -256, 512, -256, 256, -256, 512, -256]
    assert got[1]["n_samples"] == 8
    assert got[1]["n_windows"] == 1
    assert got[1]["total_energy"] == sum(v * v for v in s)
    assert got[1]["zero_crossings"] == 7
    # NULL text -> single '?' sample: no window, no crossings
    assert (got[2]["n_samples"], got[2]["n_windows"]) == (1, 0)
    assert got[2]["total_energy"] == 0
    # all '@' -> all-zero samples: zero energy, zero crossings
    assert got[3]["total_energy"] == 0 and got[3]["zero_crossings"] == 0


def test_resize_upscale_replicates_and_round_trips(spark):
    from searchengine_spark.operators.multimodal import (
        decode_media,
        encode_fake_media,
        resize_images,
    )

    payload = encode_fake_media("image", 4, 4, bytes(range(16)))
    media = spark.createDataFrame(
        [(1, "image", payload)], "media_id long, media_type string, payload binary"
    )
    up = {r.media_id: r for r in resize_images(media, scale_num=2, scale_den=1).collect()}
    w, h = up[1].payload[2:10][:4], up[1].payload[2:10][4:]
    body = bytes(up[1].payload[10:])
    assert int.from_bytes(w, "big") == 8 and int.from_bytes(h, "big") == 8
    # nearest-neighbor 2x: every source byte appears twice, in order
    assert body == bytes(b for v in range(16) for b in (v, v))
    # and the result still decodes through the normal path
    dec = decode_media(spark.createDataFrame(
        [(1, "image", bytes(up[1].payload))],
        "media_id long, media_type string, payload binary",
    )).collect()[0]
    assert (dec.dim_a, dec.dim_b) == (8, 8)


def test_mjpeg_avi_pixel_roundtrip(spark):
    """Non-constant MJPEG frames through the full video pipeline:
    mux real baseline JPEGs into an AVI, demux + decode, and check
    dims plus per-frame mean against a direct decode of the same
    JPEG bytes (the lossy codec is deterministic, so the in-Spark
    decode must equal the local one bit-for-bit)."""
    import numpy as np

    from searchengine_spark.operators.codecs import encode_avi
    from searchengine_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from searchengine_spark.operators.multimodal import (
        decode_frame_pixels,
        sample_frames,
    )

    rng = np.random.RandomState(7)
    frames = [
        encode_jpeg(rng.randint(0, 256, size=(16, 24), dtype=np.uint8).astype(np.uint8))
        for _ in range(5)
    ]
    expected = {}
    for k in range(0, 5, 2):  # every_nth=2 -> frames 0, 2, 4
        w, h, px = decode_jpeg(frames[k])
        expected[k] = (w, h, float(px.mean()))

    avi = encode_avi(frames, width=24, height=16)
    media = spark.createDataFrame(
        [(1, "video", bytearray(avi))],
        "media_id bigint, media_type string, payload binary",
    )
    rows = decode_frame_pixels(sample_frames(media, every_nth=2)).collect()
    got = {r.frame_no: (r.width, r.height, r.mean_pixel) for r in rows}
    assert set(got) == set(expected)
    for k, (w, h, m) in expected.items():
        assert got[k][0] == w and got[k][1] == h
        assert got[k][2] == pytest.approx(m, abs=1e-9)


def test_decode_frame_pixels_poison_frame_yields_zero_row(spark):
    from searchengine_spark.operators.multimodal import decode_frame_pixels

    frames = spark.createDataFrame(
        [(1, 0, bytearray(b"\xff\xd8garbage"))],
        "media_id bigint, frame_no int, frame binary",
    )
    (row,) = decode_frame_pixels(frames).collect()
    assert (row.width, row.height, row.mean_pixel) == (0, 0, 0.0)
