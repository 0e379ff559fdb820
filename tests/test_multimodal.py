"""Multimodal plumbing: binary packing, Arrow-batched kernels, and the
feature-vector handoff into the similarity operators."""

import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
    similarity as S,
)
from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    decode_image_pixels,
    decode_pixels,
    encode_bmp,
    encode_ppm,
    extract_features,
    pack_blob,
    synthesize_images,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    return pack_blob(T(spark, sf_dir, "documents"), "text", "doc_id").cache()


def test_pack_blob_metadata(spark, sf_dir, blobs):
    row = blobs.filter(F.col("doc_id") == 0).collect()[0]
    assert bytes(row.payload).decode("utf-8")  # round-trippable
    assert row.meta.n_bytes == len(bytes(row.payload))
    assert row.meta.media_type == "text/plain"


def test_decode_meta_deterministic_fake(spark, blobs):
    out = decode_image_meta(blobs).collect()
    for r in out:
        assert r.width == (r.n_bytes * 7919) % 1024 + 16
        assert r.height == (r.n_bytes * 104729) % 1024 + 16
        assert r.channels == 3


def test_extract_features_shape_and_norm(spark, blobs):
    feats = extract_features(blobs)
    rows = feats.collect()
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    # normalized byte histogram sums to ~1
    for r in rows[:10]:
        assert abs(sum(r.feature) - 1.0) < 1e-3


def test_features_feed_similarity_search(spark, blobs):
    """The extracted array<float> plugs straight into the similarity
    tier — the full multimodal → embedding → ANN pipeline."""
    feats = extract_features(blobs)
    queries = feats.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("feature").alias("embedding")
    )
    corpus = feats.select(
        F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    top = S.brute_force_topk(corpus, queries, k=1)
    got = {r.query_id: r.neighbor_id for r in top.collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # self is the nearest neighbor


def test_ppm_roundtrip_byte_pin():
    """encode_ppm → decode_pixels is the identity, and the encoded
    container is byte-pinned (2×2 RGB test card)."""
    import numpy as np

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]], dtype=np.uint8
    )
    payload = encode_ppm(px)
    assert payload == b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9]
    )
    assert (decode_pixels(payload) == px).all()


def test_ppm_decode_handles_comments():
    import numpy as np

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + px.tobytes()
    assert (decode_pixels(payload) == px).all()


def test_bmp_roundtrip_byte_pin():
    """encode_bmp → decode_pixels is the identity across a non-multiple
    -of-4 row width (3 px → 9 bytes → 3 pad bytes), and the header is
    byte-pinned (bottom-up, BGR, BI_RGB)."""
    import numpy as np

    px = (np.arange(2 * 3 * 3, dtype=np.uint8) * 7 % 256).reshape(2, 3, 3)
    payload = encode_bmp(px)
    assert payload[:2] == b"BM"
    assert payload[10] == 54  # pixel data offset
    assert int.from_bytes(payload[28:30], "little") == 24  # bpp
    assert len(payload) == 54 + 2 * 12  # 2 rows × (9 data + 3 pad)
    assert (decode_pixels(payload) == px).all()


def test_decode_image_pixels_spark_kernel(spark):
    """The real decode over mapInPandas: synthesized PPM (even id) and
    BMP (odd id) payloads decode back to the exact space-padded text
    raster — byte-pinned per row."""
    docs = spark.createDataFrame(
        [(0, "A" * 50), (1, "xyz"), (2, "")], "doc_id long, text string"
    )
    blobs = synthesize_images(docs)
    fmts = {r.doc_id: r.fmt for r in blobs.collect()}
    assert fmts == {0: "ppm", 1: "bmp", 2: "ppm"}
    out = {r.doc_id: r for r in decode_image_pixels(blobs).collect()}
    assert (out[0].width, out[0].height, out[0].channels) == (16, 2, 3)
    assert bytes(out[0].pixels) == b"A" * 50 + b" " * 46
    assert bytes(out[1].pixels) == b"xyz" + b" " * 45
    assert bytes(out[2].pixels) == b" " * 48  # empty doc → 1 blank row


def test_decode_rejects_unknown_container():
    with pytest.raises(ValueError):
        decode_pixels(b"GIF89a....")


def test_sample_frames_segments_and_bytes(spark):
    """1→N explosion arithmetic AND payload slicing: a 600-byte doc at
    (256-byte frames, stride 2, max 4) yields frames 0 and 2 with the
    right offsets, lengths, and exact byte content."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
        pack_blob,
        sample_frames,
    )

    text = "".join(chr(65 + (i % 26)) for i in range(600))
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    out = {
        (r.doc_id, r.frame_idx): r
        for r in sample_frames(pack_blob(df, "text", "doc_id")).collect()
    }
    assert set(out) == {(1, 0), (1, 2), (2, 0)}
    f0, f2 = out[(1, 0)], out[(1, 2)]
    assert (f0.frame_off, f0.frame_len) == (0, 256)
    assert (f2.frame_off, f2.frame_len) == (512, 88)
    assert bytes(f0.frame_payload) == text.encode()[0:256]
    assert bytes(f2.frame_payload) == text.encode()[512:600]
    assert out[(2, 0)].frame_len == 0  # empty payload → one empty frame


def test_resize_fits_and_preserves_aspect(spark):
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
        resize_image_meta,
    )

    df = spark.createDataFrame(
        [(1, 1024, 512), (2, 100, 50), (3, 300, 900), (4, 1, 5000)],
        "doc_id long, width int, height int",
    )
    got = {r.doc_id: (r.new_width, r.new_height) for r in resize_image_meta(df).collect()}
    assert got[1] == (256, 128)        # downscale, aspect kept exactly
    assert got[2] == (100, 50)         # already fits: untouched
    assert got[3] == (85, 256)         # floor division on the short side
    assert got[4] == (1, 256)          # degenerate aspect clamps to >= 1
    for w, h in got.values():
        assert w <= 256 and h <= 256


def test_documents_fixture_is_ascii(spark, sf_dir):
    """The frame_sample/image_resize oracles slice text with VARCHAR
    substring (character offsets) while the engine slices utf-8 bytes;
    they agree only while the documents fixture is pure ASCII. This
    test names that assumption if a future fixture regeneration adds
    multibyte characters (then: switch the oracles to byte-safe
    slicing or the kernel to character segmentation)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_multibyte = d.filter(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert n_multibyte == 0


def test_map_in_arrow_features_equal_pandas_tier(spark, blobs):
    """extract_features_arrow (mapInArrow, no pandas materialization)
    must equal extract_features (mapInPandas) row-for-row — same
    kernel math, different Arrow plumbing tier."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
        extract_features_arrow,
    )

    a = {r.doc_id: r.feature for r in extract_features(blobs).collect()}
    b = {r.doc_id: r.feature for r in extract_features_arrow(blobs).collect()}
    assert a == b


def test_wave_synthesis_and_decode_hand_pinned(spark):
    """PCM16 round trip byte-pinned: 'AB' → sample 0x4241 = 16961;
    'ABCD' → samples [16961, 17475^(0x80<<8)=0x4443 xor high bit];
    odd-length pads a zero byte; empty text → zero samples."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
        decode_wave_features,
        synthesize_wave,
    )

    docs = spark.createDataFrame(
        [(0, "AB"), (1, "ABCD"), (2, "A"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decode_wave_features(synthesize_wave(docs)).collect()}
    # "AB": one sample 0x4241 = 16961 (positive), no crossings
    assert (out[0].n_samples, out[0].peak, out[0].zero_crossings) == (1, 16961, 0)
    # "ABCD": sample0 = 16961; sample1 high byte 0x44^0x80=0xC4 →
    # 0xC443 = 50243 - 65536 = -15293 → one sign change
    assert (out[1].n_samples, out[1].peak, out[1].zero_crossings) == (2, 16961, 1)
    assert round(out[1].rms, 4) == round((16961**2 / 2 + 15293**2 / 2) ** 0.5, 4)
    # "A" pads to (0x41, 0x00) → sample 65
    assert (out[2].n_samples, out[2].peak) == (1, 65)
    assert (out[3].n_samples, out[3].rms, out[3].peak) == (0, 0.0, 0)


def test_video_synthesis_and_frame_decode(spark):
    """Multi-frame container round trip: 200 bytes → 3 PPM frames
    (96+96+8-pad); frames decode back to the exact text slices."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
        decode_video_frames,
        synthesize_video,
    )

    text = "".join(chr(65 + i % 26) for i in range(200))
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = sorted(
        decode_video_frames(synthesize_video(docs)).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    assert all((r.width, r.height) == (16, 2) for r in out)
    raw = text.encode()
    assert bytes(out[0].pixels) == raw[0:96]
    assert bytes(out[1].pixels) == raw[96:192]
    assert bytes(out[2].pixels) == raw[192:200] + b" " * 88
