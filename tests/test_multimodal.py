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
    extract_features,
    frame_sample_stub,
    pack_blob,
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


def test_codec_stubs_marked(spark):
    with pytest.raises(NotImplementedError):
        decode_image_pixels()
    with pytest.raises(NotImplementedError):
        frame_sample_stub()
