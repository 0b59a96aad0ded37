"""Multimodal plumbing: binary columns + Arrow-batched feature extraction.
The decode kernel is stubbed (no image libs in this env) — what's tested is
the real Spark machinery: schema, mapInPandas batch shape, determinism,
metadata ops staying JVM-side."""

import pytest

from cassandra_data_migrator_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_metadata,
    decode_image,
    extract_features,
    filter_by_mime,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (i, "image/png" if i % 2 == 0 else "audio/wav", bytes([i % 256] * (100 + i)), 10, 10, None)
        for i in range(50)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_metadata_stays_jvm_side(media_df):
    out = attach_metadata(media_df)
    sizes = {r.media_id: r.n_bytes for r in out.select("media_id", "n_bytes").collect()}
    assert sizes[0] == 100 and sizes[49] == 149


def test_mime_filter(media_df):
    assert filter_by_mime(media_df, ["image/png"]).count() == 25


def test_feature_extraction_batch_shape(media_df):
    feats = extract_features(media_df, dim=8, use_fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert feats.schema.fieldNames() == ["media_id", "mime", "feat_dim", "feat_norm"]
    assert all(r.feat_dim == 8 and len(r.feat_norm) == 32 for r in rows)


def test_feature_extraction_deterministic(media_df):
    a = {r.media_id: r.feat_norm for r in extract_features(media_df, use_fake=True).collect()}
    b = {r.media_id: r.feat_norm for r in extract_features(media_df, use_fake=True).collect()}
    assert a == b


def test_frame_sampling(media_df):
    assert sample_frames(media_df, 10).count() == 5
