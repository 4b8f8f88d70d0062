"""Tests for the multimodal plumbing: schema, mapInPandas batching,
deterministic fake decode, and the explicit stub boundary."""

import pytest

from bht_etl_app_spark.operators import image_features, synth_media_from_documents
from bht_etl_app_spark.operators.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    fake_image_decode,
    frame_sample_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s1"), (2, "a much longer document body", "en", "s2")],
        "doc_id long, text string, lang string, source string",
    )
    return synth_media_from_documents(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "content", "mime", "meta",
    ]
    row = media.orderBy("media_id").first()
    assert bytes(row["content"]) == b"hello world"
    assert row["kind"] == "image"


def test_image_features_matches_decode_fn(media):
    got = {r["media_id"]: r for r in image_features(media).collect()}
    exp1 = fake_image_decode(b"hello world")
    assert got[1]["width"] == exp1["width"]
    assert got[1]["height"] == exp1["height"]
    assert got[1]["n_bytes"] == len(b"hello world")
    assert got[1]["mean_intensity"] == pytest.approx(exp1["mean_intensity"], abs=1e-6)
    assert image_features(media).schema == IMAGE_FEATURES_SCHEMA


def test_image_features_repartition(media):
    df = image_features(media, repartition_to=2)
    assert df.count() == 2


def test_frame_sample_is_stub(spark, media):
    # schema is declared even though decode is stubbed
    df = frame_sample_stub(media)
    assert [f.name for f in df.schema.fields] == ["media_id", "frame_idx", "frame"]


def test_resize_images_shapes(spark):
    from bht_etl_app_spark.operators.multimodal import (
        resize_images,
        synth_media_from_documents,
    )
    from bht_etl_app_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    out = resize_images(synth_media_from_documents(docs), width=8, height=4).collect()
    assert len(out) == 20
    for r in out:
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["content"]) == 32  # truncated/padded to w*h exactly


def test_audio_features_empty_without_audio_rows(spark):
    from bht_etl_app_spark.operators.multimodal import (
        audio_features,
        synth_media_from_documents,
    )
    from bht_etl_app_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    media = synth_media_from_documents(docs)  # kind='image' only
    assert audio_features(media).count() == 0


def test_audio_features_deterministic(spark):
    from bht_etl_app_spark.operators.multimodal import audio_features, fake_audio_decode

    media = spark.createDataFrame(
        [(1, "audio", b"abcd" * 100, "audio/wav", "{}")],
        "media_id long, kind string, content binary, mime string, meta string",
    )
    row = audio_features(media).collect()[0]
    exp = fake_audio_decode(b"abcd" * 100)
    assert row["n_bytes"] == exp["n_bytes"]
    assert row["duration_s"] == exp["duration_s"]
    assert row["rms"] == exp["rms"]
