"""Multimodal plumbing: synthesis, Arrow-batched decode, frame sampling
(operators/multimodal.py). Codecs are stubbed; the Spark plumbing is real."""

import pytest
from pyspark.sql import functions as F

from wifi_location_data_pipeline_spark.operators.multimodal import (
    decode_media,
    decode_payload,
    sample_frames,
    synthesize_media_from_documents,
)
from wifi_location_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media_from_documents(load_table(spark, sf_dir, "documents")).cache()


def test_media_schema_and_determinism(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "format", "metadata", "payload",
    ]
    # payload column is LAST → metadata-only scans prune the blob column
    assert media.schema.fields[-1].dataType.simpleString() == "binary"
    counts = {r["media_type"]: r["n"] for r in
              media.groupBy("media_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}


def test_decode_media_roundtrip(media):
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == media.count()
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.select("media_id", "payload").collect()}
    import hashlib

    some = sorted(by_id)[:5]
    for mid in some:
        assert by_id[mid]["byte_size"] == len(src[mid]["payload"])
        assert by_id[mid]["content_sha256"] == hashlib.sha256(src[mid]["payload"]).hexdigest()
        assert len(by_id[mid]["feature"]) == 8
        assert all(0.0 <= v < 1.0 for v in by_id[mid]["feature"])
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in decode_media(media).collect()}
    assert all(again[m] == by_id[m]["feature"] for m in some)


def test_decode_payload_stub_gates_real_formats():
    with pytest.raises(NotImplementedError):
        decode_payload("png", "image", b"\x89PNG")


def test_sample_frames_shape(media):
    frames = sample_frames(media, every_nth=10)
    rows = frames.collect()
    assert rows, "video assets must produce sampled frames"
    assert all(r["frame_no"] % 10 == 0 for r in rows)
    assert all(r["frame_no"] < r["n_frames"] for r in rows)
    # payload never enters the exploded plan
    assert "payload" not in frames.columns
