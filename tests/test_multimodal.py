"""Multimodal plumbing tests: Arrow batch shapes, corrupt input, empty
partitions, round-trips, and the real-codec stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import multimodal as M


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world this is a document"), (2, "short"), (3, "x" * 100)],
        "doc_id long, text string",
    )


def test_smf_synthesis_is_valid(docs):
    imgs = M.attach_fake_image(docs)
    rows = imgs.collect()
    for r in rows:
        assert bytes(r.content[:2]) == M.SMF_MAGIC
        assert len(r.content) == M.SMF_HEADER_LEN + r.media_meta.width * r.media_meta.height
        assert r.media_type == "image/x-smf"


def test_decode_matches_metadata(docs):
    imgs = M.attach_fake_image(docs)
    decoded = {r.doc_id: r for r in M.decode_image(imgs).collect()}
    for r in imgs.collect():
        d = decoded[r.doc_id]
        assert (d.width, d.height) == (r.media_meta.width, r.media_meta.height)
        assert d.n_pixels == d.width * d.height
        assert d.pixel_sum == sum(bytes(r.content[M.SMF_HEADER_LEN:]))


def test_corrupt_media_dropped_not_crashed(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTSMF-garbage")), (2, bytearray(b"S"))],
        "doc_id long, content binary",
    )
    assert M.decode_image(df).count() == 0


def test_empty_partitions_survive_map_in_pandas(spark, docs):
    # 64 partitions for 3 rows -> most partitions are empty
    imgs = M.attach_fake_image(docs).repartition(64)
    assert M.decode_image(imgs).count() == 3


def test_downsample_roundtrip_decodable(docs):
    imgs = M.attach_fake_image(docs)
    small = M.decode_image(M.downsample_image(imgs, factor=2))
    meta = {r.doc_id: r.media_meta for r in imgs.collect()}
    for r in small.collect():
        assert r.width == max(1, meta[r.doc_id].width // 2)
        assert r.height == max(1, meta[r.doc_id].height // 2)


def test_audio_stats_closed_form(docs):
    audio = M.attach_fake_audio(docs)
    stats = {r.doc_id: r for r in M.audio_stats(audio).collect()}
    for doc_id, text in [(1, "hello world this is a document"), (2, "short")]:
        n = 50 + len(text) % 100
        expected = sum(abs((doc_id * 13 + i * 7) % 256 - 128) for i in range(n))
        assert stats[doc_id].n_samples == n
        assert stats[doc_id].abs_amplitude_sum == expected


def test_real_decoder_is_gated_stub(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, content binary")
    with pytest.raises(NotImplementedError):
        M.decode_image_real(df)
