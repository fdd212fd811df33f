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


def _smf(pixels, w, h):
    import struct as _s

    from real_time_data_pipeline_spark.operators.multimodal import SMF_MAGIC

    return SMF_MAGIC + _s.pack(">II", w, h) + bytes(pixels)


def test_image_phash_bit_exact_and_near_pairs(spark):
    from real_time_data_pipeline_spark.operators.multimodal import (
        image_phash,
        phash_near_pairs,
    )

    # 8x8 single-pixel cells -> aHash bits are just pixel > mean.
    a = [255] * 32 + [0] * 32          # bits: 32 ones then 32 zeros
    b = [0] + [255] * 31 + [0] * 32    # = a with bit 0 flipped
    c = [0] * 32 + [255] * 32          # disjoint: hamming 64 from a
    rows = [
        (1, _smf(a, 8, 8)),
        (2, _smf(b, 8, 8)),
        (3, _smf(c, 8, 8)),
        (4, _smf(a, 8, 8)),  # exact dup of 1 -> collapsed, not paired
        (5, b"XX"),          # corrupt -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    sigs = {r["doc_id"]: r for r in image_phash(df).collect()}
    assert set(sigs) == {1, 2, 3, 4}
    # Bit-exact: a = 32 high bits set.
    assert sigs[1]["phash"] == int.from_bytes(
        bytes([0xFF] * 4 + [0x00] * 4), "big", signed=True
    )
    assert sigs[1]["phash"] == sigs[4]["phash"]
    assert bin((sigs[1]["phash"] ^ sigs[2]["phash"]) & (2**64 - 1)).count("1") == 1
    pairs = phash_near_pairs(df, max_hamming=3).collect()
    # Only (1,2) at hamming 1; the exact dup 4 folds into rep 1 (n_a=2).
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["rep_a"], p["rep_b"], p["hamming"]) == (1, 2, 1)
    assert p["n_a"] == 2 and p["n_b"] == 1
    spark.catalog.clearCache()


def test_phash_non_multiple_grid_pools_deterministically(spark):
    from real_time_data_pipeline_spark.operators.multimodal import image_phash

    # 10x5 image (non-multiple of 8): pooling must still emit 64 bits
    # and be stable across partitionings.
    pix = [(i * 37) % 256 for i in range(50)]
    df1 = spark.createDataFrame(
        [(7, _smf(pix, 10, 5))], "doc_id long, content binary"
    )
    df8 = df1.repartition(8)
    h1 = image_phash(df1).collect()[0]["phash"]
    h8 = image_phash(df8).collect()[0]["phash"]
    assert h1 == h8


def test_keyframe_select_picks_high_delta_frames(spark):
    from real_time_data_pipeline_spark.operators.multimodal import (
        keyframe_select,
    )

    # 4 frames of 4 bytes: constant, constant (delta 0), jump (delta
    # 100), constant again (delta 0) -> keyframes = frame 0 (shot
    # start) and frame 2 (the jump), in index order.
    content = bytes(
        [10, 10, 10, 10] + [10, 10, 10, 10] + [110, 110, 110, 110]
        + [110, 110, 110, 110]
    )
    df = spark.createDataFrame(
        [(1, bytearray(content))], "doc_id long, content binary"
    )
    row = keyframe_select(df, frame_bytes=4, top_n=2).collect()[0]
    assert row["n_frames"] == 4
    assert row["keyframe_idxs"] == "0,2"
    assert row["max_delta"] == 100
    # single-frame blob: one keyframe, delta 0
    df1 = spark.createDataFrame(
        [(2, bytearray(bytes([1, 2, 3, 4])))], "doc_id long, content binary"
    )
    r1 = keyframe_select(df1, frame_bytes=4, top_n=2).collect()[0]
    assert (r1["n_frames"], r1["keyframe_idxs"], r1["max_delta"]) == (1, "0", 0)


def test_audio_active_segments_islands(spark):
    """Hand-built PCM: active/inactive frame runs produce the expected
    island count and longest run; all-silent track yields zero
    segments."""
    import numpy as np

    from real_time_data_pipeline_spark.operators.multimodal import (
        audio_active_segments,
    )

    def pcm(frames):  # each frame: 'A' (active, amp 127) or 's' (silent, 0)
        out = []
        for f in frames:
            amp = 127 if f == "A" else 0
            out.extend([(amp + 128) % 256] * 16)
        return bytes(bytearray(out))

    rows = [
        (1, pcm("AAssAsss")),   # runs: AA, A -> 2 segments, longest 2
        (2, pcm("ssss")),       # silent
        (3, pcm("AAAA")),       # one full run
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["doc_id"]: (
            r["n_frames"], r["n_active"], r["n_segments"], r["longest_segment"]
        )
        for r in audio_active_segments(df).collect()
    }
    assert got == {1: (8, 3, 2, 2), 2: (4, 0, 0, 0), 3: (4, 4, 1, 4)}


def test_image_tiles_geometry_and_pooling(spark):
    """4x3 image, 2x2 patches: 2x1 grid (bottom row cropped), per-tile
    max over the 4 source pixels."""
    import struct as _struct

    from real_time_data_pipeline_spark.operators.multimodal import (
        SMF_HEADER_LEN, SMF_MAGIC, image_tiles,
    )

    w, h = 4, 3
    pixels = bytes(range(w * h))  # 0..11 row-major
    content = SMF_MAGIC + _struct.pack(">II", w, h) + pixels
    df = spark.createDataFrame(
        [(7, content)], "doc_id long, content binary"
    )
    r = image_tiles(df, patch=2).collect()[0]
    assert (r["n_tiles_x"], r["n_tiles_y"], r["n_tiles"]) == (2, 1, 2)
    # tile (0,0): pixels {0,1,4,5} -> 5 ; tile (1,0): {2,3,6,7} -> 7
    assert r["tile_max_sum"] == 5 + 7
