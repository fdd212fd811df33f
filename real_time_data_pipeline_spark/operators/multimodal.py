"""Multimodal columns for training-data pipelines (north-star tier).

Media travel as opaque ``binary`` columns plus typed metadata — the
standard lakehouse shape for image/audio/video at 100 TB: the bytes stay
in parquet, metadata is queryable, and per-item compute runs as
Arrow-batched ``mapInPandas`` (one Python worker per partition, columnar
transfer, no per-row pickling).

The container has no image/audio codecs, so REAL-format decoding (JPEG /
WAV / MP4) is stubbed behind ``NotImplementedError`` with an import-try
(``decode_image_real``).  Everything Spark-side — schema, partitioning,
UDF signatures, batch shapes — is real and exercised end-to-end against a
deterministic synthetic media format ("SMF"):

    SMF layout (big-endian):
      magic   2 bytes  0x53 0x4D ("SM")
      width   4 bytes  uint32
      height  4 bytes  uint32
      payload width*height bytes (one byte per pixel)

Synthesis is closed-form from (doc_id, text length), so a SQL oracle can
verify the decode round-trip without parsing bytes: if the mapInPandas
batch handling mangled offsets/schema, the decoded values would diverge.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import cache
from pyspark.sql import types as T

SMF_MAGIC = b"SM"
SMF_HEADER_LEN = 10

# ------------------------------------------------------------ synthesis

def attach_fake_image(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
) -> DataFrame:
    """Derive a deterministic SMF image per row.

    width  = 4 + (len(text) mod 29)
    height = 4 + (7*len(text) mod 23)
    pixel[i] = (doc_id*31 + i*17) mod 256

    Payload bytes are built numpy-side inside mapInPandas: only
    (id, text length) crosses the Arrow boundary, and each row's pixels
    come from one vectorized arange — an earlier JVM-side variant built
    per-pixel hex strings through interpreted nested HOFs, which
    Catalyst's project-collapse re-evaluates per element (~1,000
    interpreted lambda evals per row; the repo's PLANS.md lesson).
    ``media_type`` and metadata mirror how a real ingest would carry
    MIME type + probe data alongside the bytes.

    Pass ``len_col`` when the caller already computed the text length
    (e.g. before a fan-out repartition, so the exchange carries 12
    bytes/row instead of the full text — projections don't push below an
    explicit repartition)."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    src = (
        df.select(F.col(id_col), F.col(len_col).alias("n"))
        if len_col
        else df.select(F.col(id_col), F.length(text_col).alias("n"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, ws, hs = [], [], [], []
            for doc_id, n in zip(pdf[id_col], pdf["n"]):
                n = int(n)
                w, h = 4 + n % 29, 4 + (7 * n) % 23
                pix = (
                    (int(doc_id) * 31 + np.arange(w * h, dtype=np.int64) * 17)
                    % 256
                ).astype(np.uint8)
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                outs.append(
                    SMF_MAGIC + struct.pack(">II", w, h) + pix.tobytes()
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content": pd.Series(outs, dtype=object),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return src.mapInPandas(
        gen, f"{id_col} {id_t}, content binary, width int, height int"
    ).select(
        F.col(id_col),
        "content",
        F.lit("image/x-smf").alias("media_type"),
        F.struct("width", "height").alias("media_meta"),
    )


# -------------------------------------------------------------- decode

IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def decode_image(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode SMF images with Arrow-batched ``mapInPandas``.

    The iterator-of-DataFrames signature is the scale-correct shape: one
    Python worker per partition streams batches, memory bounded by the
    Arrow batch size, never by partition size.  Zero-row partitions yield
    no batches and must not crash — handled naturally by the loop."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns, sums = [], [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = bytes(buf)
                if b[:2] != SMF_MAGIC or len(b) < SMF_HEADER_LEN:
                    continue  # undecodable → dropped, like a corrupt JPEG
                w, h = struct.unpack(">II", b[2:SMF_HEADER_LEN])
                payload = b[SMF_HEADER_LEN : SMF_HEADER_LEN + w * h]
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                ns.append(w * h)
                sums.append(sum(payload))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(ns, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(decode, IMAGE_DECODE_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Decode real image formats (JPEG/PNG).  STUB: the execution
    container ships no codec libraries; the Spark-side plumbing is
    identical to :func:`decode_image` — swap the parser inside the
    mapInPandas closure."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not available "
            "in this environment; use decode_image (SMF) for the tested "
            "plumbing path"
        ) from e
    raise NotImplementedError("wire PIL.Image.open into the decode closure")


# ------------------------------------------------------------ transform

def downsample_image(
    df: DataFrame, factor: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Resize (nearest-neighbor downsample by `factor`) inside
    mapInPandas, re-encoding valid SMF output — a transform whose output
    is itself decodable, proving byte-level round-trips survive the Arrow
    boundary."""

    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = bytes(buf)
                if b[:2] != SMF_MAGIC:
                    continue
                w, h = struct.unpack(">II", b[2:SMF_HEADER_LEN])
                nw, nh = max(1, w // factor), max(1, h // factor)
                # numpy strided view: pixel grid → every `factor`-th row
                # and column, cropped to the output size
                grid = np.frombuffer(
                    b, dtype=np.uint8, count=w * h, offset=SMF_HEADER_LEN
                ).reshape(h, w)
                small = grid[::factor, ::factor][:nh, :nw]
                ids.append(doc_id)
                outs.append(
                    SMF_MAGIC + struct.pack(">II", nw, nh) + small.tobytes()
                )
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "content": pd.Series(outs, dtype=object)})

    return df.mapInPandas(
        resize,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


# ---------------------------------------------------------------- audio

def attach_fake_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
) -> DataFrame:
    """Deterministic fake PCM track: n_samples = 50 + len(text) mod 100,
    sample[i] = (doc_id*13 + i*7) mod 256 − 128 (int8).

    Same mapInPandas-synthesis and ``len_col`` rationale as
    :func:`attach_fake_image`."""
    import numpy as np

    id_t = df.schema[id_col].dataType.simpleString()
    src = (
        df.select(F.col(id_col), F.col(len_col).alias("n"))
        if len_col
        else df.select(F.col(id_col), F.length(text_col).alias("n"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, ns = [], [], []
            for doc_id, n in zip(pdf[id_col], pdf["n"]):
                k = 50 + int(n) % 100
                samples = (
                    (int(doc_id) * 13 + np.arange(k, dtype=np.int64) * 7) % 256
                ).astype(np.uint8)
                ids.append(doc_id)
                ns.append(k)
                outs.append(samples.tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content": pd.Series(outs, dtype=object),
                    "n_samples": pd.Series(ns, dtype="int32"),
                }
            )

    return src.mapInPandas(
        gen, f"{id_col} {id_t}, content binary, n_samples int"
    ).select(
        F.col(id_col),
        "content",
        F.lit("audio/x-pcm8").alias("media_type"),
        F.struct("n_samples").alias("media_meta"),
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("abs_amplitude_sum", T.LongType()),
    ]
)


def audio_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over int8 PCM bytes — numpy-vectorized per Arrow
    batch (the pattern a real fbank/MFCC extractor would follow)."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, sums = [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                samples = np.frombuffer(bytes(buf), dtype=np.uint8).astype(
                    np.int64
                ) - 128
                ids.append(doc_id)
                ns.append(len(samples))
                sums.append(int(np.abs(samples).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "abs_amplitude_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(stats, AUDIO_STATS_SCHEMA)


# ---------------------------------------------------------------- video

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_first_bytes", T.StringType()),
    ]
)


def frame_sample(
    df: DataFrame, frame_bytes: int = 16, every: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Treat the payload as fixed-size frames and keep every k-th — the
    frame-sampling shape for video: whole blob in, per-frame records out.

    ``sampled_first_bytes`` is the comma-joined first byte of each kept
    frame (a string, not array<int>: the oracle compare canonicalizes via
    pandas, which cannot hash list cells, so top-level array columns are
    banned from oracle-checked outputs)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, ns, firsts = [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = bytes(buf)
                frames = [
                    b[o : o + frame_bytes]
                    for o in range(0, len(b) - frame_bytes + 1, frame_bytes)
                ]
                sampled = frames[::every]
                ids.append(doc_id)
                nf.append(len(frames))
                ns.append(len(sampled))
                firsts.append(",".join(str(f[0]) for f in sampled))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int32"),
                    "n_sampled": pd.Series(ns, dtype="int32"),
                    "sampled_first_bytes": pd.Series(firsts, dtype="string"),
                }
            )

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


# --------------------------------------------------- perceptual dedup

def image_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual hash (average-hash) per image: decode, average-pool the
    pixel grid to 8×8, emit bit (i,j) = cell mean > whole-image mean as a
    64-bit signature (plus its 16-hex rendering for band splits).  The
    image analogue of SimHash: visually-near images (resize, mild noise,
    re-encode) land within a few bits.  Pure integer/numpy math on the
    SMF pixels — deterministic, no codec dependency; swapping in a real
    decoder only changes the pixel-loading lines.

    The mean comparison is INTEGER-exact (cross-multiplied:
    ``cell_sum · n_pixels > total_sum · cell_count`` — no float division
    anywhere), so the signature is reproducible bit-for-bit in any
    engine with 64-bit integers; that is what backs the
    ``mm_phash_near_dup`` DuckDB oracle (round 6, mirroring the
    dedup_simhash portable-hash promotion).

    Arrow-batched mapInPandas; per-row cost is one vectorized pooling.
    Undecodable rows are dropped (corrupt-media rule shared with
    decode_image)."""
    import numpy as np

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = bytes(buf)
                if b[:2] != SMF_MAGIC or len(b) < SMF_HEADER_LEN:
                    continue
                w, h = struct.unpack(">II", b[2:SMF_HEADER_LEN])
                pix = np.frombuffer(
                    b, dtype=np.uint8, count=w * h, offset=SMF_HEADER_LEN
                ).reshape(h, w).astype(np.int64)
                # Average-pool to 8x8 via integer cell edges (floor
                # boundaries -- same grid every run).
                ye = np.linspace(0, h, 9).astype(np.int64)
                xe = np.linspace(0, w, 9).astype(np.int64)
                sums = np.empty((8, 8), dtype=np.int64)
                cnts = np.empty((8, 8), dtype=np.int64)
                for i in range(8):
                    for j in range(8):
                        blk = pix[ye[i]:max(ye[i + 1], ye[i] + 1),
                                  xe[j]:max(xe[j + 1], xe[j] + 1)]
                        sums[i, j] = blk.sum()
                        cnts[i, j] = blk.size
                total = int(pix.sum())
                npx = w * h
                bits = (
                    sums.ravel() * npx > total * cnts.ravel()
                ).astype(np.uint64)
                sig = np.uint64(0)
                for bit in bits:
                    sig = np.uint64(sig << np.uint64(1)) | bit
                ids.append(doc_id)
                sigs.append(np.int64(sig.astype(np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(sigs, dtype="int64"),
                }
            )

    return df.mapInPandas(hashes, f"{id_col} long, phash long").withColumn(
        "phash_hex", F.lpad(F.hex("phash"), 16, "0")
    )


def phash_near_pairs(
    images: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance —
    pigeonhole band join over DISTINCT signatures, the text-dedup recipe
    (exact first, then near) applied to media:

    1. collapse exact phash duplicates (synthetic corpora and re-crawls
       are full of them) to (signature, min-id representative, count) —
       this also defuses the quadratic blow-up a band join suffers when
       one bucket holds thousands of identical images;
    2. block join on (max_hamming+1) 16/(h+1)-hex blocks — any pair
       within budget shares one exact block — and verify with one
       ``bit_count(xor)``.

    Output: representative pairs (rep_a, rep_b, hamming, n_a, n_b);
    member counts let the caller weigh cluster mass without ever
    materializing member × member pairs.
    """
    nblocks = max_hamming + 1
    blk = 16 // nblocks
    sigs = (
        image_phash(images, id_col)
        .groupBy("phash", "phash_hex")
        .agg(
            F.min(id_col).alias("rep"),
            F.count("*").cast("bigint").alias("n_members"),
        )
    )
    sigs = cache.track(sigs)
    banded = sigs.select(
        "phash",
        "rep",
        "n_members",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_idx"),
                        F.substring(
                            F.col("phash_hex"), b * blk + 1, blk
                        ).alias("block"),
                    )
                    for b in range(nblocks)
                ]
            )
        ).alias("b"),
    ).select("phash", "rep", "n_members", "b.block_idx", "b.block")
    l = banded.select(
        "block_idx",
        "block",
        F.col("rep").alias("rep_a"),
        F.col("phash").alias("fp_a"),
        F.col("n_members").alias("n_a"),
    )
    r = banded.select(
        "block_idx",
        "block",
        F.col("rep").alias("rep_b"),
        F.col("phash").alias("fp_b"),
        F.col("n_members").alias("n_b"),
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        l.join(r, ["block_idx", "block"])
        .filter(F.col("rep_a") < F.col("rep_b"))
        .select("rep_a", "rep_b", "fp_a", "fp_b", "n_a", "n_b")
        .distinct()
        .withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("rep_a", "rep_b", "hamming", "n_a", "n_b")
    )


KEYFRAME_SCHEMA = (
    "doc_id long, n_frames int, n_keyframes int, keyframe_idxs string, "
    "max_delta int"
)


def keyframe_select(
    df: DataFrame,
    frame_bytes: int = 16,
    top_n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-aware keyframe selection: score each frame by its mean
    absolute byte-delta to the previous frame (the shot-boundary signal
    real pipelines compute from decoded luma planes) and keep the
    ``top_n`` highest-delta frames — the video twin of quality-aware
    image sampling, vs :func:`frame_sample`'s blind every-k-th.

    Same Arrow-batched whole-blob-in / summary-out shape as the other
    multimodal ops: the codec is the deterministic fake (real decode is
    env-stubbed in ``decode_image_real``); the Spark plumbing — schema,
    vectorized per-batch numpy, no per-row Python beyond the bounded
    per-doc frame loop — is the production shape.  Output indexes are a
    comma-joined string (top-level arrays are banned from oracle-checked
    outputs; see frame_sample).  Selection is deterministic: delta desc,
    frame index asc.
    """
    import numpy as np

    def select(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, nk, idxs, mx = [], [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                usable = (len(b) // frame_bytes) * frame_bytes
                frames = b[:usable].reshape(-1, frame_bytes).astype(np.int32)
                n = len(frames)
                if n > 1:
                    deltas = np.abs(np.diff(frames, axis=0)).mean(1)
                    # frame 0 is always a keyframe candidate with the
                    # score of its successor delta (shot start)
                    scores = np.concatenate(([deltas[0]], deltas))
                else:
                    scores = np.zeros(max(n, 0))
                order = np.lexsort((np.arange(n), -scores))[:top_n]
                keep = np.sort(order)
                ids.append(doc_id)
                nf.append(n)
                nk.append(len(keep))
                idxs.append(",".join(str(int(i)) for i in keep))
                mx.append(int(scores.max()) if n else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int32"),
                    "n_keyframes": pd.Series(nk, dtype="int32"),
                    "keyframe_idxs": pd.Series(idxs, dtype="string"),
                    "max_delta": pd.Series(mx, dtype="int32"),
                }
            )

    return df.mapInPandas(select, KEYFRAME_SCHEMA)


AUDIO_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_active", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("longest_segment", T.LongType()),
    ]
)


def audio_active_segments(
    df: DataFrame,
    frame_samples: int = 16,
    energy_threshold: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """VAD-shaped activity segmentation over int8 PCM bytes: the track
    is cut into ``frame_samples``-sample frames, a frame is ACTIVE when
    its summed |amplitude| exceeds ``energy_threshold``, and runs of
    active frames become segments — the speech/silence gating pass an
    audio-curation pipeline runs before transcription (here over the
    deterministic synthetic PCM; a real VAD swaps the energy rule for a
    model, the Spark plumbing — binary column in, Arrow-batched numpy
    per frame, integer summary out — is identical).

    Per-doc run-length work is sequential by nature and happens inside
    the Arrow batch (numpy diff on the active mask — no per-sample
    Python).  Trailing partial frames are dropped (standard framing).

    Returns (id, n_frames, n_active, n_segments, longest_segment).
    """
    import numpy as np

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, na, ns, lg = [], [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                samples = np.frombuffer(bytes(buf), dtype=np.uint8).astype(
                    np.int64
                ) - 128
                k = len(samples) // frame_samples
                frames = samples[: k * frame_samples].reshape(
                    k, frame_samples
                )
                energy = np.abs(frames).sum(axis=1)
                active = energy > energy_threshold
                # run-length encode the active mask
                if k and active.any():
                    edges = np.diff(active.astype(np.int8))
                    starts = np.where(edges == 1)[0] + 1
                    ends = np.where(edges == -1)[0] + 1
                    if active[0]:
                        starts = np.insert(starts, 0, 0)
                    if active[-1]:
                        ends = np.append(ends, k)
                    runs = ends - starts
                    n_seg, longest = len(runs), int(runs.max())
                else:
                    n_seg, longest = 0, 0
                ids.append(int(doc_id))
                nf.append(k)
                na.append(int(active.sum()))
                ns.append(n_seg)
                lg.append(longest)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int64"),
                    "n_active": pd.Series(na, dtype="int64"),
                    "n_segments": pd.Series(ns, dtype="int64"),
                    "longest_segment": pd.Series(lg, dtype="int64"),
                }
            )

    return df.mapInPandas(seg, AUDIO_SEGMENTS_SCHEMA)


IMAGE_TILES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tiles_x", T.IntegerType()),
        T.StructField("n_tiles_y", T.IntegerType()),
        T.StructField("n_tiles", T.LongType()),
        T.StructField("tile_max_sum", T.LongType()),
    ]
)


def image_tiles(
    df: DataFrame, patch: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """ViT-style patch extraction summary over SMF images: the image is
    cut into ``patch``×``patch`` tiles (edge remainders dropped — the
    standard crop-to-multiple), and per doc we emit the tile grid shape
    plus the integer sum of each tile's MAX pixel — a checksum that
    pins the exact tiling geometry AND per-tile pooling (the same
    reshape/pool numpy pattern a real patch embedder runs before the
    projection matmul).

    Arrow-batched mapInPandas; per-image work is one numpy reshape +
    amax, no per-pixel Python.
    """
    import numpy as np

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, txs, tys, ns, sums = [], [], [], [], []
            for doc_id, buf in zip(pdf[id_col], pdf["content"]):
                b = bytes(buf)
                if b[:2] != SMF_MAGIC or len(b) < SMF_HEADER_LEN:
                    continue
                w, h = struct.unpack(">II", b[2:SMF_HEADER_LEN])
                img = np.frombuffer(
                    b[SMF_HEADER_LEN : SMF_HEADER_LEN + w * h], dtype=np.uint8
                ).reshape(h, w)
                tx, ty = w // patch, h // patch
                crop = img[: ty * patch, : tx * patch]
                pooled = crop.reshape(ty, patch, tx, patch).max(axis=(1, 3))
                ids.append(int(doc_id))
                txs.append(tx)
                tys.append(ty)
                ns.append(tx * ty)
                sums.append(int(pooled.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_tiles_x": pd.Series(txs, dtype="int32"),
                    "n_tiles_y": pd.Series(tys, dtype="int32"),
                    "n_tiles": pd.Series(ns, dtype="int64"),
                    "tile_max_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(tiles, IMAGE_TILES_SCHEMA)
