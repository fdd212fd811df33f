"""Multimodal queries over `documents`, with DuckDB oracles.

Synthetic media are closed-form in (doc_id, length(text)) — see
operators/multimodal.py — so DuckDB verifies the Spark-side
binary-synthesis → Arrow transfer → mapInPandas decode round-trip by
computing the expected metadata/statistics directly, without touching
bytes.  A batching/offset/schema bug in the plumbing shows up as a value
mismatch here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import multimodal as M


def _doc_lengths(spark, sf_dir):
    """Narrow (doc_id, text length) BEFORE the fan-out repartition.

    documents.parquet is single-row-group, so the scan is one task; the
    mapInPandas synthesis/decode work needs every core.  Computing the
    length first means the fan-out exchange carries ~12 bytes/row instead
    of the full text (projections do not push below an explicit
    repartition).  At 100 TB the scan already yields thousands of splits
    and the repartition branch is never taken."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def q_image_decode(spark, sf_dir):
    imgs = M.attach_fake_image(_doc_lengths(spark, sf_dir), len_col="n")
    return M.decode_image(imgs)


def q_image_downsample(spark, sf_dir):
    imgs = M.attach_fake_image(_doc_lengths(spark, sf_dir), len_col="n")
    return M.decode_image(M.downsample_image(imgs, factor=2))


def q_audio_stats(spark, sf_dir):
    audio = M.attach_fake_audio(_doc_lengths(spark, sf_dir), len_col="n")
    return M.audio_stats(audio)


def q_image_tiles(spark, sf_dir):
    """ViT-style 2x2 patch grid + per-tile max-pool checksum
    (operators/multimodal.image_tiles)."""
    imgs = M.attach_fake_image(_doc_lengths(spark, sf_dir), len_col="n")
    return M.image_tiles(imgs, patch=2)


def q_audio_segments(spark, sf_dir):
    """VAD-shaped activity segmentation over the synthetic PCM
    (operators/multimodal.audio_active_segments, 16-sample frames,
    energy threshold 1024)."""
    audio = M.attach_fake_audio(_doc_lengths(spark, sf_dir), len_col="n")
    return M.audio_active_segments(audio)


def q_frame_sample(spark, sf_dir):
    audio = M.attach_fake_audio(_doc_lengths(spark, sf_dir), len_col="n")
    return M.frame_sample(audio, frame_bytes=16, every=4)


QUERIES = {
    "mm_image_decode": q_image_decode,
    "mm_image_downsample": q_image_downsample,
    "mm_audio_stats": q_audio_stats,
    "mm_audio_segments": q_audio_segments,
    "mm_image_tiles": q_image_tiles,
    "mm_frame_sample": q_frame_sample,
}

# Closed forms (operators/multimodal.py synthesis):
#   image: w = 4 + len%29, h = 4 + (7*len)%23, pixel[i] = (id*31+i*17)%256
#   audio: n = 50 + len%100, sample[i] = (id*13+i*7)%256 - 128
_W = "(4 + length(text) % 29)"
_H = "(4 + (7 * length(text)) % 23)"
_N_AUDIO = "(50 + length(text) % 100)"

ORACLES = {
    "mm_image_decode": f"""
        SELECT doc_id,
               CAST({_W} AS INT) AS width,
               CAST({_H} AS INT) AS height,
               CAST({_W} * {_H} AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(range(0, {_W} * {_H}),
                    i -> (doc_id * 31 + i * 17) % 256)) AS BIGINT) AS pixel_sum
        FROM documents
    """,
    # nearest-neighbor downsample by 2: kept pixel (x,y) maps to source
    # index 2*y*w + 2*x
    "mm_image_downsample": f"""
        SELECT doc_id,
               CAST({_W} // 2 AS INT) AS width,
               CAST({_H} // 2 AS INT) AS height,
               CAST(({_W} // 2) * ({_H} // 2) AS BIGINT) AS n_pixels,
               CAST(list_sum(flatten(list_transform(range(0, {_H} // 2),
                    y -> list_transform(range(0, {_W} // 2),
                         x -> (doc_id * 31 + (2 * y * {_W} + 2 * x) * 17) % 256))))
                    AS BIGINT) AS pixel_sum
        FROM documents
    """,
    "mm_audio_stats": f"""
        SELECT doc_id,
               CAST({_N_AUDIO} AS BIGINT) AS n_samples,
               CAST(list_sum(list_transform(range(0, {_N_AUDIO}),
                    i -> abs((doc_id * 13 + i * 7) % 256 - 128))) AS BIGINT)
                    AS abs_amplitude_sum
        FROM documents
    """,
    # frames of 16 bytes over the audio payload, every 4th kept; first
    # byte of kept frame k is sample index 64*k.  Comma-joined string,
    # not array<int>: the driver's pandas canonicalizer can't hash lists.
    # 2x2 tiles over the closed-form image; per-tile max of the 4 pixels
    "mm_image_tiles": f"""
        WITH g AS (
          SELECT doc_id, {_W} AS w, {_H} AS h,
                 {_W} // 2 AS tx, {_H} // 2 AS ty
          FROM documents
        ),
        t AS (
          SELECT doc_id, tx, ty,
                 u.i % tx AS x, u.i // tx AS y, w
          FROM g, LATERAL (
            SELECT unnest(range(0, tx * ty)) AS i
          ) u
        ),
        pooled AS (
          SELECT doc_id, tx, ty,
                 greatest(
                   (doc_id * 31 + ((2*y) * w + 2*x) * 17) % 256,
                   (doc_id * 31 + ((2*y) * w + 2*x + 1) * 17) % 256,
                   (doc_id * 31 + ((2*y + 1) * w + 2*x) * 17) % 256,
                   (doc_id * 31 + ((2*y + 1) * w + 2*x + 1) * 17) % 256
                 ) AS mx
          FROM t
        )
        SELECT doc_id,
               CAST(MAX(tx) AS INT) AS n_tiles_x,
               CAST(MAX(ty) AS INT) AS n_tiles_y,
               CAST(count(*) AS BIGINT) AS n_tiles,
               CAST(SUM(mx) AS BIGINT) AS tile_max_sum
        FROM pooled GROUP BY doc_id
    """,
    # 16-sample frames; frame k active iff sum |amp| > 1024; segments =
    # runs of active frames (gaps-and-islands on k - row_number)
    "mm_audio_segments": f"""
        WITH fr AS (
          SELECT doc_id, u.k AS k,
                 list_sum(list_transform(range(16*u.k, 16*u.k + 16),
                      i -> abs((doc_id * 13 + i * 7) % 256 - 128))) AS e
          FROM documents, LATERAL (
            SELECT unnest(range(0, {_N_AUDIO} // 16)) AS k
          ) u
        ),
        act AS (SELECT doc_id, k, (e > 1024) AS a FROM fr),
        isl AS (
          SELECT doc_id, k, a,
                 k - row_number() OVER (PARTITION BY doc_id, a ORDER BY k)
                     AS grp
          FROM act
        ),
        seg AS (
          SELECT doc_id, grp, count(*) AS len
          FROM isl WHERE a GROUP BY 1, 2
        ),
        per AS (
          SELECT a.doc_id,
                 count(*) AS n_frames,
                 sum(CASE WHEN a.a THEN 1 ELSE 0 END) AS n_active
          FROM act a GROUP BY 1
        ),
        segagg AS (
          SELECT doc_id, count(*) AS n_segments, max(len) AS longest
          FROM seg GROUP BY 1
        )
        SELECT per.doc_id,
               CAST(per.n_frames AS BIGINT) AS n_frames,
               CAST(per.n_active AS BIGINT) AS n_active,
               CAST(COALESCE(segagg.n_segments, 0) AS BIGINT) AS n_segments,
               CAST(COALESCE(segagg.longest, 0) AS BIGINT) AS longest_segment
        FROM per LEFT JOIN segagg USING (doc_id)
    """,
    "mm_frame_sample": f"""
        SELECT doc_id,
               CAST({_N_AUDIO} // 16 AS INT) AS n_frames,
               CAST(CEIL(({_N_AUDIO} // 16) / 4.0) AS INT) AS n_sampled,
               array_to_string(
                    list_transform(range(0, CAST(CEIL(({_N_AUDIO} // 16) / 4.0) AS INT)),
                         k -> CAST((doc_id * 13 + 64 * k * 7) % 256 AS INT)),
                    ',') AS sampled_first_bytes
        FROM documents
    """,
}


def q_phash_near_dup(spark, sf_dir):
    """Perceptual-hash near-duplicate image pairs.  Oracle-backed since
    round 6: image_phash's mean comparison is integer-exact
    (cell_sum·n_pixels > total_sum·cell_count — no float division), so
    the 64-bit aHash is reproducible in ANSI SQL from the closed-form
    SMF synthesis, and the oracle recomputes signatures + ALL-PAIRS
    Hamming via DuckDB BITSTRINGs (the Spark side must stay banded —
    the oracle affords quadratic, the engine must not; same split as
    dedup_simhash).  Exact-signature collapse runs first, so output
    pairs are between distinct visual signatures only."""
    imgs = M.attach_fake_image(_doc_lengths(spark, sf_dir), len_col="n")
    return M.phash_near_pairs(imgs, max_hamming=3)


QUERIES["mm_phash_near_dup"] = q_phash_near_dup  # oracle-backed (integer aHash)

# Full independent recomputation of the integer-exact average-hash:
# pixels from the closed form, 8x8 pooling with the same floor cell
# edges and forced ≥1-row/col blocks (pixels can belong to two cells
# when w or h < 8 — hence the containment join, not a partition map),
# bit k = MSB-first at string position k+1, fingerprints as BITSTRINGs
# (bigint << 63 overflows; BIT xor/bit_count sidesteps the sign bit).
ORACLES["mm_phash_near_dup"] = f"""
    WITH base AS (
      SELECT doc_id, {_W} AS w, {_H} AS h FROM documents
    ),
    px AS (
      SELECT b.doc_id,
             (b.doc_id * 31 + k.kk * 17) % 256 AS v,
             k.kk // b.w AS y, k.kk % b.w AS x
      FROM base b, LATERAL (
        SELECT unnest(range(0, b.w * b.h)) AS kk
      ) k
    ),
    tot AS (
      SELECT doc_id, SUM(v) AS t, COUNT(*) AS npx FROM px GROUP BY 1
    ),
    cells AS (
      SELECT b.doc_id, ij.i, ij.j,
             (ij.i * b.h) // 8 AS y0,
             greatest(((ij.i + 1) * b.h) // 8, (ij.i * b.h) // 8 + 1) AS y1,
             (ij.j * b.w) // 8 AS x0,
             greatest(((ij.j + 1) * b.w) // 8, (ij.j * b.w) // 8 + 1) AS x1
      FROM base b,
           (SELECT a.range AS i, c2.range AS j
            FROM range(8) a, range(8) c2) ij
    ),
    cs AS (
      SELECT c.doc_id, c.i, c.j, SUM(p.v) AS s, COUNT(*) AS cnt
      FROM cells c JOIN px p ON c.doc_id = p.doc_id
        AND p.y >= c.y0 AND p.y < c.y1 AND p.x >= c.x0 AND p.x < c.x1
      GROUP BY 1, 2, 3
    ),
    bits AS (
      SELECT cs.doc_id, cs.i * 8 + cs.j AS kbit,
             CASE WHEN cs.s * tot.npx > tot.t * cs.cnt
                  THEN '1' ELSE '0' END AS bch
      FROM cs JOIN tot USING (doc_id)
    ),
    fp AS (
      SELECT doc_id, string_agg(bch, '' ORDER BY kbit) AS bstr
      FROM bits GROUP BY 1
    ),
    grp AS (
      SELECT bstr, MIN(doc_id) AS rep, COUNT(*) AS n_members
      FROM fp GROUP BY 1
    )
    SELECT a.rep AS rep_a, b.rep AS rep_b,
           CAST(bit_count(xor(CAST(a.bstr AS BIT), CAST(b.bstr AS BIT)))
                AS BIGINT) AS hamming,
           CAST(a.n_members AS BIGINT) AS n_a,
           CAST(b.n_members AS BIGINT) AS n_b
    FROM grp a JOIN grp b ON a.rep < b.rep
    WHERE bit_count(xor(CAST(a.bstr AS BIT), CAST(b.bstr AS BIT))) <= 3
"""


def q_mm_keyframes(spark, sf_dir):
    """Delta-scored keyframe selection over the deterministic fake
    video track (operators/multimodal.keyframe_select).  Oracle-backed
    since round 6: every emitted number is integer math over the
    closed-form byte synthesis — frame scores are mean |byte delta|
    whose only division is by frame_bytes=16 (a power of two, exact in
    float64, and comparable via the integer SUM), selection order is
    (score desc, index asc), and max_delta truncates to sum // 16 — so
    DuckDB recomputes the whole selection value-for-value.  The
    n_frames<=1 degenerate path stays pinned by the unit goldens."""
    vids = M.attach_fake_audio(_doc_lengths(spark, sf_dir), len_col="n")
    return M.keyframe_select(
        vids.select("doc_id", "content"), frame_bytes=16, top_n=4
    )


QUERIES["mm_keyframes"] = q_mm_keyframes  # oracle-backed (integer deltas)

# Independent recomputation of keyframe_select on the closed-form track:
# byte i = (doc_id*13 + i*7) % 256, frames of 16 bytes, frame f>=1
# scored by sum_j |byte(f,j) - byte(f-1,j)| (the /16 mean rescales
# monotonically — integer sums give the same order), frame 0 duplicates
# frame 1's score (shot start), top-4 by (score desc, index asc).
ORACLES["mm_keyframes"] = f"""
    WITH base AS (
      SELECT doc_id, ({_N_AUDIO}) // 16 AS nf FROM documents
    ),
    d AS (
      SELECT b.doc_id, f.f AS f,
             list_sum(list_transform(range(16), j ->
                 abs(((b.doc_id * 13 + (f.f * 16 + j) * 7) % 256)
                   - ((b.doc_id * 13 + ((f.f - 1) * 16 + j) * 7) % 256))))
                 AS ds
      FROM base b, LATERAL (SELECT unnest(range(1, b.nf)) AS f) f
    ),
    scores AS (
      SELECT doc_id, f, ds FROM d
      UNION ALL
      SELECT doc_id, 0 AS f, ds FROM d WHERE f = 1
    ),
    ranked AS (
      SELECT doc_id, f, ds,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY ds DESC, f ASC) AS rk
      FROM scores
    )
    SELECT b.doc_id,
           CAST(b.nf AS INT) AS n_frames,
           CAST(count(r.f) AS INT) AS n_keyframes,
           string_agg(CAST(r.f AS VARCHAR), ',' ORDER BY r.f)
               AS keyframe_idxs,
           CAST(mx.ds // 16 AS INT) AS max_delta
    FROM base b
    JOIN (SELECT * FROM ranked WHERE rk <= 4) r ON b.doc_id = r.doc_id
    JOIN (SELECT doc_id, max(ds) AS ds FROM scores GROUP BY 1) mx
      ON b.doc_id = mx.doc_id
    GROUP BY b.doc_id, b.nf, mx.ds
"""
