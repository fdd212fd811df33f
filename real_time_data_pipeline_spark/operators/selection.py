"""Training-data SELECTION operators — the learned/model-light tier of
the curation stack, next to the heuristic gates (operators/curation.py)
and the fixed-weight classifier (operators/text.quality_logit_score):

- :func:`log2_fp16` — engine-portable fixed-point log2 (16 fractional
  bits) via an exact integer mantissa-grid interpolation.  The primitive
  that unlocks log-domain scoring (importance weights, cross-entropy,
  Gumbel-free weighted sampling) under the repo's cross-engine
  determinism contract: transcendental ``ln`` is NOT guaranteed
  last-ulp-identical across libm implementations, so every float log is
  replaced by integer shifts + one broadcast lookup join against a
  1025-entry table generated ONCE in Python and shared verbatim with
  the DuckDB oracles (queries/selection.py) as a hex literal.

- :func:`dsir_bucket_weights` / :func:`dsir_select` — Data Selection
  with Importance Resampling (Xie et al., 2023, arXiv:2302.03169):
  hashed-ngram bucket counts under a target distribution vs the raw
  corpus give per-bucket log importance weights; documents are scored
  by the sum of their tokens' bucket weights and the top fraction is
  kept (the paper's deterministic top-k variant; the Gumbel-noise
  sampler swaps in one extra additive term).

- :func:`ccnet_perplexity_buckets` — CCNet-style perplexity bucketing
  (Wenzek et al., 2020, arXiv:1911.00359): per-language unigram LM
  cross-entropy per token, docs split into head/middle/tail terciles
  per language — the classic "keep the head, inspect the middle"
  pre-filter.

- :func:`weighted_sample_stratified` — Efraimidis–Spirakis A-ES
  weighted sampling without replacement (IPL 2006): key
  u^(1/w) ranked per stratum, realized deterministically with the
  engine-portable sha256 uniform (operators/curation.portable_hash48)
  and the fixed-point log (rank by (-log2 u)/w ascending — the exact
  monotone transform of the paper's key).

No reference-counterpart: the reference pipeline (see SURVEY.md §2.9
N4) stops at heuristic text stats; this module is north-star extension
surface for the 100 TB training-data use case.

Scale shape: every operator is explode → hash → aggregate with map-side
combine; the only broadcast joins are the 1024-row grid / bucket-weight
frames and per-stratum scalars.  No collect() except the bounded
top-N count in dsir_select (a single scalar).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.curation import portable_hash48
from real_time_data_pipeline_spark.operators.dedup import tokens_col

# ------------------------------------------------------------------ log2

FP_BITS = 16
FP_ONE = 1 << FP_BITS          # 65536: fixed-point 1.0
_MANT_BITS = 30                # mantissa normalized to [2^30, 2^31)
_GRID_BITS = 10                # top 10 mantissa bits index the grid
_GRID = 1 << _GRID_BITS        # 1024 cells
_REM_BITS = _MANT_BITS - _GRID_BITS  # 20 remainder bits interpolated

# fp16(log2(1 + g/1024)) for g = 0..1024, 5 lowercase hex chars each —
# the ONE table both engines read (Spark parses it with conv(); the
# DuckDB oracle with an ascii fold), so the interpolation can never
# drift between the query and its oracle.  Max grid value is 65536
# (g=1024) = 0x10000, still 5 hex chars.
GRID_HEX = "".join(
    f"{round(FP_ONE * math.log2(1.0 + g / _GRID)):05x}" for g in range(_GRID + 1)
)
assert len(GRID_HEX) == 5 * (_GRID + 1)


def log2_fp16_py(x: int) -> int:
    """Pure-Python twin of the SQL pipeline (tests + documentation).
    Exact same integer steps: normalize, split grid/remainder, linear
    interpolation on the shared table.  |result/65536 - log2(x)| is
    < 4e-5 for all x >= 1 (analytic worst case ~2.5 fp16 units: 0.5
    table rounding + 1 interpolation floor + ~0.2 curvature, tested
    across magnitudes in tests/test_selection.py)."""
    if x < 1:
        raise ValueError("log2_fp16 domain is x >= 1")
    e = x.bit_length() - 1
    m = (x >> (e - _MANT_BITS)) if e >= _MANT_BITS else (x << (_MANT_BITS - e))
    off = m - (1 << _MANT_BITS)
    g, r = off >> _REM_BITS, off & ((1 << _REM_BITS) - 1)
    fp = int(GRID_HEX[g * 5 : g * 5 + 5], 16)
    fp_nxt = int(GRID_HEX[g * 5 + 5 : g * 5 + 10], 16)
    return e * FP_ONE + fp + (((fp_nxt - fp) * r) >> _REM_BITS)


def _grid_df(spark) -> DataFrame:
    """(g, fp, fp_nxt) lookup frame, 1024 rows, parsed from GRID_HEX
    via a literal-bounds range (compile-constant cardinality — the
    plan guard's bounded-build proof accepts it).  Broadcast at every
    use site — never a shuffle."""
    return spark.range(_GRID).select(
        F.col("id").alias("g"),
        F.expr(
            f"CAST(conv(substring('{GRID_HEX}', CAST(id * 5 + 1 AS INT), 5),"
            " 16, 10) AS BIGINT)"
        ).alias("fp"),
        F.expr(
            f"CAST(conv(substring('{GRID_HEX}', CAST(id * 5 + 6 AS INT), 5),"
            " 16, 10) AS BIGINT)"
        ).alias("fp_nxt"),
    )


def log2_fp16(df: DataFrame, x_sql: str, out_col: str) -> DataFrame:
    """Attach ``out_col`` = fp16 log2 of the positive BIGINT expression
    ``x_sql``.  Integer ops only (bin/shift/mul/add) + one broadcast
    join against the 1024-row grid, so the value is bit-identical in
    any engine that runs the same steps — the DuckDB twin is
    queries/selection._duck_lg_cte.  Temp columns are prefixed with
    ``_<out_col>_`` and dropped."""
    p = f"_{out_col}"
    d = (
        df.withColumn(f"{p}_x", F.expr(f"CAST({x_sql} AS BIGINT)"))
        .withColumn(f"{p}_e", F.expr(f"length(bin({p}_x)) - 1"))
        .withColumn(
            f"{p}_m",
            F.expr(
                f"CASE WHEN {p}_e >= {_MANT_BITS} THEN "
                f"shiftright({p}_x, CAST({p}_e - {_MANT_BITS} AS INT)) "
                f"ELSE shiftleft({p}_x, CAST({_MANT_BITS} - {p}_e AS INT)) END"
            ),
        )
        .withColumn(f"{p}_g", F.expr(f"shiftright({p}_m - {1 << _MANT_BITS}, {_REM_BITS})"))
        .withColumn(
            f"{p}_r",
            F.expr(f"({p}_m - {1 << _MANT_BITS}) % {1 << _REM_BITS}"),
        )
    )
    grid = _grid_df(df.sparkSession).select(
        F.col("g").alias(f"{p}_g"),
        F.col("fp").alias(f"{p}_fp"),
        F.col("fp_nxt").alias(f"{p}_fpn"),
    )
    out = d.join(F.broadcast(grid), f"{p}_g").withColumn(
        out_col,
        F.expr(
            f"{p}_e * {FP_ONE} + {p}_fp + "
            f"shiftright(({p}_fpn - {p}_fp) * {p}_r, {_REM_BITS})"
        ),
    )
    return out.drop(*[c for c in out.columns if c.startswith(f"{p}_")])


# ------------------------------------------------------------------ DSIR

DSIR_BUCKETS = 1024
DSIR_TOP_FRAC_DEN = 5  # keep top 1/5 of docs


def _bucket_col(portable: bool, n_buckets: int) -> F.Column:
    """Token -> feature bucket.  portable=True is the oracle config
    (sha256 fold, reproducible in DuckDB); portable=False is the scale
    path (one fused xxhash64, no 64-char digest per token)."""
    if portable:
        h = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 15), 16, 10)
        return F.pmod(h.cast("bigint"), F.lit(n_buckets))
    return F.pmod(F.xxhash64("tok"), F.lit(n_buckets))


def _dsir_count_tokens(
    docs: DataFrame,
    target_sql: str,
    text_col: str,
    n_buckets: int,
    portable: bool,
) -> DataFrame:
    """Sparse (bucket, n_target, n_raw) counts for a doc slice — the
    additive sufficient statistic of the DSIR model (counts from two
    corpora ADD, which is what makes incremental weight refresh a
    ``n_buckets``-row job)."""
    toks = docs.select(
        F.explode(tokens_col(text_col)).alias("tok"),
        F.expr(f"CASE WHEN {target_sql} THEN 1 ELSE 0 END").alias("is_t"),
    ).select(_bucket_col(portable, n_buckets).alias("bucket"), "is_t")
    return toks.groupBy("bucket").agg(
        F.sum("is_t").cast("bigint").alias("n_target"),
        F.count("*").cast("bigint").alias("n_raw"),
    )


def _dsir_densify(counts: DataFrame, n_buckets: int) -> DataFrame:
    """Left-join counts onto the full bucket range so the output shape
    (and the Laplace smoothing) is corpus-independent."""
    return (
        counts.sparkSession.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_target", F.lit(0)).cast("bigint").alias("n_target"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_raw"),
        )
    )


def _dsir_weights_from_dense(dense: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, n_target, n_raw) -> + weight_fp, the fp16 log ratio of
    the Laplace-smoothed target/raw bucket probabilities."""
    totals = dense.agg(
        F.sum("n_target").cast("bigint").alias("tt"),
        F.sum("n_raw").cast("bigint").alias("tr"),
    )
    totals = log2_fp16(totals, f"tt + {n_buckets}", "lg_tt")
    totals = log2_fp16(totals, f"tr + {n_buckets}", "lg_tr")
    d = dense.crossJoin(F.broadcast(totals.select("lg_tt", "lg_tr")))
    d = log2_fp16(d, "n_target + 1", "lg_ct")
    d = log2_fp16(d, "n_raw + 1", "lg_cr")
    return d.select(
        "bucket",
        "n_target",
        "n_raw",
        (F.col("lg_ct") + F.col("lg_tr") - F.col("lg_cr") - F.col("lg_tt"))
        .cast("bigint")
        .alias("weight_fp"),
    )


def dsir_bucket_weights(
    docs: DataFrame,
    target_sql: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> DataFrame:
    """DSIR step 1 (Xie et al. 2023 §3): hashed-token bucket counts
    under the target slice vs the raw corpus, Laplace-smoothed, as
    fp16 log importance weights:

      weight_fp(b) = lg(ct_b + 1) + lg(Tr + B) - lg(cr_b + 1) - lg(Tt + B)

    where ct/cr are target/raw token counts in bucket b and Tt/Tr the
    totals (so weight = log2 of the smoothed probability ratio).  The
    four logs are attached separately — each argument stays < 2^63 at
    ANY corpus size, where the single-product form lg((ct+1)*(Tr+B))
    would overflow past ~2^31 tokens.

    Output: (bucket, n_target, n_raw, weight_fp), exactly ``n_buckets``
    rows (empty buckets densified via a range frame so the output shape
    is corpus-independent).

    Scale: one explode + one bucket aggregate with map-side combine
    (shuffle carries <= n_buckets rows per map partition); the grid and
    totals joins are broadcast.
    """
    counts = _dsir_count_tokens(docs, target_sql, text_col, n_buckets, portable)
    return _dsir_weights_from_dense(
        _dsir_densify(counts, n_buckets), n_buckets
    )


def build_dsir_counts(
    docs: DataFrame,
    path: str,
    target_sql: str = "lang = 'en'",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> None:
    """Persist the dense (bucket, n_target, n_raw) count table for a
    history corpus — the WHOLE DSIR model state, ``n_buckets`` rows at
    any corpus size.  Incremental refresh (new data arrives) reads this
    back, ADDS the increment's counts, and re-derives weights: the
    history is never re-tokenized."""
    dense = _dsir_densify(
        _dsir_count_tokens(docs, target_sql, text_col, n_buckets, portable),
        n_buckets,
    )
    dense.coalesce(1).write.mode("overwrite").parquet(path)


def dsir_weights_incremental(
    spark,
    new_docs: DataFrame,
    path: str,
    target_sql: str = "lang = 'en'",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> DataFrame:
    """Refresh DSIR weights after an ingest increment WITHOUT touching
    the history: tokenize only ``new_docs``, add their bucket counts to
    the persisted table (counts are additive sufficient statistics),
    re-derive weights.  Output is the full (bucket, n_target, n_raw,
    weight_fp) table — bit-identical to a ground-up
    :func:`dsir_bucket_weights` over history+increment, which is the
    equality certificate the registry oracle pins.

    Scale: the increment pays its own tokenize; the history costs ONE
    ``n_buckets``-row parquet read.  This is the 100 TB shape — a daily
    model refresh reads a few KB of state plus the day's data."""
    hist = spark.read.parquet(path).select("bucket", "n_target", "n_raw")
    inc = _dsir_count_tokens(
        new_docs, target_sql, text_col, n_buckets, portable
    )
    merged = (
        hist.join(inc.withColumnRenamed("n_target", "it")
                  .withColumnRenamed("n_raw", "ir"), "bucket", "left")
        .select(
            "bucket",
            (F.col("n_target") + F.coalesce("it", F.lit(0)))
            .cast("bigint")
            .alias("n_target"),
            (F.col("n_raw") + F.coalesce("ir", F.lit(0)))
            .cast("bigint")
            .alias("n_raw"),
        )
    )
    return _dsir_weights_from_dense(merged, n_buckets)


def dsir_score_against(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> DataFrame:
    """Score docs against a FROZEN weight frame (bucket, weight_fp) —
    the ingest-gate half of DSIR: weights learned on the history, new
    docs scored as they arrive (each micro-batch calls this).  Output:
    (doc_id, score_fp)."""
    per_bucket = (
        docs.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
        )
        .select(id_col, _bucket_col(portable, n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    return (
        per_bucket.join(
            F.broadcast(weights.select("bucket", "weight_fp")), "bucket"
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.col("k") * F.col("weight_fp"))
            .cast("bigint")
            .alias("score_fp")
        )
    )


def _dsir_scores_onepass(
    docs: DataFrame,
    target_sql: str,
    id_col: str,
    text_col: str,
    n_buckets: int,
    portable: bool,
) -> DataFrame:
    """Full (doc_id, score_fp) frame in ONE tokenize+hash pass,
    returned as ``(scores, n_docs)``: the persisted (doc, bucket, k)
    aggregate feeds the global bucket counts (weights), the per-doc
    scores, AND the corpus count the top-N callers need to fix N — so
    the sha256/explode cost isn't paid twice and no separate
    full-corpus count() job ever runs.  explode_outer keeps zero-token
    docs as a NULL-bucket row so they stay countable; their weight is
    NULL under the LEFT join below, so their score row is NULL and the
    callers' final selection filters it.

    N-action shape (re-tuned in round 10 after the r9 fold measured
    1.33x on the certified bench): r9 took n_docs from a
    countDistinct over the cached (doc, bucket) aggregate, which paid
    TWO extra shuffles over ~|docs|x|buckets| rows before the scoring
    job even started.  Now the per-doc ``scores`` frame itself is
    persisted and the one driver action is ``scores.count()`` — it
    materializes the tokenize pass plus the score aggregation that the
    TakeOrdered consumer needs anyway, and the count itself runs over
    per-DOC rows (the smallest frame in the pass).  Measured MIN-over-4
    at sf0.1: 2.41 s (r8 separate-corpus-count shape) / 3.57 s (r9
    countDistinct) / this shape ≤ the r8 number with no second corpus
    scan at all.  Shared by the deterministic top-k
    (:func:`dsir_select`) and the Gumbel sampler
    (:func:`dsir_sample_gumbel`)."""
    from real_time_data_pipeline_spark.operators import cache

    spark = docs.sparkSession
    per_bucket = cache.track(
        docs.select(
            F.col(id_col),
            F.expr(f"CASE WHEN {target_sql} THEN 1 ELSE 0 END").alias("is_t"),
            F.explode_outer(tokens_col(text_col)).alias("tok"),
        )
        .select(
            id_col,
            "is_t",
            F.when(
                F.col("tok").isNotNull(),
                _bucket_col(portable, n_buckets),
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket", "is_t")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    counts = per_bucket.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t") == 1, F.col("k")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_target"),
        F.sum("k").cast("bigint").alias("n_raw"),
    )
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_target", F.lit(0)).cast("bigint").alias("n_target"),
            F.coalesce("n_raw", F.lit(0)).cast("bigint").alias("n_raw"),
        )
    )
    totals = dense.agg(
        F.sum("n_target").cast("bigint").alias("tt"),
        F.sum("n_raw").cast("bigint").alias("tr"),
    )
    totals = log2_fp16(totals, f"tt + {n_buckets}", "lg_tt")
    totals = log2_fp16(totals, f"tr + {n_buckets}", "lg_tr")
    d = dense.crossJoin(F.broadcast(totals.select("lg_tt", "lg_tr")))
    d = log2_fp16(d, "n_target + 1", "lg_ct")
    d = log2_fp16(d, "n_raw + 1", "lg_cr")
    w = d.select(
        "bucket",
        (F.col("lg_ct") + F.col("lg_tr") - F.col("lg_cr") - F.col("lg_tt"))
        .cast("bigint")
        .alias("weight_fp"),
    )
    # LEFT join: zero-token docs (NULL bucket) keep a row with NULL
    # score_fp so the count below sees every document; docs with tokens
    # always match (w covers the full densified bucket range).
    scores = cache.track(
        per_bucket.join(F.broadcast(w), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("k") * F.col("weight_fp")).cast("bigint").alias("score_fp"))
    )
    n_docs = scores.count()
    return scores.filter(F.col("score_fp").isNotNull()), n_docs


def dsir_select(
    docs: DataFrame,
    target_sql: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    top_frac_den: int = DSIR_TOP_FRAC_DEN,
    portable: bool = True,
) -> DataFrame:
    """DSIR step 2: score every document by the sum of its tokens'
    bucket weights (per-occurrence, as the paper's bag-of-hashed-ngrams
    inner product) and keep the top 1/``top_frac_den`` by score
    (deterministic top-k; ties broken by id).  Output: the selected
    (doc_id, score_fp) rows.

    Scale: one corpus pass (:func:`_dsir_scores_onepass`); the final
    top-N is TakeOrdered (per-partition heaps + driver merge of N),
    never a global sort shuffle.  The one driver action fixing N is a
    countDistinct over the pass's cached (doc, bucket) aggregate — the
    corpus itself is never scanned a second time.
    """
    scores, n_docs = _dsir_scores_onepass(
        docs, target_sql, id_col, text_col, n_buckets, portable
    )
    n_keep = n_docs // top_frac_den
    return scores.orderBy(F.desc("score_fp"), F.asc(id_col)).limit(n_keep)


# Gumbel constant: -fp16(log2(ln 2)) — the base-2 Gumbel shift.  A
# fixed Python literal by construction (round of a constant expression,
# nowhere near a .5 boundary), embedded verbatim in the DuckDB oracle.
GUMBEL_C_FP = round(-FP_ONE * math.log2(math.log(2.0)))


def dsir_sample_gumbel(
    docs: DataFrame,
    target_sql: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    top_frac_den: int = DSIR_TOP_FRAC_DEN,
    portable: bool = True,
) -> DataFrame:
    """DSIR's actual sampler (Xie et al. 2023 §3): resample WITHOUT
    replacement with probability proportional to the importance weight
    via Gumbel-top-k — keep the top N of log w_i + G_i.  Realized
    deterministically: the uniform is the portable sha256 key of the
    doc id and the Gumbel noise is derived in fixed point,

      T_fp  = 48*2^16 - lg(u48 + 1)          # -log2 u, >= 1 guard
      G2_fp = 16*2^16 + GUMBEL_C_FP - lg(T_fp)
            # base-2 Gumbel: G/ln2 = -log2(-log2 u) - log2(ln 2)
      key   = score_fp + G2_fp               # top-N desc, tie by id

    (G/ln2 is the correct noise scale when the scores are log2-domain —
    Gumbel-top-k in base b needs Gumbel/ln b.)  Same seed, same sample,
    any engine.  Output: the sampled (doc_id, score_fp, key_fp) rows.

    Scale: the scoring pass plus two broadcast grid joins and one
    TakeOrdered — identical shape to :func:`dsir_select`, including the
    no-second-corpus-scan N fix (count from the pass's cached
    aggregate).
    """
    scores, n_docs = _dsir_scores_onepass(
        docs, target_sql, id_col, text_col, n_buckets, portable
    )
    d = scores.withColumn(
        "u", portable_hash48(F.col(id_col)) + F.lit(1)
    )
    d = log2_fp16(d, "u", "lg_u")
    d = d.withColumn(
        "t_fp", F.greatest(F.lit(48 * FP_ONE) - F.col("lg_u"), F.lit(1))
    )
    d = log2_fp16(d, "t_fp", "lg_t")
    d = d.select(
        id_col,
        "score_fp",
        (
            F.col("score_fp")
            + F.lit(16 * FP_ONE + GUMBEL_C_FP)
            - F.col("lg_t")
        )
        .cast("bigint")
        .alias("key_fp"),
    )
    n_keep = n_docs // top_frac_den
    return d.orderBy(F.desc("key_fp"), F.asc(id_col)).limit(n_keep)


# ----------------------------------------------------------------- CCNet

def ccnet_perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM bucketing (Wenzek et al. 2020 §3.3): per-language
    unigram LM over the corpus itself, each doc scored by its mean
    cross-entropy in fp16 bits/token

      bits(tok) = lg(T_lang) - lg(cf_lang(tok))    [per occurrence]
      bits_per_tok_fp = SUM(bits) DIV n_tokens

    then split into per-language terciles: 'head' (lowest perplexity,
    most fluent under the LM), 'middle', 'tail' — CCNet's keep/inspect/
    drop pre-filter.  ntile(3) with a (bits, doc_id) total order is
    deterministic and identical across engines.

    Scale: (lang, token) counts with map-side combine; the doc-side
    join is on the (lang, token) vocabulary — the standard corpus-scale
    hash join; lang totals (|langs| rows) broadcast.  The tercile
    window partitions by language — acceptable when |docs per lang|
    sorts within executors (it's one sort per lang); at extreme scale
    swap ntile for approx thresholds + a filter, same output contract.
    """
    toks = docs.select(
        F.col(id_col), F.col(lang_col).alias("lang"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    doc_tok = toks.groupBy(id_col, "lang", "tok").agg(
        F.count("*").cast("bigint").alias("k")
    )
    vocab = toks.groupBy("lang", "tok").agg(
        F.count("*").cast("bigint").alias("cf")
    )
    lang_tot = vocab.groupBy("lang").agg(F.sum("cf").cast("bigint").alias("t"))
    lang_tot = log2_fp16(lang_tot, "t", "lg_t")
    vocab = log2_fp16(vocab, "cf", "lg_cf")
    scored = (
        doc_tok.join(vocab, ["lang", "tok"])
        .join(F.broadcast(lang_tot.select("lang", "lg_t")), "lang")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.col("k") * (F.col("lg_t") - F.col("lg_cf")))
            .cast("bigint")
            .alias("bits_fp"),
            F.sum("k").cast("bigint").alias("n_tokens"),
        )
        .select(
            id_col,
            "lang",
            F.expr("bits_fp DIV n_tokens").cast("bigint").alias("bits_per_tok_fp"),
        )
    )
    tile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy("bits_per_tok_fp", id_col)
    )
    return scored.select(
        id_col,
        "lang",
        "bits_per_tok_fp",
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


# ------------------------------------------------------- weighted sample

def weighted_sample_stratified(
    docs: DataFrame,
    stratum_col: str = "lang",
    weight_sql: str = "GREATEST(n_chars, 1)",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Efraimidis–Spirakis A-ES weighted sampling WITHOUT replacement,
    k docs per stratum, fully deterministic: the uniform u is the
    portable 48-bit sha256 key of the doc id, and the paper's
    max-(u^(1/w)) rank is realized as min of

      key_fp = ((48*65536 - lg(u + 1)) << 20) DIV w

    (exact monotone transform: maximizing log2(u)/w == minimizing
    (-log2 u)/w; all-integer, so the sample is reproducible in any
    engine — no RNG, no float pow).  Inclusion probability follows the
    A-ES guarantee: proportional to w without replacement per stratum.

    Output: the selected rows (doc_id, stratum, weight, sample_rank),
    min(k, |stratum|) per stratum.

    Scale: one hash + one per-stratum top-k window (per-key sort after
    a hash exchange); no driver actions.  Skewed strata sort within
    their partition — for pathological single-stratum corpora pre-slice
    with a secondary salt and re-rank the k*salts survivors.
    """
    d = docs.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        F.expr(f"CAST({weight_sql} AS BIGINT)").alias("w"),
        (portable_hash48(F.col(id_col)) + 1).alias("u"),
    )
    d = log2_fp16(d, "u", "lg_u")
    d = d.withColumn(
        "key_fp",
        F.expr(f"shiftleft({48 * FP_ONE}L - lg_u, 20) DIV w").cast("bigint"),
    )
    rn = F.row_number().over(
        Window.partitionBy("stratum").orderBy("key_fp", id_col)
    )
    return (
        d.select(id_col, "stratum", "w", "key_fp", rn.alias("sample_rank"))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, "stratum", "w", F.col("sample_rank").cast("bigint").alias("sample_rank"))
    )


def ccnet_bigram_ppl(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Bigram upgrade of :func:`ccnet_perplexity_buckets` — the CCNet
    recipe with a first-order LM instead of unigrams: per language,
    Laplace-smoothed conditionals over adjacent-token pairs,

      bits(w1 w2) = lg(ctx(w1) + V_lang) - lg(big(w1, w2) + 1)
      bits_per_pair_fp = SUM over the doc's pairs DIV n_pairs

    where ctx counts w1 as a pair CONTEXT, big the pair, and V_lang the
    language's distinct-token vocabulary (the smoothing denominator).
    Head/middle/tail terciles per language as before.  Docs with no
    pair (single-token) are excluded — a mean over zero pairs has no
    value either engine could agree on.

    Bigrams are built in LIST SPACE (transform over the token array —
    codegen'd, no explode-then-self-join); the (lang, w1, w2) model
    join is the standard corpus-LM shuffle; lang scalars broadcast.
    """
    toks = tokens_col(text_col)
    pair_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = docs.select(
        F.col(id_col), F.col(lang_col).alias("lang"),
        F.explode(pair_arr).alias("p"),
    ).select(id_col, "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    doc_pair = pairs.groupBy(id_col, "lang", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("k")
    )
    big = pairs.groupBy("lang", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("big")
    )
    ctx = pairs.groupBy("lang", "w1").agg(
        F.count("*").cast("bigint").alias("ctx")
    )
    vsz = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(tokens_col(text_col)).alias("tok"),
        )
        .groupBy("lang")
        .agg(F.countDistinct("tok").cast("bigint").alias("v"))
    )
    ctx = ctx.join(F.broadcast(vsz), "lang")
    ctx = log2_fp16(ctx, "ctx + v", "lg_ctx")
    big = log2_fp16(big, "big + 1", "lg_big")
    scored = (
        doc_pair.join(big, ["lang", "w1", "w2"])
        .join(ctx.select("lang", "w1", "lg_ctx"), ["lang", "w1"])
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.col("k") * (F.col("lg_ctx") - F.col("lg_big")))
            .cast("bigint")
            .alias("bits_fp"),
            F.sum("k").cast("bigint").alias("n_pairs"),
        )
        .select(
            id_col,
            "lang",
            F.expr("bits_fp DIV n_pairs").cast("bigint").alias(
                "bits_per_pair_fp"
            ),
        )
    )
    tile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy("bits_per_pair_fp", id_col)
    )
    return scored.select(
        id_col,
        "lang",
        "bits_per_pair_fp",
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


# ------------------------------------------------- Naive Bayes classifier

NB_CLASSES = ("de", "en", "es", "fr", "zh")
NB_HOLDOUT_MOD = 5  # doc_id % 5 == 0 -> held-out test split


def nb_train_classify(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    classes: tuple = NB_CLASSES,
    n_buckets: int = DSIR_BUCKETS,
    holdout_mod: int = NB_HOLDOUT_MOD,
    portable: bool = True,
) -> DataFrame:
    """TRAINED hashed-feature multinomial Naive Bayes — the classifier
    tier of the selection stack (the fastText-style in-domain/quality
    model of CCNet and the GPT-3 WebText filter, in its count-based
    exact form), next to the fixed-weight scorer
    (operators/text.quality_logit_score) and the pairwise-ratio DSIR
    weights (which are NB's two-class conditional ratio WITHOUT priors
    or argmax).  Everything is counts + the shared fixed-point log2, so
    training AND inference are engine-exact and the DuckDB oracle
    recomputes the whole model.

    Train on docs with ``id % holdout_mod != 0``, score EVERY doc:

      score_fp(d, c) = lg(N_c + 1) - lg(N + |C|)                 (prior)
                     + sum_b k_db * lg(cnt_cb + 1)               (likelihood)
                     - n_tok_d * lg(T_c + B)                     (denominator)

    — the log of the Laplace-smoothed multinomial posterior, all lg in
    fp16.  ``classes`` is a DECLARED label space (a literal, so the
    class fan-out is a 5-element explode, not a data-driven frame the
    plan guard can't bound).

    Output: (doc_id, <label_col>, split, pred_<label_col>, score_fp,
    margin_fp, correct) — one row per doc; pred = argmax with
    lexicographic tie-break; margin = top1 - top2 score (the
    abstain/confidence signal a curation gate thresholds on).

    Scale shape: ONE tokenize+hash pass persisted as the (doc, bucket,
    k) aggregate feeding both the model counts and the scores (the
    dsir_select dataflow); the model — |C|·B count rows + |C| constants
    — BROADCASTS at any corpus size; scoring is a bucket-key broadcast
    join + one (doc, class) hash aggregate; the per-doc argmax window
    partitions by doc over |C| rows."""
    from real_time_data_pipeline_spark.operators import cache

    n_classes = len(classes)
    meta = docs.select(
        F.col(id_col),
        F.col(label_col),
        F.when(F.col(id_col) % holdout_mod == 0, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    doc_bkt = cache.track(
        docs.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
        )
        .select(id_col, _bucket_col(portable, n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    doc_tot = meta.join(
        doc_bkt.groupBy(id_col).agg(
            F.sum("k").cast("bigint").alias("n_tok")
        ),
        id_col,
        "left",
    ).select(
        id_col,
        label_col,
        "split",
        F.coalesce("n_tok", F.lit(0)).cast("bigint").alias("n_tok"),
    )

    # Training is restricted to the DECLARED label space: an
    # out-of-space label would otherwise train an unreachable ghost
    # class (its tokens excluded from every scorable class) while still
    # inflating the n_train prior denominator — a silent model skew the
    # declared-class contract exists to prevent.  Such docs are still
    # SCORED (every doc gets a prediction); they just never train.
    train_meta = meta.filter(
        (F.col("split") == "train") & F.col(label_col).isin(*classes)
    )
    cls_counts = (
        doc_bkt.join(
            train_meta.select(id_col, F.col(label_col).alias("cls")), id_col
        )
        .groupBy("cls", "bucket")
        .agg(F.sum("k").cast("bigint").alias("cnt"))
    )
    wt = log2_fp16(cls_counts, "cnt + 1", "lg_ct").select(
        "cls", "bucket", "lg_ct"
    )

    cls_lit = F.explode(
        F.array(*[F.lit(c) for c in classes])
    ).alias("cls")
    spark = docs.sparkSession
    cls_frame = spark.range(1).select(cls_lit)
    consts = (
        cls_frame.join(
            cls_counts.groupBy("cls").agg(
                F.sum("cnt").cast("bigint").alias("t_c")
            ),
            "cls",
            "left",
        )
        .join(
            train_meta.groupBy(F.col(label_col).alias("cls")).agg(
                F.count("*").cast("bigint").alias("nd_c")
            ),
            "cls",
            "left",
        )
        .select(
            "cls",
            F.coalesce("t_c", F.lit(0)).cast("bigint").alias("t_c"),
            F.coalesce("nd_c", F.lit(0)).cast("bigint").alias("nd_c"),
        )
        .crossJoin(
            F.broadcast(
                log2_fp16(
                    train_meta.agg(
                        F.count("*").cast("bigint").alias("n_train")
                    ),
                    f"n_train + {n_classes}",
                    "lg_pd",
                ).select("lg_pd")
            )
        )
    )
    consts = log2_fp16(consts, f"t_c + {n_buckets}", "lg_den")
    consts = log2_fp16(consts, "nd_c + 1", "lg_pn")
    consts = consts.select(
        "cls",
        (F.col("lg_pn") - F.col("lg_pd")).cast("bigint").alias("prior_fp"),
        "lg_den",
    )

    partial = (
        doc_bkt.join(F.broadcast(wt), "bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("k") * F.col("lg_ct")).cast("bigint").alias("part"))
    )
    scored = (
        doc_tot.select("*", cls_lit)
        .join(F.broadcast(consts), "cls")
        .join(partial, [id_col, "cls"], "left")
        .select(
            id_col,
            label_col,
            "split",
            "cls",
            (
                F.col("prior_fp")
                + F.coalesce("part", F.lit(0))
                - F.col("n_tok") * F.col("lg_den")
            )
            .cast("bigint")
            .alias("score_fp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_fp"), F.asc("cls")
    )
    ranked = scored.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.lead("score_fp").over(w).alias("score2"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        id_col,
        label_col,
        "split",
        F.col("cls").alias(f"pred_{label_col}"),
        "score_fp",
        (F.col("score_fp") - F.coalesce("score2", F.col("score_fp")))
        .cast("bigint")
        .alias("margin_fp"),
        (F.col("cls") == F.col(label_col)).alias("correct"),
    )


def nb_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    **kwargs,
) -> DataFrame:
    """Held-out confusion matrix of :func:`nb_train_classify` — the
    model-quality ledger (one row per observed (true, predicted) pair
    on the test split, |C|²-bounded)."""
    out = nb_train_classify(docs, label_col=label_col, **kwargs)
    return (
        out.filter(F.col("split") == "test")
        .groupBy(label_col, f"pred_{label_col}")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def nb_fit(
    train_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    classes: tuple = NB_CLASSES,
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> tuple:
    """Fit the NB model on a labeled history slice and return its TWO
    broadcastable frames — ``wt`` (cls, bucket, lg_ct), ≤ |C|·B rows,
    and ``consts`` (cls, prior_fp, lg_den), |C| rows.  Together they
    ARE the model (the count table is the sufficient statistic), which
    is what makes the streaming gate shape work: freeze these at
    train time, score every arriving micro-batch against them without
    ever re-reading the history (the stream_dsir_gate dataflow).

    As in :func:`nb_train_classify`, training rows are restricted to
    the declared ``classes`` — out-of-space labels would train ghost
    classes and inflate the prior denominator."""
    train_docs = train_docs.filter(F.col(label_col).isin(*classes))
    toks = train_docs.select(
        F.col(label_col).alias("cls"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("cls", _bucket_col(portable, n_buckets).alias("bucket"))
    cls_counts = toks.groupBy("cls", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wt = log2_fp16(cls_counts, "cnt + 1", "lg_ct").select(
        "cls", "bucket", "lg_ct"
    )
    n_classes = len(classes)
    spark = train_docs.sparkSession
    cls_frame = spark.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in classes])).alias("cls")
    )
    consts = (
        cls_frame.join(
            cls_counts.groupBy("cls").agg(
                F.sum("cnt").cast("bigint").alias("t_c")
            ),
            "cls",
            "left",
        )
        .join(
            train_docs.groupBy(F.col(label_col).alias("cls")).agg(
                F.count("*").cast("bigint").alias("nd_c")
            ),
            "cls",
            "left",
        )
        .select(
            "cls",
            F.coalesce("t_c", F.lit(0)).cast("bigint").alias("t_c"),
            F.coalesce("nd_c", F.lit(0)).cast("bigint").alias("nd_c"),
        )
        .crossJoin(
            F.broadcast(
                log2_fp16(
                    train_docs.agg(
                        F.count("*").cast("bigint").alias("n_train")
                    ),
                    f"n_train + {n_classes}",
                    "lg_pd",
                ).select("lg_pd")
            )
        )
    )
    consts = log2_fp16(consts, f"t_c + {n_buckets}", "lg_den")
    consts = log2_fp16(consts, "nd_c + 1", "lg_pn")
    return wt, consts.select(
        "cls",
        (F.col("lg_pn") - F.col("lg_pd")).cast("bigint").alias("prior_fp"),
        "lg_den",
    )


def nb_score_against(
    docs: DataFrame,
    wt: DataFrame,
    consts: DataFrame,
    classes: tuple = NB_CLASSES,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_out: str = "pred_label",
    n_buckets: int = DSIR_BUCKETS,
    portable: bool = True,
) -> DataFrame:
    """Score docs against a FROZEN NB model (:func:`nb_fit` frames) —
    the inference half: bucket counts per doc, one broadcast join per
    frame, argmax + margin.  Output: (id, <label_out>, score_fp,
    margin_fp)."""
    doc_bkt = (
        docs.select(
            F.col(id_col), F.explode(tokens_col(text_col)).alias("tok")
        )
        .select(id_col, _bucket_col(portable, n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("bigint").alias("k"))
    )
    doc_tot = docs.select(id_col).join(
        doc_bkt.groupBy(id_col).agg(
            F.sum("k").cast("bigint").alias("n_tok")
        ),
        id_col,
        "left",
    ).select(
        id_col, F.coalesce("n_tok", F.lit(0)).cast("bigint").alias("n_tok")
    )
    partial = (
        doc_bkt.join(F.broadcast(wt), "bucket")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("k") * F.col("lg_ct")).cast("bigint").alias("part"))
    )
    scored = (
        doc_tot.select(
            "*",
            F.explode(F.array(*[F.lit(c) for c in classes])).alias("cls"),
        )
        .join(F.broadcast(consts), "cls")
        .join(partial, [id_col, "cls"], "left")
        .select(
            id_col,
            "cls",
            (
                F.col("prior_fp")
                + F.coalesce("part", F.lit(0))
                - F.col("n_tok") * F.col("lg_den")
            )
            .cast("bigint")
            .alias("score_fp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_fp"), F.asc("cls"))
    ranked = scored.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.lead("score_fp").over(w).alias("score2"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        id_col,
        F.col("cls").alias(label_out),
        "score_fp",
        (F.col("score_fp") - F.coalesce("score2", F.col("score_fp")))
        .cast("bigint")
        .alias("margin_fp"),
    )
