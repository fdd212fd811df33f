"""Oracle-backed registry entries for the data-selection tier
(operators/selection.py): DSIR importance weights + top-k selection,
CCNet perplexity terciles, and A-ES weighted stratified sampling.

Every float log is replaced by the shared fixed-point log2
(operators/selection.GRID_HEX): the oracle CTEs below re-run the SAME
integer pipeline — normalize to a 30-bit mantissa with shifts, index
the top 10 bits into the 1025-entry grid parsed from the SAME hex
literal, linearly interpolate the 20 remainder bits — so the values are
bit-identical by construction, not by libm luck.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

from real_time_data_pipeline_spark.operators import selection as SEL
from real_time_data_pipeline_spark.queries.dedup import (
    DUCK_TOKENS,
    duck_hexfold_n,
)
from real_time_data_pipeline_spark.schemas import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------- shared oracle SQL

def _fold5(expr: str) -> str:
    """Ascii-fold 5 lowercase-hex chars of an existing column into a
    bigint (the queries/text._fold_hex recipe at width 5, for the
    grid-table literal)."""
    hv = lambda i: (  # noqa: E731
        f"(CASE WHEN ascii(substr({expr}, {i}, 1)) >= 97 "
        f"THEN CAST(ascii(substr({expr}, {i}, 1)) AS BIGINT) - 87 "
        f"ELSE CAST(ascii(substr({expr}, {i}, 1)) AS BIGINT) - 48 END)"
    )
    folded = hv(1)
    for i in range(2, 6):
        folded = f"({folded} * 16 + {hv(i)})"
    return folded


# The grid literal appears once per oracle (raw chunks in fpgrid_raw);
# the folds run on the materialized 5-char slices, not on the literal.
_FPGRID = f"""
    fpgrid_raw AS (
      SELECT CAST(t.i AS BIGINT) AS g,
             substr('{SEL.GRID_HEX}', CAST(t.i * 5 + 1 AS INT), 5) AS h5,
             substr('{SEL.GRID_HEX}', CAST(t.i * 5 + 6 AS INT), 5) AS h5n
      FROM range(1024) t(i)
    ),
    fpgrid AS (
      SELECT g, {_fold5('h5')} AS fp, {_fold5('h5n')} AS fp_nxt
      FROM fpgrid_raw
    )"""


def _lg(src: str, x_expr: str, out: str, tag: str) -> str:
    """Chained-CTE twin of operators/selection.log2_fp16: attach fp16
    log2 of ``x_expr`` (a positive BIGINT expression over ``src``) as
    ``out``; the resulting CTE is named ``tag``."""
    return f"""
    {tag}_pre AS (
      SELECT s.*,
             CAST({x_expr} AS BIGINT) AS {tag}_x,
             length(bin({tag}_x)) - 1 AS {tag}_e,
             CASE WHEN {tag}_e >= 30 THEN {tag}_x >> ({tag}_e - 30)
                  ELSE {tag}_x << (30 - {tag}_e) END AS {tag}_m,
             ({tag}_m - 1073741824) >> 20 AS {tag}_g,
             ({tag}_m - 1073741824) % 1048576 AS {tag}_r
      FROM {src} s
    ),
    {tag} AS (
      SELECT p.* EXCLUDE ({tag}_x, {tag}_e, {tag}_m, {tag}_g, {tag}_r),
             {tag}_e * 65536 + fg.fp
               + (((fg.fp_nxt - fg.fp) * {tag}_r) >> 20) AS {out}
      FROM {tag}_pre p JOIN fpgrid fg ON fg.g = p.{tag}_g
    )"""


_BKT = f"CAST({duck_hexfold_n('tok', 15)} AS BIGINT) % {SEL.DSIR_BUCKETS}"


def _dsir_wts_ctes(where_sql: str = "") -> str:
    """CTE chain computing the DSIR weight table over ``documents``
    (optionally sliced by ``where_sql``), ending in a CTE named ``wts``
    with columns (bucket, n_target, n_raw, weight_fp).  ONE generator
    for the full/incremental/frozen-gate oracles so the smoothing and
    log recipe can never drift between them."""
    return f"""
    toks AS (
      SELECT unnest({DUCK_TOKENS}) AS tok,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t
      FROM documents {where_sql}
    ),
    bkt AS (SELECT {_BKT} AS bucket, is_t FROM toks),
    counts AS (
      SELECT bucket, CAST(SUM(is_t) AS BIGINT) AS n_target,
             CAST(COUNT(*) AS BIGINT) AS n_raw
      FROM bkt GROUP BY 1
    ),
    dense AS (
      SELECT CAST(t.i AS BIGINT) AS bucket,
             CAST(COALESCE(c.n_target, 0) AS BIGINT) AS n_target,
             CAST(COALESCE(c.n_raw, 0) AS BIGINT) AS n_raw
      FROM range({SEL.DSIR_BUCKETS}) t(i)
      LEFT JOIN counts c ON c.bucket = t.i
    ),
    tot0 AS (
      SELECT CAST(SUM(n_target) AS BIGINT) + {SEL.DSIR_BUCKETS} AS ttb,
             CAST(SUM(n_raw) AS BIGINT) + {SEL.DSIR_BUCKETS} AS trb
      FROM dense
    ),
    {_lg('tot0', 'ttb', 'lg_tt', 'lt1')},
    {_lg('lt1', 'trb', 'lg_tr', 'lt2')},
    densetot AS (
      SELECT d.*, l.lg_tt, l.lg_tr FROM dense d CROSS JOIN lt2 l
    ),
    {_lg('densetot', 'n_target + 1', 'lg_ct', 'lc1')},
    {_lg('lc1', 'n_raw + 1', 'lg_cr', 'lc2')},
    wts AS (
      SELECT bucket, n_target, n_raw,
             CAST(lg_ct + lg_tr - lg_cr - lg_tt AS BIGINT) AS weight_fp
      FROM lc2
    )"""


# ------------------------------------------------------------ dsir_weights

def q_dsir_weights(spark, sf_dir):
    """DSIR learned importance weights (Xie et al. 2023,
    operators/selection.dsir_bucket_weights): hashed-token bucket
    counts under the target slice (lang='en') vs the raw corpus as
    fp16 log probability ratios — the review table a curator reads
    before running the selection itself."""
    return SEL.dsir_bucket_weights(_docs(spark, sf_dir))


QUERIES["dsir_weights"] = q_dsir_weights

ORACLES["dsir_weights"] = f"""
    WITH {_FPGRID},
    {_dsir_wts_ctes()}
    SELECT bucket, n_target, n_raw, weight_fp FROM wts
"""


# ------------------------------------------------------------- dsir_select

def q_dsir_select(spark, sf_dir):
    """DSIR top-k selection (operators/selection.dsir_select): every
    doc scored by the sum of its tokens' learned bucket weights, top
    20% kept (deterministic variant; ties by doc_id)."""
    return SEL.dsir_select(_docs(spark, sf_dir))


QUERIES["dsir_select"] = q_dsir_select

ORACLES["dsir_select"] = f"""
    WITH {_FPGRID},
    {_dsir_wts_ctes()},
    doctok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents
    ),
    docbkt AS (
      SELECT doc_id, {_BKT} AS bucket, CAST(COUNT(*) AS BIGINT) AS k
      FROM doctok GROUP BY 1, 2
    ),
    scores AS (
      SELECT doc_id, CAST(SUM(k * weight_fp) AS BIGINT) AS score_fp
      FROM docbkt JOIN wts USING (bucket) GROUP BY 1
    )
    SELECT doc_id, score_fp FROM (
      SELECT doc_id, score_fp,
             ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id) AS rn,
             (SELECT COUNT(*) FROM documents) AS n
      FROM scores
    ) WHERE rn <= n // {SEL.DSIR_TOP_FRAC_DEN}
"""


# --------------------------------------------------- ccnet_ppl_buckets

def q_ccnet_ppl_buckets(spark, sf_dir):
    """CCNet perplexity terciles (Wenzek et al. 2020,
    operators/selection.ccnet_perplexity_buckets): per-language unigram
    cross-entropy per token in fp16 bits, docs bucketed head/middle/
    tail per language."""
    return SEL.ccnet_perplexity_buckets(_docs(spark, sf_dir))


QUERIES["ccnet_ppl_buckets"] = q_ccnet_ppl_buckets

ORACLES["ccnet_ppl_buckets"] = f"""
    WITH {_FPGRID},
    toks AS (
      SELECT doc_id, lang, unnest({DUCK_TOKENS}) AS tok FROM documents
    ),
    doc_tok AS (
      SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS k
      FROM toks GROUP BY 1, 2, 3
    ),
    vocab0 AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cf
      FROM toks GROUP BY 1, 2
    ),
    ltot0 AS (
      SELECT lang, CAST(SUM(cf) AS BIGINT) AS t FROM vocab0 GROUP BY 1
    ),
    {_lg('ltot0', 't', 'lg_t', 'lx1')},
    {_lg('vocab0', 'cf', 'lg_cf', 'lx2')},
    scored AS (
      SELECT d.doc_id, d.lang,
             CAST(CAST(SUM(d.k * (lt.lg_t - v.lg_cf)) AS BIGINT)
                  // CAST(SUM(d.k) AS BIGINT) AS BIGINT)
                 AS bits_per_tok_fp
      FROM doc_tok d
      JOIN lx2 v ON v.lang = d.lang AND v.tok = d.tok
      JOIN lx1 lt ON lt.lang = d.lang
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, bits_per_tok_fp,
           CASE ntile(3) OVER (PARTITION BY lang
                               ORDER BY bits_per_tok_fp, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored
"""


# ------------------------------------------------------ weighted_sample

def _duck_hexfold48(col_expr: str) -> str:
    return duck_hexfold_n(col_expr, 12)


def q_weighted_sample(spark, sf_dir):
    """A-ES weighted sampling without replacement (Efraimidis &
    Spirakis 2006, operators/selection.weighted_sample_stratified): 20
    docs per language, inclusion proportional to n_chars, via the
    portable sha256 uniform + fixed-point log — zero RNG, reproducible
    anywhere.  The exact-distribution upgrade of the `weighted_sample`
    u/w-rank heuristic (analytics_ext) and the weighted counterpart of
    `balanced_sample` (uniform hash-rank per group): A-ES keys
    u^(1/w) are the provably-correct inclusion probabilities for
    sampling without replacement."""
    return SEL.weighted_sample_stratified(_docs(spark, sf_dir))


QUERIES["weighted_sample_aes"] = q_weighted_sample

ORACLES["weighted_sample_aes"] = f"""
    WITH {_FPGRID},
    keyed0 AS (
      SELECT doc_id, lang AS stratum,
             CAST(GREATEST(n_chars, 1) AS BIGINT) AS w,
             CAST({_duck_hexfold48('CAST(doc_id AS VARCHAR)')} AS BIGINT)
               + 1 AS u
      FROM documents
    ),
    {_lg('keyed0', 'u', 'lg_u', 'lu1')},
    ranked AS (
      SELECT doc_id, stratum, w,
             ROW_NUMBER() OVER (
               PARTITION BY stratum
               ORDER BY (({48 * SEL.FP_ONE} - lg_u) << 20) // w, doc_id
             ) AS sample_rank
      FROM lu1
    )
    SELECT doc_id, stratum, w, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM ranked WHERE sample_rank <= 20
"""


# ------------------------------------------- dsir_weights_incremental

def q_dsir_weights_incremental(spark, sf_dir):
    """Incremental DSIR model refresh
    (operators/selection.dsir_weights_incremental): docs with
    doc_id % 10 == 0 play the daily increment, the rest the history
    whose dense bucket-count table is a staged artifact (first call
    per sf builds it; in production it is maintained by the same add).
    Only the increment is tokenized; counts ADD; weights re-derive
    from n_buckets rows.  Oracle: ground-up recompute over the FULL
    corpus — the equality certificate that the incremental fold loses
    nothing."""
    import os

    docs = _docs(spark, sf_dir)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    wh = os.path.join(
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
        "spark-warehouse",
    )
    path = os.path.join(
        wh, f"dsir_counts_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    try:
        n = spark.read.parquet(path).count()
        assert n == SEL.DSIR_BUCKETS
    except Exception:
        SEL.build_dsir_counts(hist, path)
    return SEL.dsir_weights_incremental(spark, new, path)


QUERIES["dsir_weights_incremental"] = q_dsir_weights_incremental

# The certificate: incremental fold == ground-up full-corpus weights.
ORACLES["dsir_weights_incremental"] = ORACLES["dsir_weights"]


# ------------------------------------------------------ stream_dsir_gate

def q_stream_dsir_gate(spark, sf_dir):
    """Streaming twin of the DSIR ingest gate: weights are FROZEN from
    the history slice (doc_id % 10 != 0), then the increment ARRIVES AS
    A STREAM and every micro-batch scores its docs against the
    broadcast weight frame (operators/selection.dsir_score_against).
    A doc's tokens land in one batch, so per-batch outputs are disjoint
    by doc id and their union equals the one-shot scoring — the
    property the oracle pins end-to-end through the
    readStream→foreachBatch cycle."""
    from real_time_data_pipeline_spark.queries.reference_parity import (
        stream_capture,
    )

    docs = _docs(spark, sf_dir)
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    w = SEL.dsir_bucket_weights(hist).select("bucket", "weight_fp")
    out_schema = SEL.dsir_score_against(docs.limit(0), w.limit(0)).schema

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/documents*.parquet")
        .filter(F.col("doc_id") % 10 == 0)
    )
    # r11: per-batch scores go to the parquet capture sink instead of
    # collecting rows through the driver (see stream_capture).
    return stream_capture(
        stream, "stream_dsir_gate",
        transform=lambda b: SEL.dsir_score_against(b, w),
        schema=out_schema,
    )


QUERIES["stream_dsir_gate"] = q_stream_dsir_gate

ORACLES["stream_dsir_gate"] = f"""
    WITH {_FPGRID},
    {_dsir_wts_ctes("WHERE doc_id % 10 != 0")},
    doctok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tok
      FROM documents WHERE doc_id % 10 = 0
    ),
    docbkt AS (
      SELECT doc_id, {_BKT} AS bucket, CAST(COUNT(*) AS BIGINT) AS k
      FROM doctok GROUP BY 1, 2
    )
    SELECT doc_id, CAST(SUM(k * weight_fp) AS BIGINT) AS score_fp
    FROM docbkt JOIN wts USING (bucket) GROUP BY 1
"""


# ---------------------------------------------------- dsir_sample_gumbel

def q_dsir_sample_gumbel(spark, sf_dir):
    """DSIR's Gumbel-top-k resampler
    (operators/selection.dsir_sample_gumbel): inclusion probability
    proportional to the importance weight, realized with the portable
    sha256 uniform + fixed-point base-2 Gumbel noise — the paper's
    sampler, deterministic in any engine.  Top 20% kept."""
    return SEL.dsir_sample_gumbel(_docs(spark, sf_dir))


QUERIES["dsir_sample_gumbel"] = q_dsir_sample_gumbel

ORACLES["dsir_sample_gumbel"] = f"""
    WITH {_FPGRID},
    {_dsir_wts_ctes()},
    doctok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents
    ),
    docbkt AS (
      SELECT doc_id, {_BKT} AS bucket, CAST(COUNT(*) AS BIGINT) AS k
      FROM doctok GROUP BY 1, 2
    ),
    scores0 AS (
      SELECT doc_id, CAST(SUM(k * weight_fp) AS BIGINT) AS score_fp,
             CAST({_duck_hexfold48('CAST(doc_id AS VARCHAR)')} AS BIGINT)
               + 1 AS u
      FROM docbkt JOIN wts USING (bucket) GROUP BY 1
    ),
    {_lg('scores0', 'u', 'lg_u', 'lg1')},
    tf AS (
      SELECT doc_id, score_fp,
             GREATEST({48 * SEL.FP_ONE} - lg_u, 1) AS t_fp
      FROM lg1
    ),
    {_lg('tf', 't_fp', 'lg_t', 'lg2')},
    keyed AS (
      SELECT doc_id, score_fp,
             CAST(score_fp + {16 * SEL.FP_ONE + SEL.GUMBEL_C_FP} - lg_t
                  AS BIGINT) AS key_fp
      FROM lg2
    )
    SELECT doc_id, score_fp, key_fp FROM (
      SELECT k.*, ROW_NUMBER() OVER (ORDER BY key_fp DESC, doc_id) AS rn,
             (SELECT COUNT(*) FROM documents) AS n
      FROM keyed k
    ) WHERE rn <= n // {SEL.DSIR_TOP_FRAC_DEN}
"""


# ------------------------------------------------------ ccnet_bigram_ppl

def q_ccnet_bigram_ppl(spark, sf_dir):
    """First-order CCNet bucketing
    (operators/selection.ccnet_bigram_ppl): per-language bigram LM
    with Laplace smoothing over the vocabulary, mean bits per adjacent
    pair in fp16, head/middle/tail terciles per language.  Single-token
    docs (no pair) are excluded by construction."""
    return SEL.ccnet_bigram_ppl(_docs(spark, sf_dir))


QUERIES["ccnet_bigram_ppl"] = q_ccnet_bigram_ppl

_PAIR_RANGE = "range(1, greatest(len(t) - 1, 0) + 1)"

ORACLES["ccnet_bigram_ppl"] = f"""
    WITH {_FPGRID},
    base AS (SELECT doc_id, lang, {DUCK_TOKENS} AS t FROM documents),
    pairs AS (
      SELECT doc_id, lang,
             unnest(list_transform({_PAIR_RANGE}, i -> t[i])) AS w1,
             unnest(list_transform({_PAIR_RANGE}, i -> t[i + 1])) AS w2
      FROM base
    ),
    doc_pair AS (
      SELECT doc_id, lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM pairs GROUP BY 1, 2, 3, 4
    ),
    big0 AS (
      SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS big
      FROM pairs GROUP BY 1, 2, 3
    ),
    ctx0 AS (
      SELECT lang, w1, CAST(COUNT(*) AS BIGINT) AS ctx
      FROM pairs GROUP BY 1, 2
    ),
    vsz AS (
      SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT lang, unnest({DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY 1
    ),
    ctxv AS (SELECT c.*, v.v FROM ctx0 c JOIN vsz v USING (lang)),
    {_lg('ctxv', 'ctx + v', 'lg_ctx', 'lb1')},
    {_lg('big0', 'big + 1', 'lg_big', 'lb2')},
    scored AS (
      SELECT d.doc_id, d.lang,
             CAST(CAST(SUM(d.k * (c.lg_ctx - b.lg_big)) AS BIGINT)
                  // CAST(SUM(d.k) AS BIGINT) AS BIGINT)
                 AS bits_per_pair_fp
      FROM doc_pair d
      JOIN lb2 b ON b.lang = d.lang AND b.w1 = d.w1 AND b.w2 = d.w2
      JOIN lb1 c ON c.lang = d.lang AND c.w1 = d.w1
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, bits_per_pair_fp,
           CASE ntile(3) OVER (PARTITION BY lang
                               ORDER BY bits_per_pair_fp, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored
"""


# --------------------------------------------------------- nb_classify

NB_SPEED_CLASSES = ("even", "fast", "slow")


def _docs_with_speed_label(spark, sf_dir):
    """Documents + the content-derived 3-class label the supervised
    tier trains on.  The synthetic corpus's metadata columns are
    content-INDEPENDENT by construction (every lang/source draws the
    same 31-token vocabulary — verified at sf0.01 — so a classifier on
    them is Bayes-bound at the majority prior); the demo label is the
    fast-vs-slow token majority, which a bag-of-buckets model must
    LEARN as count-ratio evidence rather than read off a column.  In
    production the label column comes from human/external annotation —
    identical dataflow."""
    from real_time_data_pipeline_spark.operators.dedup import tokens_col

    docs = _docs(spark, sf_dir)
    nf = F.size(F.filter(tokens_col("text"), lambda t: t == F.lit("fast")))
    ns = F.size(F.filter(tokens_col("text"), lambda t: t == F.lit("slow")))
    return docs.withColumn(
        "speed_label",
        F.when(nf > ns, F.lit("fast"))
        .when(nf < ns, F.lit("slow"))
        .otherwise(F.lit("even")),
    )


def q_nb_classify(spark, sf_dir):
    """Trained hashed-feature multinomial Naive Bayes
    (operators/selection.nb_train_classify): the fastText-style
    in-domain/quality classifier of CCNet and the GPT-3 WebText filter
    in count-exact form — Laplace counts + fp16 logs, trained on the
    doc_id%5!=0 split, every doc scored, argmax + margin emitted.
    Measured held-out accuracy at sf0.01: 59% vs the 40% majority
    prior (the multinomial-proportion approximation of a count-
    comparison boundary — the lift, not SOTA, is the point; the
    machinery is engine-exact end to end)."""
    return SEL.nb_train_classify(
        _docs_with_speed_label(spark, sf_dir),
        label_col="speed_label",
        classes=NB_SPEED_CLASSES,
    )


QUERIES["nb_classify"] = q_nb_classify


def q_nb_confusion(spark, sf_dir):
    """Held-out confusion matrix of the NB classifier
    (operators/selection.nb_confusion) — the model-quality ledger, one
    row per observed (true, predicted) pair on the test split."""
    return SEL.nb_confusion(
        _docs_with_speed_label(spark, sf_dir),
        label_col="speed_label",
        classes=NB_SPEED_CLASSES,
    )


QUERIES["nb_confusion"] = q_nb_confusion

_NB_CLASSES_SQL = ", ".join(f"('{c}')" for c in NB_SPEED_CLASSES)

# Full model recompute: counts, priors, denominators, per-doc argmax —
# every log through the shared fp16 grid.  ONE generator for the batch
# classifier and the streaming gate oracles (different train/score
# slices, same model recipe) so the smoothing can never drift.
def _nb_ctes(test_pred_sql: str, score_where: str = "") -> str:
    return f"""
    lab AS (
      SELECT doc_id,
             CASE WHEN {test_pred_sql}
                  THEN 'test' ELSE 'train' END AS split,
             CASE WHEN nf > ns THEN 'fast'
                  WHEN nf < ns THEN 'slow'
                  ELSE 'even' END AS speed_label
      FROM (
        SELECT doc_id,
               len(list_filter({DUCK_TOKENS}, x -> x = 'fast')) AS nf,
               len(list_filter({DUCK_TOKENS}, x -> x = 'slow')) AS ns
        FROM documents
      )
    ),
    doctok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents
    ),
    docbkt AS (
      SELECT doc_id, {_BKT} AS bucket, CAST(COUNT(*) AS BIGINT) AS k
      FROM doctok GROUP BY 1, 2
    ),
    doctot AS (
      SELECT l.doc_id, l.speed_label, l.split,
             CAST(COALESCE(s.n_tok, 0) AS BIGINT) AS n_tok
      FROM lab l LEFT JOIN (
        SELECT doc_id, SUM(k) AS n_tok FROM docbkt GROUP BY 1
      ) s USING (doc_id) {score_where}
    ),
    clsc0 AS (
      SELECT l.speed_label AS cls, b.bucket, CAST(SUM(b.k) AS BIGINT) AS cnt
      FROM docbkt b JOIN lab l USING (doc_id)
      WHERE l.split = 'train' GROUP BY 1, 2
    ),
    {_lg('clsc0', 'cnt + 1', 'lg_ct', 'lnb1')},
    classes AS (
      SELECT * FROM (VALUES {_NB_CLASSES_SQL}) t(cls)
    ),
    consts0 AS (
      SELECT c.cls, CAST(COALESCE(t.t_c, 0) AS BIGINT) AS t_c,
             CAST(COALESCE(n.nd_c, 0) AS BIGINT) AS nd_c
      FROM classes c
      LEFT JOIN (SELECT cls, SUM(cnt) AS t_c FROM clsc0 GROUP BY 1) t
        USING (cls)
      LEFT JOIN (
        SELECT speed_label AS cls, COUNT(*) AS nd_c
        FROM lab WHERE split = 'train' GROUP BY 1
      ) n USING (cls)
    ),
    ntr0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) + {len(NB_SPEED_CLASSES)} AS ntr
      FROM lab WHERE split = 'train'
    ),
    {_lg('ntr0', 'ntr', 'lg_pd', 'lnb2')},
    constsx AS (SELECT c.*, p.lg_pd FROM consts0 c CROSS JOIN lnb2 p),
    {_lg('constsx', f't_c + {SEL.DSIR_BUCKETS}', 'lg_den', 'lnb3')},
    {_lg('lnb3', 'nd_c + 1', 'lg_pn', 'lnb4')},
    consts AS (
      SELECT cls, CAST(lg_pn - lg_pd AS BIGINT) AS prior_fp, lg_den
      FROM lnb4
    ),
    nbpart AS (
      SELECT b.doc_id, w.cls, CAST(SUM(b.k * w.lg_ct) AS BIGINT) AS part
      FROM docbkt b JOIN lnb1 w ON w.bucket = b.bucket GROUP BY 1, 2
    ),
    nbscored AS (
      SELECT d.doc_id, d.speed_label, d.split, c.cls,
             CAST(c.prior_fp + COALESCE(p.part, 0) - d.n_tok * c.lg_den
                  AS BIGINT) AS score_fp
      FROM doctot d CROSS JOIN consts c
      LEFT JOIN nbpart p ON p.doc_id = d.doc_id AND p.cls = c.cls
    ),
    nbranked AS (
      SELECT s.*,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_fp DESC, cls) AS rn,
             lead(score_fp) OVER (PARTITION BY doc_id
                                  ORDER BY score_fp DESC, cls) AS score2
      FROM nbscored s
    ),
    nbout AS (
      SELECT doc_id, speed_label, split, cls AS pred_speed_label,
             score_fp,
             CAST(score_fp - COALESCE(score2, score_fp) AS BIGINT)
                 AS margin_fp,
             (cls = speed_label) AS correct
      FROM nbranked WHERE rn = 1
    )"""


_NB_CTES = _nb_ctes(f"doc_id % {SEL.NB_HOLDOUT_MOD} = 0")

ORACLES["nb_classify"] = f"""
    WITH {_FPGRID},
    {_NB_CTES}
    SELECT * FROM nbout
"""

ORACLES["nb_confusion"] = f"""
    WITH {_FPGRID},
    {_NB_CTES}
    SELECT speed_label, pred_speed_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM nbout WHERE split = 'test' GROUP BY 1, 2
"""


# ------------------------------------------------------ stream_nb_gate

def q_stream_nb_gate(spark, sf_dir):
    """Streaming twin of the NB classification gate: the model is
    FROZEN on the history slice (doc_id % 10 != 0 — nb_fit's two
    broadcastable frames), then the increment ARRIVES AS A STREAM and
    every micro-batch classifies its docs against the frozen frames
    (operators/selection.nb_score_against) through
    readStream→foreachBatch — the stream_dsir_gate dataflow with an
    argmax classifier in place of the importance score.  A doc's
    tokens land in one batch, so per-batch outputs are disjoint by doc
    id and their union equals the one-shot scoring — the property the
    oracle (a ground-up batch recompute of model + increment scores)
    pins end-to-end."""
    from real_time_data_pipeline_spark.queries.reference_parity import (
        stream_capture,
    )

    docs = _docs_with_speed_label(spark, sf_dir)
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    wt, consts = SEL.nb_fit(
        hist, label_col="speed_label", classes=NB_SPEED_CLASSES
    )
    wt = wt.cache()
    consts = consts.cache()
    out_schema = SEL.nb_score_against(
        docs.limit(0), wt.limit(0), consts.limit(0),
        classes=NB_SPEED_CLASSES,
    ).schema

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/documents*.parquet")
        .filter(F.col("doc_id") % 10 == 0)
    )
    # r11: per-batch scores go to the parquet capture sink instead of
    # collecting rows through the driver (see stream_capture).
    out = stream_capture(
        stream, "stream_nb_gate",
        transform=lambda b: SEL.nb_score_against(
            b, wt, consts, classes=NB_SPEED_CLASSES
        ),
        schema=out_schema,
    )
    wt.unpersist()
    consts.unpersist()
    return out


QUERIES["stream_nb_gate"] = q_stream_nb_gate

ORACLES["stream_nb_gate"] = f"""
    WITH {_FPGRID},
    {_nb_ctes("doc_id % 10 = 0", "WHERE l.split = 'test'")}
    SELECT doc_id, pred_speed_label AS pred_label, score_fp, margin_fp
    FROM nbout
"""
