"""Round-10 optimization equivalence pins.

Every optimization this round is a plan change that must be
output-IDENTICAL to the shape it replaces; these tests pin that
equivalence operator-by-operator on real testdata:

- pq_topk_multi / ivfpq_topk_multi / pq_topk_rerank_multi vs one
  single-probe call per probe (the pre-r10 per-leg loop);
- the shared-tokenize variants of the quality/dedup text legs vs their
  standalone (re-tokenizing) forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import similarity
from real_time_data_pipeline_spark.schemas import load_table

N_PROBES = 3
K = 5


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _probes(emb):
    qrows = (
        emb.filter(F.col("vec_id") < N_PROBES)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(r["vec_id"], r["embedding"]) for r in
            sorted(qrows, key=lambda r: r["vec_id"])]


def test_pq_topk_multi_matches_per_probe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(emb, m=16, k=16, iters=2)
    codes = similarity.pq_encode(emb, books)
    probes = _probes(emb)
    multi = similarity.pq_topk_multi(codes, books, probes, k=K)
    got = _rows(multi, ["query_id", "id", "adc_d2"])
    want = []
    for qid, vec in probes:
        leg = similarity.pq_topk(codes, books, vec, k=K)
        want.extend(
            (qid, r["id"], r["adc_d2"]) for r in leg.collect()
        )
    assert got == sorted(want)


def test_ivfpq_topk_multi_matches_per_probe_full_probe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = 8
    Cm, books, codes = similarity.ivfpq_build(
        emb, n_cells=n_cells, m=8, k=16, iters=1
    )
    codes = codes.persist()
    probes = _probes(emb)
    multi = similarity.ivfpq_topk_multi(
        codes, Cm, books, probes, k=K, nprobe=n_cells
    )
    got = _rows(multi, ["query_id", "id", "cell", "adc_d2"])
    want = []
    for qid, vec in probes:
        leg = similarity.ivfpq_topk(codes, Cm, books, vec, k=K,
                                    nprobe=n_cells)
        want.extend(
            (qid, r["id"], r["cell"], r["adc_d2"]) for r in leg.collect()
        )
    codes.unpersist()
    assert got == sorted(want)


def test_pq_topk_rerank_multi_matches_per_probe(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = similarity.pq_fit(emb, m=16, k=16, iters=2)
    codes = similarity.pq_encode(emb, books).persist()
    probes = _probes(emb)
    cols = ["query_id", "rank", "neighbor_id", "cos_bp"]
    multi = similarity.pq_topk_rerank_multi(
        emb, codes, books, probes, k=K, shortlist=1 << 30
    )
    got = _rows(multi, cols)
    want = []
    for qid, vec in probes:
        leg = similarity.pq_topk_rerank(
            emb, codes, books, vec, k=K, shortlist=1 << 30, query_id=qid
        )
        want.extend(tuple(r) for r in leg.select(*cols).collect())
    codes.unpersist()
    assert got == sorted(want)


def test_quality_verdicts_shared_tokens_identical(spark, sf_dir):
    from real_time_data_pipeline_spark.operators import curation
    from real_time_data_pipeline_spark.operators.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(docs.source == "src0")
    toksf = docs.select(
        F.col("doc_id"),
        F.length(F.col("text")).alias("n_chars"),
        tokens_col("text").alias("toks"),
    )
    base = curation.quality_verdicts(docs, bench)
    shared = curation.quality_verdicts(docs, bench, tokens_frame=toksf)
    cols = base.columns
    assert _rows(base, cols) == _rows(shared, cols)


def test_near_dup_text_signals_shared_tokens_identical(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.dedup import (
        near_dup_text_signals,
        tokens_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    toksf = docs.select(
        F.col("doc_id"),
        F.length(F.col("text")).alias("n_chars"),
        tokens_col("text").alias("toks"),
    )
    base = near_dup_text_signals(docs, jaccard_threshold=0.8)
    shared = near_dup_text_signals(
        docs, jaccard_threshold=0.8, tokens_frame=toksf
    )
    for key, cols in (
        ("exact_flags", ["doc_id", "is_exact_dup"]),
        ("exact_edges", ["id_a", "id_b"]),
        ("mh_pairs", ["id_a", "id_b"]),
    ):
        assert _rows(base[key], cols) == _rows(shared[key], cols), key
