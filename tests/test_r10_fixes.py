"""Round-10 regression tests.

1. The blocked-GEMM prefilter plan of embedding_near_dup is
   bit-identical to the naive nested-loop plan (lossless prune +
   exact sequential-fold verify), including across the size-adaptive
   cutover and with zero-norm vectors in play.
2. ngram_jaccard_pairs' size-adaptive PPJoin delegation is
   bit-identical to the naive shared-shingle plan.
3. The PPJoin length filter added to minhash_lsh_candidates' verify
   stage loses no verified pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import cache, dedup
from real_time_data_pipeline_spark.schemas import load_table


def _emb_with_zero(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    zero = spark.createDataFrame(
        [(10_000_001, [0.0] * dim, 0)], "vec_id long, embedding array<float>, label int"
    )
    return emb.unionByName(zero)


def test_embedding_gemm_plan_equals_naive(spark, sf_dir):
    """Forced-GEMM (gemm_min_rows=0, block_rows small enough to force a
    multi-block grid with diagonal AND off-diagonal cells) equals the
    nested-loop plan row-for-row, zero-norm vectors excluded on both."""
    emb = _emb_with_zero(spark, sf_dir)
    gemm = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4,
            gemm_min_rows=0, block_rows=97,
        ).collect()
    }
    naive = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, naive=True
        ).collect()
    }
    cache.release_all()
    assert gemm == naive and len(gemm) > 0


def test_embedding_gemm_probe_filter_equals_naive(spark, sf_dir):
    """The probe_filter (asymmetric) path: full grid, a-side-is-probe
    orientation — same output as the naive restricted join."""
    emb = load_table(spark, sf_dir, "embeddings")
    flt = "id % 7 = 0"
    gemm = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.3,
            probe_filter=flt, gemm_min_rows=0, block_rows=101,
        ).collect()
    }
    naive = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.3,
            probe_filter=flt, naive=True,
        ).collect()
    }
    cache.release_all()
    assert gemm == naive and len(gemm) > 0


def test_embedding_adaptive_cutover_consistent(spark, sf_dir):
    """Either side of the gemm_min_rows cutover produces the same rows
    (the switch is a plan choice, never a semantics choice)."""
    emb = load_table(spark, sf_dir, "embeddings")
    lo = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, gemm_min_rows=10**9
        ).collect()
    }
    hi = {
        (r.id_a, r.id_b): r.cos_bp
        for r in dedup.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, gemm_min_rows=0
        ).collect()
    }
    cache.release_all()
    assert lo == hi and len(lo) > 0


def test_ngram_jaccard_adaptive_equals_naive(spark, sf_dir):
    """ppjoin_min_rows=0 forces the PPJoin delegation; output must be
    bit-identical to the naive shared-shingle join."""
    docs = load_table(spark, sf_dir, "documents")
    pp = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard_bp)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8, ppjoin_min_rows=0
        ).collect()
    }
    naive = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard_bp)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8, naive=True
        ).collect()
    }
    cache.release_all()
    assert pp == naive and len(pp) > 0


def test_minhash_verify_length_filter_lossless(spark, sf_dir):
    """The length filter prunes only size-mismatched candidates: the
    verified pair set still equals the exact Jaccard pair set (w.h.p.
    at 128/32 banding, the standing certification argument)."""
    docs = load_table(spark, sf_dir, "documents")
    mh = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard_bp)
        for r in dedup.minhash_lsh_candidates(
            docs, "doc_id", "text", n=3, num_perm=128, bands=32,
            verify_threshold=0.8,
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard_bp)
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8, naive=True
        ).collect()
    }
    cache.release_all()
    assert mh == exact and len(mh) > 0


def test_gopher_zero_token_doc_gets_row(spark):
    """ADVICE r9: a zero-token doc must emit an n_words=0 row with
    keep_gopher=false — not vanish from the output."""
    from real_time_data_pipeline_spark.operators import curation

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and it runs"),
         (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in curation.gopher_quality_flags(df).collect()}
    assert set(out) == {1, 2}
    z = out[2]
    assert z["n_words"] == 0
    assert z["mean_word_len_c"] == 0
    assert z["symbol_ratio_bp"] == 0
    assert z["alpha_frac_bp"] == 0
    assert z["stop_hits"] == 0
    assert z["top_token_bp"] == 0
    assert not z["keep_gopher"] and not z["r_word_count"]


def test_unimax_counts_in_matches_row_grain(spark):
    """The counts-in signature produces the identical water-fill as the
    row-grain path (and sums duplicate group rows)."""
    from real_time_data_pipeline_spark.operators import curation

    rows = [("en",)] * 50 + [("fr",)] * 20 + [("de",)] * 5 + [("xx",)] * 1
    docs = spark.createDataFrame(rows, "lang string")
    by_rows = {
        r["lang"]: (r["n_docs"], r["capacity"], r["alloc_docs"], r["epochs_bp"])
        for r in curation.unimax_allocation(docs, budget_docs=60, max_epochs=3).collect()
    }
    counts = spark.createDataFrame(
        [("en", 30), ("en", 20), ("fr", 20), ("de", 5), ("xx", 1)],
        "lang string, n long",
    )
    by_counts = {
        r["lang"]: (r["n_docs"], r["capacity"], r["alloc_docs"], r["epochs_bp"])
        for r in curation.unimax_allocation(
            counts, budget_docs=60, max_epochs=3, count_col="n"
        ).collect()
    }
    assert by_rows == by_counts and len(by_rows) == 4


def test_c4_battery_thresholds(spark):
    """Hand-computed goldens for every C4 rule (Raffel et al. 2020
    §2.2) at its threshold boundary: terminal-punct variants, the
    exactly-5-words line, case-insensitive 'javascript', each
    doc-grain trip phrase, and the zero-line doc (explode_outer row,
    keep_c4=false)."""
    from real_time_data_pipeline_spark.operators.curation import (
        c4_quality_flags,
    )

    rows = [
        # 1: three keepable lines (>=5 words, terminal '.', '!', '"')
        (1, ["one two three four five.",
             "a b c d e f!",
             'x y z w v"']),
        # 2: only two keepable lines (third has 4 words) -> fails min
        (2, ["one two three four five.",
             "a b c d e f?",
             "w x y z."]),
        # 3: keepable count ok but a line trips JAVASCRIPT (case-insens)
        #    -> that line dropped -> 2 kept -> fails min_lines
        (3, ["one two three four five.",
             "uses JavaScript here today ok.",
             "p q r s t."]),
        # 4: three kept lines but 'lorem ipsum' on a non-kept line
        (4, ["one two three four five.",
             "a b c d e f!",
             "p q r s t.",
             "lorem ipsum"]),
        # 5: brace doc
        (5, ["one two three four five.",
             "a b c d e f!",
             "p q r s t.",
             "function() {"]),
        # 6: policy doc ('Privacy Policy', case-insensitive)
        (6, ["one two three four five.",
             "a b c d e f!",
             "p q r s t.",
             "see our Privacy Policy"]),
        # 7: clean doc, all three lines kept
        (7, ["one two three four five.",
             "a b c d e f!",
             "p q r s t."]),
        # 8: zero-line doc
        (8, []),
        # 9: non-terminal lines only -> 0 kept
        (9, ["one two three four five",
             "a b c d e f",
             "p q r s t"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in c4_quality_flags(df).collect()
    }
    assert len(out) == 9  # explode_outer kept the zero-line doc
    assert out[1]["kept_lines"] == 3 and out[1]["keep_c4"]
    assert out[2]["kept_lines"] == 2 and not out[2]["r_min_lines"]
    assert out[3]["kept_lines"] == 2 and not out[3]["keep_c4"]
    assert out[4]["r_min_lines"] and not out[4]["r_lorem"]
    assert not out[4]["keep_c4"]
    assert out[5]["r_min_lines"] and not out[5]["r_brace"]
    assert out[6]["r_min_lines"] and not out[6]["r_policy"]
    assert out[7]["keep_c4"] and out[7]["r_lorem"] and out[7]["r_brace"]
    assert out[8]["n_lines"] == 0 and not out[8]["keep_c4"]
    assert out[8]["r_lorem"] and out[8]["r_brace"] and out[8]["r_policy"]
    assert out[9]["kept_lines"] == 0 and not out[9]["keep_c4"]
    # kept_bp ledger: doc 2 kept 2/3 -> 6666 bp exact integer div
    assert out[2]["kept_bp"] == 6666
