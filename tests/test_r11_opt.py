"""Equivalence pins for the round-11 optimizations.

Every optimization this round must keep results bit-identical; these
tests pin the non-obvious equivalences on real testdata:

- the certificate's pruned embedding pairs derived as
  ``exact ∩ LSH-candidates`` (a semi-join) equal an independent
  ``embedding_near_dup_lsh`` run of the same configuration;
- ``base_frame`` (the shared persisted (id, v, nrm) projection) does
  not change either embedding leg's output.

The stream capture-sink rewrite is pinned by the oracle itself (all 15
touched stream entries are value-hash-checked), so it needs no extra
pin here.
"""

from __future__ import annotations

import pytest

from real_time_data_pipeline_spark.operators import cache
from real_time_data_pipeline_spark.operators.dedup import (
    embedding_base,
    embedding_near_dup,
    embedding_near_dup_lsh,
    lsh_candidate_pairs,
)
from real_time_data_pipeline_spark.schemas import load_table

PRUNED_KW = dict(
    dim=64, n_planes=4, n_tables=8, probe_hamming=0,
    auto_planes_occupancy=64,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_certificate_pruned_pairs_semijoin_equals_lsh(spark, emb):
    """exact ∩ candidates == an independent sign-LSH run: the LSH leg
    scores candidates with the same fold at the same threshold, so its
    pair set is exactly the exact pair set restricted to candidates —
    the identity q_clean_corpus_pruned_certificate now relies on."""
    eb = embedding_base(emb)
    exact = cache.track(
        embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.4, base_frame=eb
        ).select("id_a", "id_b")
    )
    cand = lsh_candidate_pairs(
        emb, "vec_id", "embedding", base_frame=eb, **PRUNED_KW
    )
    derived = exact.join(cand, ["id_a", "id_b"], "left_semi")

    independent = embedding_near_dup_lsh(
        emb, "vec_id", "embedding", threshold=0.4, **PRUNED_KW
    ).select("id_a", "id_b")
    assert _rows(derived) == _rows(independent)
    cache.release_all()


def test_embedding_near_dup_base_frame_identical(spark, emb):
    eb = embedding_base(emb)
    with_base = embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.4, base_frame=eb
    )
    without = embedding_near_dup(emb, "vec_id", "embedding", threshold=0.4)
    assert _rows(with_base) == _rows(without)
    cache.release_all()


def test_arrowvec_roundtrip_matches_rowwise_parse(spark, emb):
    """list_matrix == the row-wise np.array([...]) parse, and
    list_array round-trips the matrix bit-for-bit — the identity every
    r11 mapInArrow conversion rests on."""
    import numpy as np
    import pyarrow as pa

    from real_time_data_pipeline_spark.operators.arrowvec import (
        list_array,
        list_matrix,
    )

    tbl = pa.Table.from_batches(
        emb.limit(257)._collect_as_arrow()  # odd size: exercises slices
    )
    col = tbl.column("embedding").combine_chunks()
    M = list_matrix(col)
    rowwise = np.array(
        [np.asarray(v, dtype=np.float64) for v in col.to_pylist()]
    )
    assert M.shape == rowwise.shape
    assert (M == rowwise).all()  # bit-identical, not allclose
    back = list_array(M, pa.float64())
    assert back.equals(col.cast(pa.list_(pa.float64())))
    # sliced view (non-zero offset) parses identically
    sl = col.slice(3, 100)
    assert (list_matrix(sl) == rowwise[3:103]).all()


def test_embedding_near_dup_lsh_base_frame_identical(spark, emb):
    eb = embedding_base(emb)
    kw = dict(threshold=0.4, dim=64, n_planes=4, n_tables=2, probe_hamming=4)
    with_base = embedding_near_dup_lsh(
        emb, "vec_id", "embedding", base_frame=eb, **kw
    )
    without = embedding_near_dup_lsh(emb, "vec_id", "embedding", **kw)
    assert _rows(with_base) == _rows(without)
    cache.release_all()
