"""Connected-components (large-star/small-star) correctness.

Oracle-free checks: the registry query `dedup_clusters` is checked
against a DuckDB recursive-CTE transitive closure by tools/parity.py;
here we pin the algorithm itself against a pure-Python union-find on
adversarial shapes (chains — the case naive label propagation handles
in O(diameter) rounds — cycles, stars, and random graphs).
"""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from real_time_data_pipeline_spark.operators import graph


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id label per component
    labels = {}
    for n in nodes:
        r = find(n)
        labels.setdefault(r, min(m for m in nodes if find(m) == r))
    return {n: labels[find(n)] for n in nodes}


def _cc(spark, edges):
    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "id_a long, id_b long"
    )
    return {
        r["node"]: r["component"]
        for r in graph.connected_components(df).collect()
    }


def test_chain_converges_to_single_min(spark):
    # 0-1-2-...-19: worst case for plain label propagation.
    edges = [(i, i + 1) for i in range(19)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(20)}


def test_two_components_and_cycle(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_matches_union_find(spark, edges):
    edges = [(u, v) for u, v in edges if u != v]
    assume(edges)
    nodes = sorted({n for e in edges for n in e})
    assert _cc(spark, edges) == _union_find(edges, nodes)


def test_attach_components_labels_isolated_nodes(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,), (9,)], "doc_id long")
    comps = graph.connected_components(
        spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in graph.attach_components(docs, comps, "doc_id").collect()
    }
    assert got == {1: (1, True), 2: (2, True), 3: (2, False), 9: (9, True)}
