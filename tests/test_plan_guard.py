"""Plan-assertion guard: no unbounded BroadcastNestedLoopJoin anywhere
in the registry (VERDICT r5 item #6).

A BroadcastNestedLoopJoin is O(|left| x |right|) — correct Spark output,
catastrophic at 100 TB unless the broadcast (build) side is PROVABLY
bounded: a global aggregate with no grouping keys (exactly 1 row), an
explicit limit / TakeOrderedAndProject (<= k rows), or a literal
LocalTableScan.  Today every BNL in the suite is one of those (1-row
totals frames, bounded query/anchor sets); this test walks every
registry query's physical plan and fails loudly if a future change
ships a BNL whose build side streams data-scale rows — the accidental
cartesian product this guard exists to catch.

The walk runs on the JVM SparkPlan tree (not the explain text): for
each BroadcastNestedLoopJoin node, follow the build side (BuildLeft /
BuildRight) down through row-preserving operators (Project / Filter /
exchanges / codegen wrappers / sorts) until a bounding node proves the
row count, or anything else fails the query.  AdaptiveSparkPlan
wrappers are unwrapped via their current physical plan.

Building the DataFrames executes any eager parts of a query (streaming
availableNow folds, index builds) at sf0.001, so the whole sweep stays
in unit-test budget.
"""

from __future__ import annotations

import pytest

# Bounding nodes: emit a provably small row count regardless of input
# size.  Aggregates bound ONLY with empty grouping keys (checked below).
_AGG_PREFIXES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_LIMIT_PREFIXES = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
)
# Row-preserving (or row-reducing) single-child wrappers it is safe to
# walk through on the way to a bounding node.
_PASS_PREFIXES = (
    "Project",
    "Filter",
    "BroadcastExchange",
    "Exchange",
    "ShuffleExchange",
    "Sort",
    "WholeStageCodegen",
    "InputAdapter",
    "ColumnarToRow",
    "AQEShuffleRead",
    "Coalesce",
    "ReusedExchange",  # child points at the original (checked) exchange
    "Generate",  # explode of a bounded frame stays bounded (array fanout
    #              is schema-bounded, not data-bounded)
    "Expand",  # fixed multiplicity
    "Window",  # row-preserving
    "DeserializeToObject",
    "SerializeFromObject",
    "MapInPandas",  # row-wise transform of a bounded input stays bounded
)


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _unwrap_adaptive(node):
    if node.nodeName().startswith("AdaptiveSparkPlan"):
        return _unwrap_adaptive(node.executedPlan())
    return node


def _is_bounded(node) -> bool:
    node = _unwrap_adaptive(node)
    name = node.nodeName()
    if name.startswith(_AGG_PREFIXES):
        ge = node.groupingExpressions()
        if ge.isEmpty():
            return True  # global aggregate: exactly one row
        # group-by-SPARK_PARTITION_ID(): <= numPartitions rows (the
        # two-phase distributed-rank recipe's boundary frame)
        if all(
            "SPARK_PARTITION_ID" in ge.apply(i).toString().upper()
            for i in range(ge.size())
        ):
            return True
        # keyed aggregate: bounded only if its input is bounded
        kids = _children(node)
        return len(kids) == 1 and _is_bounded(kids[0])
    if name.startswith(_LIMIT_PREFIXES):
        return True
    if name.startswith("LocalTableScan") or name.startswith("EmptyRelation"):
        return True  # literal rows, bounded by construction
    if name.startswith("BroadcastQueryStage") or name.startswith(
        "ShuffleQueryStage"
    ):
        return _is_bounded(node.plan())
    if name.startswith("InMemoryTableScan"):
        # cached frame: boundedness comes from the cached plan
        return _is_bounded(node.relation().cachedPlan())
    if name.startswith(
        ("BroadcastNestedLoopJoin", "CartesianProduct", "BroadcastHashJoin")
    ):
        # a join of two bounded frames is bounded (<= n*m small rows)
        kids = _children(node)
        return len(kids) >= 2 and all(_is_bounded(k) for k in kids[:2])
    if name.startswith(_PASS_PREFIXES):
        kids = _children(node)
        return len(kids) == 1 and _is_bounded(kids[0])
    return False


def _walk(node):
    node = _unwrap_adaptive(node)
    yield node
    for c in _children(node):
        yield from _walk(c)


def _bnl_violations(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan()
    bad = []
    for node in _walk(plan):
        if not node.nodeName().startswith("BroadcastNestedLoopJoin"):
            continue
        left, right = _children(node)[:2]
        build = right if "BuildRight" in node.buildSide().toString() else left
        if not _is_bounded(build):
            bad.append(
                f"{node.nodeName()} build side not provably bounded:\n"
                + build.treeString()
            )
    return bad


# BNL build sides that are bounded by DATASET SEMANTICS the physical
# plan cannot prove.  Adding a query here is a deliberate, reviewed act:
# state WHY the build side cannot exceed broadcast size at any corpus
# scale.  Everything else must pass the structural proof above.
SEMANTICALLY_BOUNDED = {
    # anchor/probe sets selected by a literal id predicate (filter
    # `id < k` over a unique id: <= k rows at any scale)
    "ann_bruteforce_topk": "5-probe query set (vec_id < N_QUERIES)",
    "embed_search": "single probe doc (doc_id == 0)",
    "dedup_embedding": "anchor set vec_id-bounded for the exact leg",
    "blocking_eval": "100-doc evaluation anchor set (doc_id < 100)",
    "knn_label_noise": "50-probe anchor set (vec_id < 50)",
    "hard_negatives": "5-probe anchor set (vec_id < 5)",
    # group-by-SPARK_PARTITION_ID boundary frame: <= numPartitions rows
    # (the two-phase distributed-rank recipe); the plan groups by the
    # projected attribute, so the expression-level proof can't see it
    "revenue_concentration": "partition-id boundary frame, <= 32 rows",
    # |sources|^2 / |group|^2 grids: key cardinality is a schema-level
    # constant (a handful of source labels / day buckets), not data-scale
    "source_dup_matrix": "|sources|^2 grid, sources is a tiny enum",
    "source_overlap": "|sources|^2 grid, sources is a tiny enum",
    "value_correlation": "|metric-day|^2 grid over a bounded day window",
}


def test_no_unbounded_bnl_in_any_registry_plan(spark, sf_dir):
    from real_time_data_pipeline_spark.queries import all_queries

    failures = {}
    for name, fn in all_queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # a broken query is another test's failure
            pytest.fail(f"{name} failed to build at {sf_dir}: {e}")
        bad = _bnl_violations(df)
        if bad and name not in SEMANTICALLY_BOUNDED:
            failures[name] = bad
        spark.catalog.clearCache()
    assert not failures, (
        f"{len(failures)} queries ship an unbounded BroadcastNestedLoopJoin "
        f"(O(n*m) at scale) and are not in the reviewed allowlist: "
        + "; ".join(f"{k}: {v[0][:400]}" for k, v in failures.items())
    )


def test_flagship_plan_has_no_unbounded_bnl(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert not _bnl_violations(df)
    spark.catalog.clearCache()


def test_guard_catches_a_real_unbounded_bnl(spark, sf_dir):
    """The guard must FAIL on a genuine cartesian-style BNL — otherwise
    a regression in the walker (e.g. a new wrapper nodeName silently
    returning bounded) would disarm the whole test."""
    from pyspark.sql import functions as F

    big = spark.range(1000)
    other = spark.range(500).withColumnRenamed("id", "rid")
    # non-equi join forces a nested loop; neither side is bounded
    df = big.join(
        F.broadcast(other), big["id"] > other["rid"] * 2, "inner"
    )
    assert _bnl_violations(df), "guard failed to flag an unbounded BNL"
