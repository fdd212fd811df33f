"""Dataset-curation operators: repetition stats, decontamination,
deterministic source mixing, sequence packing.

Oracle coverage lives in queries/curation.py (all four queries are
DuckDB-hash-checked by tools/parity.py); here we pin the operator
semantics on handcrafted corpora where the right answer is computable by
eye, plus a hypothesis property for the packing invariants.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_data_pipeline_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_repetition_stats_flags_repeated_doc(spark):
    rows = [
        # 12 alternating tokens: "a b" takes 6 of 11 2-gram slots
        # (floor(1e4*6/11) = 5454) and every 5-gram is duplicated.
        (1, "s", "a b a b a b a b a b a b"),
        # all 2-grams and 5-grams distinct -> 0 dup, top 2-gram 1/7.
        (2, "s", "one two three four five six seven eight"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in curation.repetition_stats(_docs(spark, rows)).collect()
    }
    assert got[1]["top_2gram_bp"] == 5454
    assert got[1]["dup_5gram_bp"] == 10000
    assert got[1]["keep_repetition"] is False
    assert got[2]["top_2gram_bp"] == 1428  # floor(1e4 * 1/7)
    assert got[2]["dup_5gram_bp"] == 0
    assert got[2]["keep_repetition"] is True


def test_repetition_short_doc_single_gram(spark):
    # 1 token: ngrams_col pads to one whole-text gram at both sizes.
    got = curation.repetition_stats(_docs(spark, [(1, "s", "word")])).collect()[0]
    assert got["top_2gram_bp"] == 10000
    assert got["dup_5gram_bp"] == 0


def test_decontaminate_counts_shared_ngrams(spark):
    bench_text = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 2 distinct 8-grams
    rows = [
        (1, "train", bench_text),          # identical: every gram shared
        (2, "train", "x1 x2 x3 x4 x5 x6 x7 x8 x9"),  # disjoint
    ]
    bench = _docs(spark, [(100, "bench", bench_text)])
    got = {
        r["doc_id"]: r.asDict()
        for r in curation.decontaminate(_docs(spark, rows), bench).collect()
    }
    assert got[1]["n_grams"] == 2 and got[1]["shared_grams"] == 2
    assert got[1]["shared_bp"] == 10000 and got[1]["keep_decontaminated"] is False
    assert got[2]["shared_grams"] == 0 and got[2]["keep_decontaminated"] is True


def test_mix_sources_deterministic_and_rate_bounded(spark):
    rows = [(i, f"src{i % 4}", "t") for i in range(400)]
    df = _docs(spark, rows)
    rates = {"src0": 10000, "src1": 5000, "src2": 0}
    a = sorted(
        r["doc_id"]
        for r in curation.mix_sources(df, rates, default_bp=2500).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in curation.mix_sources(df, rates, default_bp=2500).collect()
    )
    assert a == b  # rerun-identical: sampling is lineage, not chance
    by_src = {
        s: [r for r in a if f"src{r % 4}" == s] for s in ("src0", "src1", "src2", "src3")
    }
    assert len(by_src["src0"]) == 100  # rate 10000 keeps everything
    assert len(by_src["src2"]) == 0  # rate 0 keeps nothing
    assert 0 < len(by_src["src1"]) < 100  # partial rates keep a strict subset
    assert 0 < len(by_src["src3"]) < len(by_src["src1"])  # default 2500 < 5000


def test_pack_sequences_budget_and_order(spark):
    # source s: docs of 3 tokens each, budget 6 -> packs of exactly 2 docs.
    rows = [(i, "s", "a b c") for i in range(6)]
    got = {
        r["doc_id"]: r["pack_id"]
        for r in curation.pack_sequences(_docs(spark, rows), 6).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_pack_sequences_shards_pack_independently(spark):
    rows = [(1, "x", "a b c"), (2, "y", "a b c"), (3, "x", "a b c"), (4, "y", "a b c")]
    got = {
        (r["source"], r["doc_id"]): r["pack_id"]
        for r in curation.pack_sequences(_docs(spark, rows), 6).collect()
    }
    assert got == {("x", 1): 0, ("x", 3): 0, ("y", 2): 0, ("y", 4): 0}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=30),
    st.integers(10, 60),
)
def test_pack_sequences_invariants(spark, sizes, budget):
    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    out = sorted(
        curation.pack_sequences(_docs(spark, rows), budget).collect(),
        key=lambda r: r["doc_id"],
    )
    # pack ids are non-decreasing in doc order and start at 0
    packs = [r["pack_id"] for r in out]
    assert packs[0] == 0
    assert all(a <= b for a, b in zip(packs, packs[1:]))
    # every pack except possibly the last would overflow the budget only
    # by its final (straddling) document
    by_pack: dict[int, list[int]] = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for pid, toks in by_pack.items():
        assert sum(toks) - toks[-1] < budget or len(toks) == 1
