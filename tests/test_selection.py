"""Selection-tier tests (operators/selection.py): the fixed-point log2
primitive against its pure-Python twin and math.log2, plus sequential
brute-force replicas of DSIR, CCNet bucketing, and A-ES sampling."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators import selection as S
from real_time_data_pipeline_spark.schemas import load_table


# ------------------------------------------------------------- log2_fp16

def test_log2_fp16_matches_python_twin_and_log2(spark):
    """The Spark pipeline equals the pure-Python integer twin bit-for-bit
    and tracks math.log2 to < 4e-5 across magnitudes (powers of two,
    neighbors, random-ish odd composites, near-overflow) — the analytic
    worst case is ~2.5 fp16 units: 0.5 from table rounding, 1 from the
    interpolation floor, ~0.2 curvature, plus the remainder floor."""
    xs = [1, 2, 3, 4, 5, 7, 15, 16, 17, 1000, 1023, 1024, 1025]
    xs += [(1 << k) - 1 for k in range(2, 62, 7)]
    xs += [(1 << k) + 1 for k in range(2, 62, 7)]
    xs += [x * x * 7919 + 13 for x in range(1, 400, 7)]
    xs += [(1 << 62) - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["x"]: r["lg"] for r in S.log2_fp16(df, "x", "lg").collect()}
    assert len(got) == len(set(xs))
    for x in set(xs):
        assert got[x] == S.log2_fp16_py(x), x
        assert abs(got[x] / S.FP_ONE - math.log2(x)) < 4e-5, x


def test_log2_fp16_py_rejects_nonpositive():
    with pytest.raises(ValueError):
        S.log2_fp16_py(0)


# ------------------------------------------------------- brute-force twins

def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip()).lower().split(" ")


def _bucket(tok: str, n: int = S.DSIR_BUCKETS) -> int:
    return int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16) % n


def _u48(doc_id: int) -> int:
    return int(hashlib.sha256(str(doc_id).encode()).hexdigest()[:12], 16)


def _docs_rows(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    ).collect()


def test_dsir_weights_match_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    ct, cr = Counter(), Counter()
    for r in rows:
        for t in _toks(r["text"]):
            b = _bucket(t)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    B = S.DSIR_BUCKETS
    tt, tr = sum(ct.values()) + B, sum(cr.values()) + B
    lg = S.log2_fp16_py
    want = {
        b: lg(ct[b] + 1) + lg(tr) - lg(cr[b] + 1) - lg(tt) for b in range(B)
    }
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["bucket"]: r["weight_fp"]
        for r in S.dsir_bucket_weights(docs).collect()
    }
    assert len(got) == B
    assert got == want


def test_dsir_select_is_true_topk(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    ct, cr = Counter(), Counter()
    for r in rows:
        for t in _toks(r["text"]):
            b = _bucket(t)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    B = S.DSIR_BUCKETS
    tt, tr = sum(ct.values()) + B, sum(cr.values()) + B
    lg = S.log2_fp16_py
    w = {b: lg(ct[b] + 1) + lg(tr) - lg(cr[b] + 1) - lg(tt) for b in range(B)}
    scores = {
        r["doc_id"]: sum(w[_bucket(t)] for t in _toks(r["text"]))
        for r in rows
    }
    n_keep = len(rows) // S.DSIR_TOP_FRAC_DEN
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:n_keep]
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["score_fp"] for r in S.dsir_select(docs).collect()
    }
    assert got == dict(want)


def test_dsir_xxhash_scale_path_same_shape(spark, sf_dir):
    """portable=False swaps the sha256 fold for xxhash64: different
    bucket assignment (no cross-engine oracle), same output contract."""
    docs = load_table(spark, sf_dir, "documents")
    w = S.dsir_bucket_weights(docs, portable=False)
    rows = w.collect()
    assert len(rows) == S.DSIR_BUCKETS
    assert sum(r["n_raw"] for r in rows) == sum(
        len(_toks(r["text"])) for r in _docs_rows(spark, sf_dir)
    )
    sel = S.dsir_select(docs, portable=False)
    assert sel.count() == len(_docs_rows(spark, sf_dir)) // 5


def test_ccnet_buckets_match_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    cf, tot = defaultdict(Counter), Counter()
    for r in rows:
        for t in _toks(r["text"]):
            cf[r["lang"]][t] += 1
            tot[r["lang"]] += 1
    lg = S.log2_fp16_py
    bits = {}
    for r in rows:
        ts = _toks(r["text"])
        s = sum(lg(tot[r["lang"]]) - lg(cf[r["lang"]][t]) for t in ts)
        bits[r["doc_id"]] = s // len(ts)
    # terciles per lang on (bits, doc_id)
    want_bucket = {}
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r["doc_id"])
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (bits[i], i))
        n = len(ids)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if i < extra else 0) for i in range(3)]
        labels = ["head"] * sizes[0] + ["middle"] * sizes[1] + ["tail"] * sizes[2]
        for i, d in enumerate(ids):
            want_bucket[d] = labels[i]
    docs = load_table(spark, sf_dir, "documents")
    got = S.ccnet_perplexity_buckets(docs).collect()
    assert len(got) == len(rows)
    for r in got:
        assert r["bits_per_tok_fp"] == bits[r["doc_id"]], r["doc_id"]
        assert r["ppl_bucket"] == want_bucket[r["doc_id"]], r["doc_id"]


def test_weighted_sample_aes_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    lg = S.log2_fp16_py
    key = {
        r["doc_id"]: ((48 * S.FP_ONE - lg(_u48(r["doc_id"]) + 1)) << 20)
        // max(r["n_chars"], 1)
        for r in rows
    }
    by_stratum = defaultdict(list)
    for r in rows:
        by_stratum[r["lang"]].append(r["doc_id"])
    want = {}
    for lang, ids in by_stratum.items():
        ids.sort(key=lambda i: (key[i], i))
        for rank, d in enumerate(ids[:20], start=1):
            want[d] = (lang, rank)
    docs = load_table(spark, sf_dir, "documents")
    got = S.weighted_sample_stratified(docs).collect()
    assert len(got) == sum(min(20, len(v)) for v in by_stratum.values())
    for r in got:
        assert want[r["doc_id"]] == (r["stratum"], r["sample_rank"])


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """A-ES sanity: the average weight of sampled docs exceeds the
    stratum average (weighted inclusion must tilt heavy)."""
    docs = load_table(spark, sf_dir, "documents")
    got = S.weighted_sample_stratified(docs, k=20).collect()
    rows = _docs_rows(spark, sf_dir)
    avg_all = sum(max(r["n_chars"], 1) for r in rows) / len(rows)
    avg_sampled = sum(r["w"] for r in got) / len(got)
    assert avg_sampled > avg_all


def test_dsir_incremental_fold_equals_full_recompute(spark, sf_dir, tmp_path):
    """Counts are additive sufficient statistics: history counts +
    increment counts -> weights must be BIT-identical to a ground-up
    pass over history+increment."""
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "dsir_counts")
    S.build_dsir_counts(hist, path)
    inc = {
        r["bucket"]: (r["n_target"], r["n_raw"], r["weight_fp"])
        for r in S.dsir_weights_incremental(spark, new, path).collect()
    }
    full = {
        r["bucket"]: (r["n_target"], r["n_raw"], r["weight_fp"])
        for r in S.dsir_bucket_weights(docs).collect()
    }
    assert inc == full


def test_dsir_score_against_frozen_weights_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    hist = [r for r in rows if r["doc_id"] % 10 != 0]
    new = [r for r in rows if r["doc_id"] % 10 == 0]
    ct, cr = Counter(), Counter()
    for r in hist:
        for t in _toks(r["text"]):
            b = _bucket(t)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    B = S.DSIR_BUCKETS
    tt, tr = sum(ct.values()) + B, sum(cr.values()) + B
    lg = S.log2_fp16_py
    w = {b: lg(ct[b] + 1) + lg(tr) - lg(cr[b] + 1) - lg(tt) for b in range(B)}
    want = {
        r["doc_id"]: sum(w[_bucket(t)] for t in _toks(r["text"]))
        for r in new
    }
    docs = load_table(spark, sf_dir, "documents")
    hist_df = docs.filter(F.col("doc_id") % 10 != 0)
    new_df = docs.filter(F.col("doc_id") % 10 == 0)
    weights = S.dsir_bucket_weights(hist_df)
    got = {
        r["doc_id"]: r["score_fp"]
        for r in S.dsir_score_against(new_df, weights).collect()
    }
    assert got == want


def test_dsir_gumbel_sampler_matches_bruteforce(spark, sf_dir):
    """The Gumbel-top-k key (score + base-2 Gumbel from the portable
    uniform) replicated sequentially; selection must match exactly."""
    rows = _docs_rows(spark, sf_dir)
    ct, cr = Counter(), Counter()
    for r in rows:
        for t in _toks(r["text"]):
            b = _bucket(t)
            cr[b] += 1
            if r["lang"] == "en":
                ct[b] += 1
    B = S.DSIR_BUCKETS
    tt, tr = sum(ct.values()) + B, sum(cr.values()) + B
    lg = S.log2_fp16_py
    w = {b: lg(ct[b] + 1) + lg(tr) - lg(cr[b] + 1) - lg(tt) for b in range(B)}
    keys = {}
    for r in rows:
        score = sum(w[_bucket(t)] for t in _toks(r["text"]))
        t_fp = max(48 * S.FP_ONE - lg(_u48(r["doc_id"]) + 1), 1)
        keys[r["doc_id"]] = (score, score + 16 * S.FP_ONE + S.GUMBEL_C_FP - lg(t_fp))
    n_keep = len(rows) // S.DSIR_TOP_FRAC_DEN
    want = dict(
        sorted(
            ((d, k) for d, k in keys.items()),
            key=lambda kv: (-kv[1][1], kv[0]),
        )[:n_keep]
    )
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["score_fp"], r["key_fp"])
        for r in S.dsir_sample_gumbel(docs).collect()
    }
    assert got == want
    # the noisy sample must differ from the deterministic top-k on at
    # least one doc (else the noise did nothing) while overlapping
    # heavily (the noise is zero-mean on a peaked score distribution)
    det = {r["doc_id"] for r in S.dsir_select(docs).collect()}
    assert set(got) != det
    assert len(set(got) & det) > n_keep // 2


def test_cms_heavy_hitters_matches_bruteforce(spark, sf_dir):
    """CMS replica: salted sha256 rows, width-2048 counters, min over
    depth; every estimate >= exact (the CMS one-sided guarantee)."""
    from real_time_data_pipeline_spark.operators import text as T

    rows = _docs_rows(spark, sf_dir)
    vocab = Counter()
    for r in rows:
        vocab.update(_toks(r["text"]))
    W, D = T.CMS_WIDTH, T.CMS_DEPTH

    def b(j, tok):
        return int(
            hashlib.sha256(f"{j}:{tok}".encode()).hexdigest()[:15], 16
        ) % W

    cms = defaultdict(int)
    for tok, c in vocab.items():
        for j in range(D):
            cms[(j, b(j, tok))] += c
    top = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    want = {}
    for tok, c in top:
        est = min(cms[(j, b(j, tok))] for j in range(D))
        want[tok] = (c, est, (10000 * (est - c)) // c)
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["term"]: (r["exact_count"], r["cms_count"], r["over_bp"])
        for r in T.cms_heavy_hitters(docs).collect()
    }
    assert got == want
    for term, (exact, est, _) in got.items():
        assert est >= exact, term


def test_ccnet_bigram_matches_bruteforce(spark, sf_dir):
    rows = _docs_rows(spark, sf_dir)
    big, ctx, vocab = defaultdict(Counter), defaultdict(Counter), defaultdict(set)
    for r in rows:
        ts = _toks(r["text"])
        vocab[r["lang"]].update(ts)
        for a, b in zip(ts, ts[1:]):
            big[r["lang"]][(a, b)] += 1
            ctx[r["lang"]][a] += 1
    lg = S.log2_fp16_py
    bits = {}
    for r in rows:
        ts = _toks(r["text"])
        prs = list(zip(ts, ts[1:]))
        if not prs:
            continue
        v = len(vocab[r["lang"]])
        s = sum(
            lg(ctx[r["lang"]][a] + v) - lg(big[r["lang"]][(a, b)] + 1)
            for a, b in prs
        )
        bits[r["doc_id"]] = s // len(prs)
    docs = load_table(spark, sf_dir, "documents")
    got = S.ccnet_bigram_ppl(docs).collect()
    assert len(got) == len(bits)
    for r in got:
        assert r["bits_per_pair_fp"] == bits[r["doc_id"]], r["doc_id"]


# ------------------------------------------------------- nb_classify

def test_nb_classifier_matches_bruteforce(spark, sf_dir):
    """Sequential NB replica: Laplace counts on the train split,
    fp16-log posterior per (doc, class), argmax with lexicographic
    tie-break, margin = top1 - top2 — every row equal to the Spark
    output."""
    from real_time_data_pipeline_spark.queries.selection import (
        NB_SPEED_CLASSES,
        _docs_with_speed_label,
    )

    rows = _docs_rows(spark, sf_dir)
    B = S.DSIR_BUCKETS
    lab, toks = {}, {}
    for r in rows:
        ts = _toks(r["text"])
        nf, ns = ts.count("fast"), ts.count("slow")
        lab[r["doc_id"]] = (
            "fast" if nf > ns else ("slow" if nf < ns else "even")
        )
        toks[r["doc_id"]] = ts
    train = [d for d in lab if d % S.NB_HOLDOUT_MOD != 0]
    cnt = Counter()  # (cls, bucket) -> token count
    nd = Counter()   # cls -> train docs
    for d in train:
        nd[lab[d]] += 1
        for t in toks[d]:
            cnt[(lab[d], _bucket(t))] += 1
    t_c = Counter()
    for (c, _b), k in cnt.items():
        t_c[c] += k
    lg = S.log2_fp16_py
    lg_pd = lg(len(train) + len(NB_SPEED_CLASSES))
    want = {}
    for d, ts in toks.items():
        scores = {}
        for c in NB_SPEED_CLASSES:
            s = lg(nd[c] + 1) - lg_pd
            s += sum(lg(cnt[(c, _bucket(t))] + 1) for t in ts)
            s -= len(ts) * lg(t_c[c] + B)
            scores[c] = s
        order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        pred, top = order[0]
        margin = top - order[1][1]
        want[d] = (
            lab[d],
            "test" if d % S.NB_HOLDOUT_MOD == 0 else "train",
            pred,
            top,
            margin,
            pred == lab[d],
        )
    out = S.nb_train_classify(
        _docs_with_speed_label(spark, sf_dir),
        label_col="speed_label",
        classes=NB_SPEED_CLASSES,
    )
    got = {
        r["doc_id"]: (
            r["speed_label"], r["split"], r["pred_speed_label"],
            r["score_fp"], r["margin_fp"], r["correct"],
        )
        for r in out.collect()
    }
    assert got == want


def test_nb_classifier_beats_majority_prior(spark, sf_dir):
    """Learnability pin: held-out accuracy strictly beats always
    predicting the test split's majority class."""
    from real_time_data_pipeline_spark.queries.selection import q_nb_classify

    rows = [
        r
        for r in q_nb_classify(spark, sf_dir).collect()
        if r["split"] == "test"
    ]
    acc = sum(r["correct"] for r in rows)
    prior = Counter(r["speed_label"] for r in rows).most_common(1)[0][1]
    assert acc > prior


def test_nb_fit_score_pair_reproduces_train_classify(spark, sf_dir):
    """The streaming gate's fit/score split is the SAME model: freezing
    nb_fit on the train slice and scoring every doc reproduces
    nb_train_classify's (pred, score, margin) row-for-row."""
    from real_time_data_pipeline_spark.queries.selection import (
        NB_SPEED_CLASSES,
        _docs_with_speed_label,
    )

    docs = _docs_with_speed_label(spark, sf_dir)
    full = S.nb_train_classify(
        docs, label_col="speed_label", classes=NB_SPEED_CLASSES
    )
    wt, consts = S.nb_fit(
        docs.filter(F.col("doc_id") % S.NB_HOLDOUT_MOD != 0),
        label_col="speed_label",
        classes=NB_SPEED_CLASSES,
    )
    pair = S.nb_score_against(
        docs, wt, consts, classes=NB_SPEED_CLASSES, label_out="pred"
    )
    want = {
        r["doc_id"]: (r["pred_speed_label"], r["score_fp"], r["margin_fp"])
        for r in full.collect()
    }
    got = {
        r["doc_id"]: (r["pred"], r["score_fp"], r["margin_fp"])
        for r in pair.collect()
    }
    assert got == want
