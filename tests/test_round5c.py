"""Semantic decontamination, token entropy, tokenizer fertility, and
the mergeable histogram quantile sketch (round-5 late additions #17)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hnormalise_spark.ops.decontam import semantic_decontaminate
from hnormalise_spark.ops.sketches import hist_merge, hist_quantiles, hist_sketch
from hnormalise_spark.ops.textops import fertility_stats
from hnormalise_spark.ops.tokenops import token_entropy


# ---------------------------------------------------------------------------
# semantic_decontaminate


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_decontam_flags_near_eval_vector(spark):
    ev = _emb(spark, [(100, [1.0, 0.0, 0.0, 0.0])])
    tr = _emb(
        spark,
        [
            (1, [0.99, 0.1, 0.0, 0.0]),   # near the eval vector
            (2, [0.0, 0.0, 1.0, 0.0]),    # orthogonal
            (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite
        ],
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(tr, ev, tau=0.9).collect()
    }
    assert out[1]["contaminated"] == 1 and out[1]["n_sem_hits"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_sem_hits"] == 0
    assert out[3]["contaminated"] == 0
    # max cosine is reported even for clean rows (negative allowed)
    assert out[3]["max_cos_x1e6"] == -1_000_000


def test_semantic_decontam_counts_multiple_hits(spark):
    ev = _emb(spark, [(100, [1.0, 0.0]), (101, [0.9, 0.1])])
    tr = _emb(spark, [(1, [1.0, 0.05])])
    row = semantic_decontaminate(tr, ev, tau=0.9).collect()[0]
    assert row["n_sem_hits"] == 2
    assert row["max_cos_x1e6"] >= 990_000


def test_semantic_decontam_plan_is_broadcast_only(spark):
    ev = _emb(spark, [(100, [1.0, 0.0])])
    tr = _emb(spark, [(1, [0.5, 0.5]), (2, [0.0, 1.0])])
    plan = semantic_decontaminate(tr, ev, tau=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# token_entropy


def _py_entropy(tokens):
    n = len(tokens)
    out = 0
    for t in set(tokens):
        c = tokens.count(t)
        out += math.floor((c / n) * math.log(n / c) * 1_000_000.0)
    return out


def test_token_entropy_matches_python_replica(spark):
    seqs = [
        (1, [5, 5, 5, 5]),            # degenerate: entropy 0
        (2, [1, 2, 3, 4]),            # uniform: ln(4) per symbol
        (3, [1, 1, 2, 3, 3, 3]),      # mixed
        (4, [7]),                     # single token
    ]
    df = spark.createDataFrame(seqs, "doc_id long, tokens array<int>")
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    for doc_id, toks in seqs:
        r = got[doc_id]
        assert r["n_tok"] == len(toks)
        assert r["n_distinct"] == len(set(toks))
        assert r["entropy_x1e6"] == _py_entropy(toks), doc_id
    assert got[1]["entropy_x1e6"] == 0
    # uniform 4-symbol sequence: ln(4) micro-nats (4 x (1/4)ln(4))
    assert abs(got[2]["entropy_x1e6"] - int(math.log(4) * 1e6)) <= 4


def test_token_entropy_is_position_independent_and_total(spark):
    df = spark.createDataFrame(
        [
            (1, [1, 1, 2, 2]),
            (2, [1, 2, 1, 2]),  # same distribution, shuffled
            (3, []),            # excluded
            (4, None),          # excluded
        ],
        "doc_id long, tokens array<int>",
    )
    rows = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["entropy_x1e6"] == rows[2]["entropy_x1e6"]


def test_token_entropy_no_shuffle(spark):
    df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
    plan = token_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# fertility_stats


def test_fertility_stats_golden(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two three"),      # 13 chars, 3 words, 3 bpe
            ("a", "x9!"),                # 3 chars, 1 word, 3 bpe (x / 9 / !)
            ("b", ""),                   # 0 chars, 0 words
        ],
        "source string, text string",
    )
    rows = {r["source"]: r for r in fertility_stats(df).collect()}
    a = rows["a"]
    assert (a["n_docs"], a["n_chars"], a["n_words"], a["n_bpe_tokens"]) == (2, 16, 4, 6)
    assert a["bpe_per_char_ppm"] == 6 * 1_000_000 // 16
    assert a["chars_per_word_ppm"] == 16 * 1_000_000 // 4
    b = rows["b"]
    assert b["n_chars"] == 0 and b["bpe_per_char_ppm"] is None
    assert b["n_words"] == 0 and b["chars_per_word_ppm"] is None


# ---------------------------------------------------------------------------
# histogram sketch


def _lens(spark, vals, src="s"):
    return spark.createDataFrame(
        [(src, int(v)) for v in vals], "source string, v long"
    )


def test_hist_sketch_merge_equals_sketch_of_union(spark):
    a = _lens(spark, [1, 5, 33, 64, 100])
    b = _lens(spark, [2, 33, 200, 500])
    whole = hist_sketch(a.unionByName(b), ["source"], "v", width=32, nbins=8)
    merged = hist_merge(
        hist_sketch(a, ["source"], "v", width=32, nbins=8),
        hist_sketch(b, ["source"], "v", width=32, nbins=8),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hist_quantiles_match_exact_within_grid(spark):
    vals = list(range(0, 1000, 7))  # 143 values, max 994
    df = _lens(spark, vals)
    sk = hist_sketch(df, ["source"], "v", width=10, nbins=200)
    out = {
        r["q_x1e6"]: r["est"]
        for r in hist_quantiles(sk, ["source"], 10, [500000, 900000]).collect()
    }
    svals = sorted(vals)
    for q, est in out.items():
        # inclusive-cum rule: exact quantile index ceil(q*n/1e6)
        idx = -(-q * len(svals) // 1_000_000) - 1
        exact = svals[idx]
        assert est <= exact < est + 10, (q, est, exact)


def test_hist_sketch_clamps_overflow_bin(spark):
    df = _lens(spark, [10_000])
    rows = hist_sketch(df, ["source"], "v", width=32, nbins=8).collect()
    assert rows[0]["bin"] == 7


def test_hist_quantile_degenerate_single_value(spark):
    df = _lens(spark, [50, 50, 50])
    sk = hist_sketch(df, ["source"], "v", width=32, nbins=8)
    rows = hist_quantiles(sk, ["source"], 32, [500000, 990000]).collect()
    assert all(r["bin"] == 1 and r["est"] == 32 for r in rows)
