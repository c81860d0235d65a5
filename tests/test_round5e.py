"""Round-5 final additions: RRF fusion, quality-aware canonical
selection, cross-source n-gram containment, per-doc n-gram novelty,
DoReMi-style domain reweighting."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark.ops.dedup import canonical_by_quality
from hnormalise_spark.ops.similarity import rrf_fuse
from hnormalise_spark.ops.textops import (
    domain_reweight,
    ngram_novelty,
    source_ngram_containment,
)


# ---------------------------------------------------------------------------
# rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, rank int")


def test_rrf_fuse_scores_and_order(spark):
    # doc 1 is #1 in both lists; doc 2 only in A; doc 3 only in B.
    a = _ranked(spark, [(1, 1), (2, 2)])
    b = _ranked(spark, [(1, 1), (3, 2)])
    out = {r["vec_id"]: r for r in rrf_fuse(a, b, k_const=60, topk=10).collect()}
    # floor(1e6/61) = 16393, floor(1e6/62) = 16129
    assert out[1]["rrf_x1e6"] == 2 * 16393
    assert out[2]["rrf_x1e6"] == 16129 and out[2]["rank_b"] is None
    assert out[3]["rrf_x1e6"] == 16129 and out[3]["rank_a"] is None
    # ties break on vec_id: 2 before 3
    ranks = {r["vec_id"]: r["fused_rank"] for r in out.values()}
    assert ranks == {1: 1, 2: 2, 3: 3}


def test_rrf_fuse_topk_cut(spark):
    a = _ranked(spark, [(i, i) for i in range(1, 8)])
    b = _ranked(spark, [(i, 8 - i) for i in range(1, 8)])
    out = rrf_fuse(a, b, k_const=60, topk=3).collect()
    assert len(out) == 3
    assert [r["fused_rank"] for r in sorted(out, key=lambda r: r["fused_rank"])] == [
        1,
        2,
        3,
    ]


# ---------------------------------------------------------------------------
# canonical_by_quality


def test_canonical_by_quality_picks_best(spark):
    assigned = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (9, 5)], "doc_id long, quality long"
    )
    out = {r["doc_id"]: r for r in canonical_by_quality(assigned, quality).collect()}
    # max quality 99 shared by 2 and 3 -> min id 2 wins
    assert out[1]["canonical_id"] == 2 and not out[1]["is_kept"]
    assert out[2]["is_kept"] and out[2]["n_members"] == 3
    assert out[3]["canonical_id"] == 2 and not out[3]["is_kept"]
    # singleton keeps itself
    assert out[9]["is_kept"] and out[9]["n_members"] == 1


def test_canonical_by_quality_aggregate_not_window(spark):
    assigned = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    quality = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, quality long")
    plan = canonical_by_quality(assigned, quality)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # argmax is a struct-max aggregate


# ---------------------------------------------------------------------------
# source_ngram_containment / ngram_novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_source_containment_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "one two three four five six"),     # grams: 2 distinct
            (2, "b", "one two three four five"),          # gram: 1 (shared w/ a)
            (3, "c", "totally different text here now"),  # gram: 1, disjoint
        ],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_ngram_containment(docs, n=5).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_common"] == 1 and ab["n_a"] == 2 and ab["n_b"] == 1
    assert ab["contain_a_in_b_x1e6"] == 500000
    assert ab["contain_b_in_a_x1e6"] == 1000000
    assert ("a", "c") not in out and ("b", "c") not in out  # disjoint pairs absent


def test_source_containment_short_text_whole_gram(spark):
    docs = _docs(spark, [(1, "a", "tiny text"), (2, "b", "tiny  TEXT")])
    out = source_ngram_containment(docs, n=5).collect()
    # <n-word texts collapse to one whole-text gram; case/space-normalised
    assert len(out) == 1 and out[0]["n_common"] == 1


def test_ngram_novelty_fraction(spark):
    docs = _docs(
        spark,
        [
            (1, "a", "one two three four five six"),    # 2 grams, 1 shared
            (2, "b", "one two three four five"),         # 1 gram, shared
            (3, "c", "totally different text here now"), # 1 gram, unique
        ],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=5).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_unique"] == 1
    assert out[1]["novelty_x1e6"] == 500000
    assert out[2]["n_unique"] == 0 and out[2]["novelty_x1e6"] == 0
    assert out[3]["novelty_x1e6"] == 1000000


# ---------------------------------------------------------------------------
# domain_reweight


def test_domain_reweight_excess_and_fallback(spark):
    # source "hard" uses rare tokens (high NLL), "easy" repeats one token
    rows = [(i, "easy", "aa aa aa aa") for i in range(4)]
    rows += [(10 + i, "hard", f"rare{i} rare{i + 1} rare{i + 2}") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in domain_reweight(docs).collect()}
    assert out["hard"]["mean_nll_x1e6"] > out["easy"]["mean_nll_x1e6"]
    assert out["easy"]["excess_x1e6"] == 0 and out["easy"]["weight_x1e6"] == 0
    # single above-average source takes the whole budget
    assert out["hard"]["weight_x1e6"] == 1000000
    assert out["easy"]["n_tok"] == 16 and out["hard"]["n_tok"] == 12


def test_domain_reweight_uniform_fallback(spark):
    # identical sources -> no excess anywhere -> uniform weights
    rows = [(1, "a", "x y z"), (2, "b", "x y z"), (3, "c", "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = domain_reweight(docs).collect()
    assert all(r["excess_x1e6"] == 0 for r in out)
    assert all(r["weight_x1e6"] == 333333 for r in out)
