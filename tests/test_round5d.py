"""Hard-negative mining and sketch-driven length trimming
(round-5 late additions #18)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnormalise_spark.ops.sampling import length_trim
from hnormalise_spark.ops.similarity import hard_negatives


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hard_negatives_band_and_rank(spark):
    anchors = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "q_id long, embedding array<float>"
    )
    corpus = _emb(
        spark,
        [
            (1, [1.0, 0.01, 0.0]),   # near-dup: above hi, excluded
            (2, [1.0, 1.0, 0.0]),    # cos ~0.707: hard negative
            (3, [1.0, 2.0, 0.0]),    # cos ~0.447: hard negative
            (4, [0.0, 1.0, 0.0]),    # orthogonal: below lo, excluded
            (5, [1.0, 1.0, 0.01]),   # cos ~0.707 tie with 2 -> id tiebreak
        ],
    )
    out = hard_negatives(corpus, anchors, k=2, lo=0.2, hi=0.9).collect()
    assert [(r["rank"], r["vec_id"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (1, 2),
        (2, 5),
    ]
    assert all(200000 <= r["cos_x1e6"] < 900000 for r in out)


def test_hard_negatives_fewer_than_k_and_multi_anchor(spark):
    anchors = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "q_id long, embedding array<float>"
    )
    corpus = _emb(spark, [(1, [1.0, 1.0])])  # cos ~0.707 to both
    out = hard_negatives(corpus, anchors, k=5, lo=0.5, hi=0.9).collect()
    assert sorted(r["q_id"] for r in out) == [10, 11]
    assert all(r["rank"] == 1 for r in out)


def test_hard_negatives_plan_broadcast_no_cartesian_product(spark):
    anchors = spark.createDataFrame(
        [(10, [1.0, 0.0])], "q_id long, embedding array<float>"
    )
    corpus = _emb(spark, [(1, [1.0, 1.0]), (2, [0.5, 0.5])])
    plan = (
        hard_negatives(corpus, anchors, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# length_trim


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


def test_length_trim_cuts_both_tails_per_source(spark):
    # source a: 20 docs of length 100 plus a tiny and a huge outlier
    rows = [(i, "a", 100) for i in range(20)]
    rows += [(90, "a", 1), (91, "a", 5000)]
    # source b: uniform lengths — everything kept
    rows += [(200 + i, "b", 300) for i in range(5)]
    out = {r["doc_id"]: r for r in length_trim(
        _docs(spark, rows), 50000, 950000, width=32, nbins=64
    ).collect()}
    assert out[90]["keep"] == 0      # below source-a's p5 bin
    assert out[91]["keep"] == 0      # clamped overflow bin above p95
    assert all(out[i]["keep"] == 1 for i in range(20))
    assert all(out[200 + i]["keep"] == 1 for i in range(5))
    # bounds are per-source: b's band sits at its own 300-length bin
    assert out[200]["lo_est"] == (300 // 32) * 32


def test_length_trim_band_is_bin_inclusive(spark):
    # all same length -> lo and hi bins equal; everything kept
    out = length_trim(
        _docs(spark, [(i, "s", 64) for i in range(4)]), 20000, 980000,
        width=32, nbins=8,
    ).collect()
    assert all(r["keep"] == 1 for r in out)
    assert all(r["lo_est"] == r["hi_est"] == 64 for r in out)


def test_length_trim_null_length_not_kept(spark):
    out = {r["doc_id"]: r for r in length_trim(
        _docs(spark, [(1, "s", 64), (2, "s", 64), (3, "s", None)]),
        20000, 980000, width=32, nbins=8,
    ).collect()}
    assert out[3]["keep"] == 0
    assert out[1]["keep"] == 1
