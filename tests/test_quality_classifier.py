"""Hashing-trick linear quality scorer: pure-Python replica
agreement, degenerate inputs, and the zero-shuffle plan guarantee."""

from __future__ import annotations

import hashlib

from hnormalise_spark.ops import textops as T

D = 512


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_score(text: str | None, seed="qs", d=D):
    if text is None or not text.strip():
        return 0, 0
    toks = text.strip().split()
    s = 0
    for t in toks:
        bucket = _h60(f"{seed}b|{t}") % d
        s += _h60(f"{seed}w|{bucket}") % 2001 - 1000
    return len(toks), s


DOCS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "spam spam spam spam spam spam",
    3: None,
    4: "   ",
    5: "one",
    6: "mixed Quality content with SOME structure and punctuation, even.",
}


def _df(spark):
    return spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")


def test_matches_python_replica(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"], r["keep"])
        for r in T.quality_score_hashed(_df(spark), n_buckets=D).collect()
    }
    for d, text in DOCS.items():
        n, s = _py_score(text)
        assert got[d] == (n, s, int(s > 0)), (d, got[d], (n, s))


def test_collisions_share_weights(spark):
    # same token repeated: score is exactly n * w(token)
    df = spark.createDataFrame([(1, "tok tok tok")], "doc_id long, text string")
    r = T.quality_score_hashed(df, n_buckets=D).collect()[0]
    _, one = _py_score("tok")
    assert r["score_sum"] == 3 * one


def test_plan_has_no_shuffle_and_no_python(spark):
    plan = (
        T.quality_score_hashed(_df(spark), n_buckets=D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expressions only


def test_classifier_roc_invariants(spark):
    from hnormalise_spark.ops.textops import classifier_roc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(classifier_roc(docs).collect(), key=lambda r: r.thr)
    assert len(rows) == 11
    # monotone: raising the threshold can only shrink predicted-pos,
    # TP, and both rates
    for a, b in zip(rows, rows[1:]):
        assert b.n_pred_pos <= a.n_pred_pos
        assert b.tp <= a.tp
        assert b.tpr_ppm <= a.tpr_ppm
        assert b.fpr_ppm <= a.fpr_ppm
    for r in rows:
        assert r.fp == r.n_pred_pos - r.tp >= 0
        assert 0 <= r.tpr_ppm <= 1_000_000
        assert 0 <= r.fpr_ppm <= 1_000_000
    # lowest threshold (-2000 < min token weight sum can be anything,
    # but scores are bounded well inside +-2000 only for short docs) —
    # at least assert the sweep spans a non-trivial range
    assert rows[0].n_pred_pos > rows[-1].n_pred_pos


def test_classifier_roc_deterministic(spark):
    from hnormalise_spark.ops.textops import classifier_roc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(classifier_roc(docs.repartition(1)).collect())
    b = sorted(classifier_roc(docs.repartition(7)).collect())
    assert a == b
