"""exemplar_docs: hash-argmin determinism, bucketing, exclusions."""

import hashlib

import pytest

from hnormalise_spark.ops.textops import exemplar_docs


def test_min_md5_wins_per_bucket(spark):
    rows = [
        (1, "a", "x" * 50),
        (2, "a", "y" * 60),
        (3, "a", "z" * 70),     # all three in bucket 0 (1-100 chars)
        (4, "a", "w" * 150),    # bucket 1
        (5, "b", "v" * 50),     # other group
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r.source, r.len_bucket): (r.doc_id, r.n_chars, r.snippet)
        for r in exemplar_docs(df).collect()
    }
    expect_winner = min((hashlib.md5(str(i).encode()).hexdigest(), i)
                        for i in (1, 2, 3))[1]
    assert got[("a", 0)][0] == expect_winner
    assert got[("a", 1)] == (4, 150, "w" * 40)
    assert got[("b", 0)] == (5, 50, "v" * 40)
    assert len(got) == 3


def test_null_and_empty_excluded_and_snippet_cap(spark):
    rows = [(1, "a", None), (2, "a", ""), (3, "a", "short one")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = exemplar_docs(df).collect()
    assert len(out) == 1 and out[0].doc_id == 3
    assert out[0].snippet == "short one"  # shorter than the 40-char cap
