"""distinct_ngrams: pure-Python replay, n=1/n=3 shapes, edge docs."""

import math
from collections import Counter

import pytest

from hnormalise_spark.ops.textops import distinct_ngrams


DOCS = [
    ("a", "x y x y x y"),          # highly repetitive
    ("a", "x y"),
    ("b", "p q r s t"),            # all-distinct
    ("b", None),
    ("b", ""),
    ("c", "solo"),                 # too short for bigrams → no row at n=2
]


def _py(rows, n):
    per = {}
    for src, text in rows:
        if not text:
            continue
        ws = [w for w in text.split(" ") if w != ""]
        if len(ws) < n:
            continue
        grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        per.setdefault(src, Counter()).update(grams)
    out = {}
    for src, c in per.items():
        tot, dis = sum(c.values()), len(c)
        out[src] = (tot, dis, math.floor(dis / tot * 1e6 + 0.5))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "source string, text string")


@pytest.mark.parametrize("n", [1, 2, 3])
def test_matches_pure_python(spark, docs_df, n):
    got = {
        r.source: (r.n_grams_total, r.n_grams_distinct, r.distinct_ppm)
        for r in distinct_ngrams(docs_df, n=n).collect()
    }
    assert got == _py(DOCS, n)


def test_repetitive_vs_diverse(spark, docs_df):
    got = {
        r.source: r.distinct_ppm for r in distinct_ngrams(docs_df, n=2).collect()
    }
    # "a": 6 bigrams, 2 distinct (x y / y x) → 333333
    assert got["a"] == 333333
    # "b": 4 bigrams all distinct → 1000000
    assert got["b"] == 1000000
    assert "c" not in got  # single-word source has no bigrams


def test_n_validation(spark, docs_df):
    with pytest.raises(ValueError):
        distinct_ngrams(docs_df, n=0)
