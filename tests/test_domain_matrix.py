"""cross_domain_nll: pure-Python replay, diagonal dominance, OOV
smoothing under the global vocabulary."""

import math
from collections import Counter

import pytest

from hnormalise_spark.ops.textops import cross_domain_nll


DOCS = [
    ("news", "the market rose and the market fell"),
    ("news", "the market is the market"),
    ("code", "def foo bar def baz def qux"),
    ("code", "def foo def bar"),
    ("mix", "the market def foo"),
    ("mix", None),
    ("mix", "   "),
]


def _py(rows):
    counts: dict = {}
    for g, text in rows:
        if text is None or text.strip() == "":
            continue
        ws = [w for w in text.split(" ") if w != ""]
        counts.setdefault(g, Counter()).update(ws)
    vocab = {w for c in counts.values() for w in c}
    V = len(vocab)
    out = {}
    for ga, ca in counts.items():
        Ta = sum(ca.values())
        for gb, cb in counts.items():
            Tb = sum(cb.values())
            s = 0
            for w, n in ca.items():
                nll = math.floor(
                    -math.log((cb.get(w, 0) + 1.0) / (Tb + V)) * 1e6 + 0.5
                )
                s += n * nll
            out[(ga, gb)] = (Ta, math.floor(s / Ta))
    return out


def test_matches_pure_python(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    got = {
        (r.source_scored, r.source_model): (r.n_tok, r.mean_nll_x1e6)
        for r in cross_domain_nll(df).collect()
    }
    assert got == _py(DOCS)
    assert len(got) == 9  # full 3x3 matrix


def test_diagonal_beats_cross_domain(spark):
    df = spark.createDataFrame(DOCS, "source string, text string")
    got = {
        (r.source_scored, r.source_model): r.mean_nll_x1e6
        for r in cross_domain_nll(df).collect()
    }
    # each pure domain models itself better than the other pure domain
    assert got[("news", "news")] < got[("news", "code")]
    assert got[("code", "code")] < got[("code", "news")]
    # the mixed domain sits closer to both than they sit to each other
    assert got[("mix", "news")] < got[("code", "news")]
