"""PMI collocation mining: pure-Python cross-check + edge cases."""

import math
from collections import Counter

import pytest

from hnormalise_spark.ops.textops import pmi_collocations


DOCS = [
    "new york is big and new york is old",
    "san francisco and new york",
    "big data needs big compute and big data",
    "",
    None,
    "solo",
    "  spaced   out   words  and new york  ",
]


def _py_pmi(texts, min_count, k):
    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        if not t:
            continue
        ws = [w for w in t.split(" ") if w != ""]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    t_uni = sum(uni.values())
    t_big = sum(big.values())
    rows = []
    for (w1, w2), c12 in big.items():
        if c12 < min_count:
            continue
        val = math.floor(
            math.log(
                (float(c12) * float(t_uni) * float(t_uni))
                / (float(t_big) * float(uni[w1]) * float(uni[w2]))
            )
            * 1_000_000.0
            + 0.5
        )
        rows.append((w1, w2, c12, val))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(t,) for t in DOCS], "text string")


def test_matches_pure_python(spark, docs_df):
    got = [
        (r.w1, r.w2, r.pair_count, r.pmi_x1e6)
        for r in pmi_collocations(docs_df, min_count=2, k=10).collect()
    ]
    assert got == _py_pmi(DOCS, min_count=2, k=10)
    # the headline collocation must surface: "new york" appears 4x
    assert ("new", "york") in {(a, b) for a, b, _, _ in got}


def test_count_floor_excludes_rare_pairs(spark, docs_df):
    got = pmi_collocations(docs_df, min_count=3, k=50).collect()
    assert all(r.pair_count >= 3 for r in got)
    # ...but the floor must NOT shrink the PMI denominator total:
    # ("new","york") c12=4 scores identically at floor 2 and floor 3.
    lo = {
        (r.w1, r.w2): r.pmi_x1e6
        for r in pmi_collocations(docs_df, min_count=2, k=50).collect()
    }
    hi = {(r.w1, r.w2): r.pmi_x1e6 for r in got}
    for pair, v in hi.items():
        assert lo[pair] == v


def test_null_empty_and_single_word_docs(spark):
    df = spark.createDataFrame(
        [(None,), ("",), ("solo",), ("   ",)], "text string"
    )
    assert pmi_collocations(df, min_count=1, k=5).count() == 0


def test_topk_order_is_total(spark, docs_df):
    rows = [
        (r.pmi_x1e6, r.w1, r.w2)
        for r in pmi_collocations(docs_df, min_count=2, k=10).collect()
    ]
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1], r[2]))
