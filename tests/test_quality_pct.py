"""quality_percentiles: cume_dist semantics, tie sharing, per-group
independence, null exclusion."""

import pytest

from hnormalise_spark.ops.textops import quality_percentiles


def test_cume_dist_and_ties(spark):
    # scores within one group: craft docs whose quality orders
    # predictably — more punctuation → lower score
    rows = [
        (1, "a", "clean alpha words here throughout entirely good"),
        (2, "a", "clean alpha words here throughout entirely good"),  # tie w/ 1
        (3, "a", "?!?! ;;; ### !!! ???"),
        (4, "a", "middling text with some !!! punctuation here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r for r in quality_percentiles(df).collect()}
    assert got[1].quality_x1e4 == got[2].quality_x1e4
    assert got[1].pct_ppm == got[2].pct_ppm == 1000000  # ties share the top
    assert got[3].pct_ppm == 250000                     # 1/4
    assert got[4].pct_ppm == 500000                     # 2/4


def test_groups_are_independent(spark):
    rows = [
        (1, "a", "good clean words here now fine"),
        (2, "a", "#### !!!! ???? ;;;;"),
        (3, "b", "#### !!!! ???? ;;;;"),  # worst of b is still 100% of b
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: r.pct_ppm for r in quality_percentiles(df).collect()}
    assert got[2] == 500000   # bottom half of a
    assert got[3] == 1000000  # sole doc of b


def test_null_text_excluded(spark):
    rows = [(1, "a", "words here fine ok yes"), (2, "a", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = quality_percentiles(df).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].pct_ppm == 1000000
