"""snapshot_doc_diff: all four statuses, null-safe fingerprints,
normalization-equivalent texts."""

import pytest

from hnormalise_spark.table import snapshot_doc_diff


A = [
    (1, "alpha beta"),
    (2, "gamma"),
    (3, "delta"),
    (4, None),
    (5, "Epsilon  zeta"),
    (6, "to be removed"),
]
B = [
    (1, "alpha beta"),          # unchanged
    (2, "gamma prime"),         # changed
    (3, "delta"),               # unchanged
    (4, None),                  # unchanged (null == null, null-safe)
    (5, "epsilon zeta"),        # unchanged (normalization-equivalent)
    (7, "brand new"),           # added
    # 6 missing                 # removed
]


@pytest.fixture(scope="module")
def diff(spark):
    a = spark.createDataFrame(A, "doc_id long, text string")
    b = spark.createDataFrame(B, "doc_id long, text string")
    return {r.doc_id: r.status for r in snapshot_doc_diff(a, b).collect()}


def test_statuses(spark, diff):
    assert diff == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "unchanged",
        5: "unchanged",
        6: "removed",
        7: "added",
    }


def test_null_vs_text_is_changed(spark):
    a = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    b = spark.createDataFrame([(1, None)], "doc_id long, text string")
    got = {r.doc_id: r.status for r in snapshot_doc_diff(a, b).collect()}
    assert got == {1: "changed"}


def test_empty_sides(spark):
    a = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert [r.status for r in snapshot_doc_diff(a, empty).collect()] == [
        "removed"
    ]
    assert [r.status for r in snapshot_doc_diff(empty, a).collect()] == [
        "added"
    ]
