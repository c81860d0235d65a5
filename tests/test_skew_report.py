"""skew_report: shares, salt math, null keys, tie-stable ranking."""

import pytest

from hnormalise_spark.ops.skew import skew_report


def test_hot_key_and_salt_math(spark):
    # 100 rows: key "hot" 60, "warm" 30, "cold" 10 → at tasks=10 the
    # ideal is 10 rows/bucket: hot needs 6 buckets, warm 3, cold 1
    rows = (
        [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10
    )
    df = spark.createDataFrame(rows, "k string")
    got = {
        r.key: (r.rank, r.n_rows, r.share_ppm, r.salt_buckets, r.n_keys_total)
        for r in skew_report(df, "k", top_k=5, tasks=10).collect()
    }
    assert got["hot"] == (1, 60, 600000, 6, 3)
    assert got["warm"] == (2, 30, 300000, 3, 3)
    assert got["cold"] == (3, 10, 100000, 1, 3)


def test_null_key_counts_and_tie_order(spark):
    rows = [("a",)] * 5 + [(None,)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top_k=5, tasks=3).collect()
    # ties broken ascending by key, nulls last
    assert [(r.rank, r.key) for r in out] == [
        (1, "a"), (2, "b"), (3, None)
    ]
    assert all(r.salt_buckets == 1 for r in out)  # 5/15 * 3 = 1 exactly


def test_top_k_cuts(spark):
    rows = [(f"k{i:02d}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top_k=3, tasks=4).collect()
    assert [r.key for r in out] == ["k19", "k18", "k17"]
    assert all(r.n_keys_total == 20 for r in out)


def test_salt_division_exact_at_huge_magnitudes(spark):
    # the huge-table regime the op advertises: numerator past 2^53,
    # where floor(double/double) drifts by one but `div` stays exact.
    # n_rows = 2^57, tasks = 32, total = 2^59 → (9·2^59 − 1) div 2^59 = 8
    row = spark.sql(
        "SELECT (144115188075855872L * 32L + 576460752303423488L - 1L)"
        "         div 576460752303423488L AS exact,"
        "       floor((144115188075855872L * 32L + 576460752303423488L - 1L)"
        "             / 576460752303423488L) AS via_double"
    ).first()
    assert row.exact == 8
    assert row.via_double == 9  # the drift skew_report must NOT exhibit
