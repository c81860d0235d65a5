"""token_zipf_fit — least-squares Zipf exponent in integer micro-units."""

import math

import pytest

from hnormalise_spark.ops import tokenops as TK

pytestmark = pytest.mark.usefixtures("spark")


def _fit_replica(freqs):
    """Pure-Python twin of the op's exact integer-moment fit."""
    ranked = sorted(freqs, reverse=True)
    xs = [math.floor(math.log(r) * 1e6 + 0.5) for r in range(1, len(ranked) + 1)]
    ys = [math.floor(math.log(f) * 1e6 + 0.5) for f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den <= 0:
        return n, None
    return n, math.floor(-(n * sxy - sx * sy) / den * 1e6 + 0.5)


def _corpus(spark, freqs):
    # token i appears freqs[i] times, spread over a few docs
    rows, doc = [], []
    for t, f in enumerate(freqs):
        doc.extend([t] * f)
    # split into 3 docs to exercise the distributed count
    third = max(1, len(doc) // 3)
    for i in range(0, len(doc), third):
        rows.append((i, doc[i : i + third]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_matches_pure_python_replica(spark):
    freqs = [100, 50, 33, 25, 20, 17, 14, 12, 11, 10]
    df = _corpus(spark, freqs)
    [row] = TK.token_zipf_fit(df, top_v=10).collect()
    n, alpha = _fit_replica(freqs)
    assert row["n_vocab"] == n
    assert row["alpha_x1e6"] == alpha


def test_perfect_zipf_alpha_near_one(spark):
    # f_r = round(1200 / r): alpha should land close to 1.0
    freqs = [round(1200 / r) for r in range(1, 13)]
    df = _corpus(spark, freqs)
    [row] = TK.token_zipf_fit(df, top_v=12).collect()
    assert 0.95e6 < row["alpha_x1e6"] < 1.05e6


def test_uniform_corpus_alpha_zero(spark):
    # all tokens equally frequent: slope 0
    freqs = [7] * 8
    df = _corpus(spark, freqs)
    [row] = TK.token_zipf_fit(df, top_v=8).collect()
    assert row["alpha_x1e6"] == 0


def test_single_token_null_alpha(spark):
    df = spark.createDataFrame(
        [(1, [5, 5, 5])], "doc_id long, tokens array<int>"
    )
    [row] = TK.token_zipf_fit(df, top_v=8).collect()
    assert row["n_vocab"] == 1
    assert row["alpha_x1e6"] is None


def test_partition_invariance(spark):
    freqs = [90, 41, 30, 22, 18, 15, 5, 3]
    a = _corpus(spark, freqs)
    [r1] = TK.token_zipf_fit(a, top_v=8).collect()
    [r2] = TK.token_zipf_fit(a.repartition(7), top_v=8).collect()
    assert (r1["n_vocab"], r1["alpha_x1e6"]) == (r2["n_vocab"], r2["alpha_x1e6"])
