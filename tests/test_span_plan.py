"""span_corruption_plan: pure-Python replay + clamp edges."""

import math

import pytest

from hnormalise_spark.ops.tokenops import span_corruption_plan


def _py_plan(n, density=0.15, mean_span=3.0):
    if n < 2:
        return (n, 0, 0, n, 0)
    masked = min(max(math.floor(n * density + 0.5), 1), n - 1)
    spans = min(max(math.floor(masked / mean_span + 0.5), 1), masked)
    return (n, masked, spans, n - masked + spans, masked + spans + 1)


CASES = [0, 1, 2, 3, 5, 6, 7, 20, 100, 128, 333, 512]


@pytest.fixture(scope="module")
def planned(spark):
    rows = [(i, list(range(n))) for i, n in enumerate(CASES)]
    rows.append((len(CASES), None))  # null tokens → n = 0
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    return {
        r.doc_id: (r.n_tok, r.n_masked, r.n_spans, r.enc_len, r.dec_len)
        for r in span_corruption_plan(df).collect()
    }


def test_matches_pure_python(spark, planned):
    for i, n in enumerate(CASES):
        assert planned[i] == _py_plan(n), f"n={n}"
    assert planned[len(CASES)] == (0, 0, 0, 0, 0)


def test_clamps(spark, planned):
    # n=2: floor(0.3+0.5)=0 → clamped to 1 masked, 1 span
    assert planned[CASES.index(2)] == (2, 1, 1, 2, 3)
    # n=7: floor(1.05+0.5)=1 masked → 1 span (spans ≤ masked)
    assert planned[CASES.index(7)] == (7, 1, 1, 7, 3)
    # large n: ~15% masked, ~masked/3 spans
    n, masked, spans, enc, dec = planned[CASES.index(512)]
    assert masked == 77 and spans == 26
    assert enc == 512 - 77 + 26 and dec == 77 + 26 + 1


def test_budget_identity(spark, planned):
    # enc+dec always reconstructs n + 2·spans + 1 for maskable docs
    for i, n in enumerate(CASES):
        if n >= 2:
            _, masked, spans, enc, dec = planned[i]
            assert enc + dec == n + 2 * spans + 1
