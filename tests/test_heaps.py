"""Heaps'-law growth: pure-Python replay, ladder gating, edge cases."""

import math

import pytest

from hnormalise_spark.ops.textops import heaps_growth


def _mk_docs(n):
    # deterministic word soup with genuinely growing vocabulary:
    # doc i introduces word "w<i>" plus reuses a few old ones
    rows = []
    for i in range(n):
        ws = [f"w{i}", f"w{i // 2}", f"w{i // 3}", "the"]
        rows.append((i, " ".join(ws)))
    return rows


def _py_heaps(rows, thresholds):
    firsts, dt = {}, {}
    for doc_id, text in rows:
        if text is None:
            continue
        ws = [w for w in text.split(" ") if w != ""]
        dt[doc_id] = len(ws)
        for w in ws:
            firsts[w] = min(firsts.get(w, doc_id), doc_id)
    mx = max(dt)
    ths = [t for t in sorted(set(thresholds)) if t <= 2 * mx]
    curve = []
    for t in ths:
        tok = sum(n for d, n in dt.items() if d < t)
        voc = sum(1 for fd in firsts.values() if fd < t)
        if tok > 0 and voc > 0:
            curve.append((t, tok, voc))
    xs = [math.floor(math.log(tok) * 1e6 + 0.5) for _, tok, _ in curve]
    ys = [math.floor(math.log(voc) * 1e6 + 0.5) for _, _, voc in curve]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    beta = (
        math.floor((n * sxy - sx * sy) / den * 1e6 + 0.5) if den > 0 else None
    )
    return sorted((t, tok, voc, beta) for t, tok, voc in curve)


def test_matches_pure_python(spark):
    rows = _mk_docs(300)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.n_docs_lt, r.tokens_cum, r.vocab_cum, r.beta_x1e6)
        for r in heaps_growth(df).collect()
    )
    assert got == _py_heaps(rows, [2 ** k for k in range(4, 21)])
    # growing-vocab corpus: beta well above 0 and at most 1
    assert 200_000 < got[0][3] <= 1_000_000


def test_ladder_gating_single_saturated_point(spark):
    rows = _mk_docs(300)  # max id 299 → keep t <= 598: 16..512
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ts = sorted(r.n_docs_lt for r in heaps_growth(df).collect())
    assert ts == [16, 32, 64, 128, 256, 512]
    # exactly one saturated (full-corpus) point
    full = [r for r in heaps_growth(df).collect() if r.n_docs_lt == 512]
    assert full[0].tokens_cum == 4 * 300 and full[0].vocab_cum > 150


def test_null_and_empty_docs_ignored(spark):
    rows = _mk_docs(40) + [(40, None), (41, ""), (42, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.n_docs_lt: r for r in heaps_growth(df).collect()}
    base = {
        r.n_docs_lt: r
        for r in heaps_growth(
            spark.createDataFrame(_mk_docs(40), "doc_id long, text string")
        ).collect()
    }
    for t in base:
        assert got[t].tokens_cum == base[t].tokens_cum
        assert got[t].vocab_cum == base[t].vocab_cum


def test_saturating_vocab_has_low_beta(spark):
    # constant 5-word vocabulary: V flat after the first point → beta
    # far below the growing corpus's
    rows = [(i, "a b c d e") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = heaps_growth(df).collect()
    assert all(r.vocab_cum == 5 for r in out)
    assert out[0].beta_x1e6 == 0
