"""data_card: the one-page corpus report (Datasheets for Datasets)."""

from __future__ import annotations

from hnormalise_spark.ops.textops import data_card


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def _card(df):
    out = {}
    for r in df.collect():
        out[(r["section"], r["metric"])] = r["value"]
    return out


def test_data_card_globals_and_dups(spark):
    df = _docs(
        spark,
        [
            (1, "a b c", "en", "s0", 5),
            (2, "A  B c", "en", "s0", 6),   # same fp as doc 1 (case/space)
            (3, "x y", "de", "s1", 3),
            (4, None, "de", "s1", None),    # null text: 0 words, null fp
        ],
    )
    c = _card(data_card(df))
    assert c[("global", "docs")] == 4
    assert c[("global", "chars")] == 14
    assert c[("global", "words")] == 8      # 3 + 3 + 2 + 0
    assert c[("global", "sources")] == 2
    assert c[("global", "langs")] == 2
    # docs 1 and 2 share a fingerprint; null fp is skipped by
    # count(DISTINCT): 4 - distinct{fp12, fp3} = 2
    assert c[("global", "dup_docs")] == 2
    assert c[("source_docs", "s0")] == 2 and c[("source_docs", "s1")] == 2
    assert c[("lang_docs", "en")] == 2 and c[("lang_docs", "de")] == 2


def test_data_card_percentiles_rank_select(spark):
    # chars 10..19 over 10 docs: rank floor((10-1)*p) of ascending sort
    rows = [(i, "w", "en", "s", 10 + i) for i in range(10)]
    c = _card(data_card(_docs(spark, rows)))
    assert c[("len_pct", "p50_chars")] == 14   # rank 4
    assert c[("len_pct", "p90_chars")] == 18   # rank 8
    assert c[("len_pct", "p99_chars")] == 18   # floor(9*0.99)=8
    # null-chars rows are excluded from the rank, not zero-filled
    rows.append((99, "w", "en", "s", None))
    c2 = _card(data_card(_docs(spark, rows)))
    assert c2[("len_pct", "p50_chars")] == 14


def test_data_card_single_doc(spark):
    c = _card(data_card(_docs(spark, [(1, "only doc", "en", "s", 8)])))
    assert c[("global", "docs")] == 1
    assert c[("global", "dup_docs")] == 0
    assert c[("len_pct", "p50_chars")] == 8
    assert c[("len_pct", "p99_chars")] == 8


# ---------------------------------------------------------------------------
# card_diff


def test_card_diff_deltas_and_dropped_source(spark):
    from hnormalise_spark.ops.textops import card_diff

    a = _docs(
        spark,
        [
            (1, "a b", "en", "s0", 10),
            (2, "c d", "en", "s1", 20),
        ],
    )
    # curated version drops source s1 entirely
    b = _docs(spark, [(1, "a b", "en", "s0", 10)])
    d = {
        (r["section"], r["metric"]): r
        for r in card_diff(data_card(a), data_card(b)).collect()
    }
    g = d[("global", "docs")]
    assert (g["value_a"], g["value_b"], g["delta"]) == (2, 1, -1)
    s1 = d[("source_docs", "s1")]
    assert s1["value_a"] == 1 and s1["value_b"] is None and s1["delta"] == -1
    assert d[("source_docs", "s0")]["delta"] == 0
    # percentile shift: A p50 over {10,20} is rank 0 -> 10; B -> 10
    assert d[("len_pct", "p50_chars")]["delta"] == 0


def test_card_diff_new_metric_in_b(spark):
    from hnormalise_spark.ops.textops import card_diff

    a = _docs(spark, [(1, "a", "en", "s0", 1)])
    b = _docs(spark, [(1, "a", "en", "s0", 1), (2, "b", "de", "s0", 1)])
    d = {
        (r["section"], r["metric"]): r
        for r in card_diff(data_card(a), data_card(b)).collect()
    }
    de = d[("lang_docs", "de")]
    assert de["value_a"] is None and de["value_b"] == 1 and de["delta"] == 1
