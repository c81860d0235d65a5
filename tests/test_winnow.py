"""Winnowing fingerprints (textops.winnow_fingerprints): pure-Python
cross-check on random corpora, the SIGMOD'03 shared-substring
guarantee, edge cases, and the no-shuffle plan."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from hnormalise_spark.ops.textops import (
    WINNOW_BASE,
    WINNOW_MOD,
    winnow_fingerprints,
)


def py_winnow(text: str, k: int = 8, w: int = 4) -> list[int]:
    t = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(t) < k:
        return []
    hs = []
    for i in range(len(t) - k + 1):
        h = 0
        for ch in t[i : i + k]:
            h = h * WINNOW_BASE + ord(ch)
        hs.append(h % WINNOW_MOD)
    n = max(len(hs) - w + 1, 1)
    return sorted({min(hs[i : i + w]) for i in range(n)})


def _fps(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r["fingerprints"] for r in winnow_fingerprints(df, **kw).collect()}


def test_matches_pure_python_on_random_corpus(spark):
    rng = random.Random(7)
    alphabet = "abcdefg 0123,.! XYZ"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(60)
    ]
    got = _fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == py_winnow(t), (i, t)


def test_edge_cases(spark):
    got = _fps(spark, ["", "short", "exactly8", "aaaaaaaaaaaa"])
    assert got[0] == [] and got[1] == []
    assert len(got[2]) == 1  # one k-gram -> one window -> one fingerprint
    assert len(got[3]) == 1  # repeated char: all k-gram hashes identical


def test_shared_substring_guarantee(spark):
    """Any verbatim overlap of length >= w + k - 1 (= 11) shares a
    fingerprint — the winnowing correctness property the op exists
    for."""
    rng = random.Random(13)
    shared = "thecommonplagiarisedpassage"
    mk = lambda: "".join(rng.choice("xyzuvw") for _ in range(40))  # noqa: E731
    texts = [mk() + shared + mk(), shared.join([mk(), mk()])]
    got = _fps(spark, texts)
    assert set(got[0]) & set(got[1]), "overlapping docs share no fingerprint"


def test_disjoint_alphabets_share_nothing(spark):
    got = _fps(spark, ["aaaabbbbccccdddd" * 3, "mmmmnnnnoooopppp" * 3])
    assert not set(got[0]) & set(got[1])


def test_plan_has_no_shuffle(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("some document text here").alias("text")
    )
    plan = (
        winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # embarrassingly parallel per doc


def test_dup_pairs_finds_planted_near_dups(spark):
    """Pair-finding: two docs sharing a long passage pair up; disjoint
    docs don't; a passage shared by MANY docs (boilerplate) is dropped
    by the df filter and creates no pairs on its own."""
    from hnormalise_spark.ops.textops import winnow_dup_pairs

    shared = "a genuinely distinctive duplicated paragraph with plenty of text"
    boiler = "standard footer text appended to every single document here"
    docs = [
        (0, "unique prefix zero " + shared + " unique suffix zero"),
        (1, "other prefix one " + shared + " other suffix one"),
        (2, "completely different content about unrelated topics entirely"),
    ] + [(10 + i, f"doc body {i} " + boiler) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_dup_pairs(df, min_shared=2, max_df=4).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    assert not any(a >= 10 and b >= 10 for a, b in pairs)  # boilerplate filtered


def test_large_k_no_ansi_overflow(spark):
    """k=24 used to overflow int64 mid-fold (mod was applied only at
    the end); with the mod inside the Horner step every k works and
    still matches the pure-Python mod-at-each-step value (identical to
    mod-at-the-end by modular arithmetic)."""
    texts = ["the quick brown fox jumps over the lazy dog " * 3]
    got = _fps(spark, texts, k=24, w=5)
    assert got[0] == py_winnow(texts[0], k=24, w=5)
    assert len(got[0]) >= 1
