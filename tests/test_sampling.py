"""Deterministic hash sampling: stability, disjointness, stratification."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hnormalise_spark.ops import sampling as S

SPAN = float(1 << 60)


def _unit(key, salt: str = "") -> float:
    s = str(key) + ("|" + salt if salt else "")
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / SPAN


def test_hash_sample_is_pure_function_of_key(spark):
    df = spark.range(400).select(F.col("id").alias("doc_id"))
    got = sorted(r["doc_id"] for r in S.hash_sample(df, 0.3, "doc_id").collect())
    want = sorted(i for i in range(400) if _unit(i) < 0.3)
    assert got == want
    # same subset again after an arbitrary repartition — no RNG state
    again = sorted(
        r["doc_id"] for r in S.hash_sample(df.repartition(7), 0.3, "doc_id").collect()
    )
    assert again == want


def test_hash_split_intervals_are_disjoint_and_exhaustive(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = S.hash_split(df, {"train": (0.0, 0.9), "holdout": (0.9, 1.0)}, "doc_id").collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    assert len(splits) == 500
    assert set(splits.values()) == {"train", "holdout"}
    for i, s in splits.items():
        assert s == ("train" if _unit(i, "split") < 0.9 else "holdout")


def test_unsalted_split_optin_is_disjoint_from_samples(spark):
    # salt='' is the explicit opt-in: same uniform as hash_sample, so
    # the carved holdout is guaranteed disjoint from ANY smaller sample
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = S.hash_split(
        df, {"train": (0.0, 0.9), "holdout": (0.9, 1.0)}, "doc_id", salt=""
    ).collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    sample = {r["doc_id"] for r in S.hash_sample(df, 0.5, "doc_id").collect()}
    holdout = {i for i, s in splits.items() if s == "holdout"}
    assert holdout and sample.isdisjoint(holdout)


def test_salted_split_is_independent_of_sampling(spark):
    # regression for the composition bias: rows kept at rate 0.5 all
    # have unsalted u < 0.5 < 0.9, so an UNSALTED split could never put
    # them in holdout [0.9, 1.0). The salted default must land kept
    # rows in the holdout at ~the interval width.
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    kept = S.hash_sample(df, 0.5, "doc_id")
    out = S.hash_split(kept, {"train": (0.0, 0.9), "holdout": (0.9, 1.0)}, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert counts.get("holdout", 0) > 0
    assert 0.05 < counts["holdout"] / total < 0.20  # ~0.10 expected


def test_stratified_rates_apply_per_stratum(spark):
    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep_all").otherwise("keep_none").alias("stratum"),
    )
    out = S.stratified_hash_sample(df, {"keep_all": 1.0}, "stratum", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(0, 600, 2))  # absent strata default to rate 0


def test_sampling_plan_is_shuffle_free(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = (
        S.hash_sample(df, 0.5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# token-budget selection


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, quality_x1e4 long, n_tok long")


def test_budget_select_is_greedy_quality_prefix(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(1, 9000, 10), (2, 8000, 10), (3, 8000, 10), (4, 7000, 10)]
    # budget 25: bucket 9000 fits (10), bucket 8000 total 20 > 15 left
    # -> boundary: doc 2 (cum 10 <= 15), doc 3 (cum 20 > 15) out
    got = {r["doc_id"] for r in budget_select(_scored(spark, rows), 25).collect()}
    assert got == {1, 2}


def test_budget_select_budget_covers_everything(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(1, 9000, 10), (2, 1000, 10)]
    got = {r["doc_id"] for r in budget_select(_scored(spark, rows), 1000).collect()}
    assert got == {1, 2}


def test_budget_select_budget_smaller_than_best_doc(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(1, 9000, 10), (2, 8000, 3)]
    # best doc alone exceeds the budget -> greedy prefix is empty
    # (running sum 10 > 5 at the first row blocks everything after)
    got = budget_select(_scored(spark, rows), 5).collect()
    assert got == []


def test_budget_select_boundary_ties_break_on_doc_id(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(5, 8000, 10), (1, 8000, 10), (3, 8000, 10)]
    got = {r["doc_id"] for r in budget_select(_scored(spark, rows), 20).collect()}
    assert got == {1, 3}


def test_budget_select_null_quality_never_selected(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(1, 9000, 10), (2, None, 10)]
    got = {r["doc_id"] for r in budget_select(_scored(spark, rows), 100).collect()}
    assert got == {1}


def test_budget_select_boundary_window_is_bucket_partitioned(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rows = [(i, 8000 if i % 2 else 9000, 10) for i in range(1, 11)]
    df = budget_select(_scored(spark, rows), 70)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the per-doc window runs over the boundary bucket only, keyed on
    # the quality bucket — never a global (empty partitionBy) window
    assert "Window" not in plan or "quality_x1e4" in plan.split("Window")[1][:200]


def _gscored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, quality_x1e4 long, n_tok long"
    )


def test_budget_select_grouped_independent_budgets(spark):
    from hnormalise_spark.ops.sampling import budget_select_grouped

    rows = [
        (1, "en", 9000, 10), (2, "en", 8000, 10), (3, "en", 7000, 10),
        (4, "de", 5000, 10), (5, "de", 4000, 10),
        (6, "zh", 9999, 10),  # no budget entry -> dropped entirely
    ]
    got = {
        r["doc_id"]
        for r in budget_select_grouped(
            _gscored(spark, rows), {"en": 20, "de": 100}, group_col="lang"
        ).collect()
    }
    # en: top-2 fit the 20-token budget; de: everything fits; zh: gone
    assert got == {1, 2, 4, 5}


def test_budget_select_grouped_boundary_per_group(spark):
    from hnormalise_spark.ops.sampling import budget_select_grouped

    rows = [
        (1, "en", 8000, 10), (2, "en", 8000, 10), (3, "en", 8000, 10),
        (4, "de", 8000, 7), (5, "de", 8000, 7),
    ]
    got = {
        r["doc_id"]
        for r in budget_select_grouped(
            _gscored(spark, rows), {"en": 25, "de": 7}, group_col="lang"
        ).collect()
    }
    # boundary bucket resolved per group in doc_id order
    assert got == {1, 2, 4}


def test_budget_select_grouped_empty_budget_map(spark):
    from hnormalise_spark.ops.sampling import budget_select_grouped

    rows = [(1, "en", 9000, 10)]
    assert budget_select_grouped(_gscored(spark, rows), {}, group_col="lang").count() == 0


def test_budget_select_matches_naive_prefix_randomized(spark):
    """Seeded random corpus, several budgets: the two-pass threshold
    selection must equal the naive global greedy prefix exactly."""
    import random

    from hnormalise_spark.ops.sampling import budget_select

    rng = random.Random(0xB0D6E7)
    rows = [
        (i, rng.randrange(0, 50) * 100, rng.randrange(0, 40))
        for i in range(1, 301)
    ]
    df = _scored(spark, rows)
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    total = sum(r[2] for r in rows)
    for budget in [0, 1, 37, total // 10, total // 2, total - 1, total + 5]:
        cum, expect = 0, set()
        for i, _q, w in ordered:
            cum += w
            if cum > budget:
                break
            expect.add(i)
        got = {r["doc_id"] for r in budget_select(df, budget).collect()}
        assert got == expect, f"budget={budget}"


def _rank60(key, salt: str) -> int:
    s = str(key) + "|" + salt
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_stratified_take_exact_quota(spark):
    # 3 strata: sizes 10, 4, 1 — quota 4 keeps exactly min(4, size)
    rows = [(i, "a" if i < 10 else ("b" if i < 14 else "c")) for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = S.stratified_take(df, 4, ["stratum"], "doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["stratum"], []).append(r["doc_id"])
    assert len(got["a"]) == 4 and len(got["b"]) == 4 and got["c"] == [14]
    # the kept rows are the 4 lowest (hash, key) ranks in each stratum
    for stratum, ids in [("a", range(10)), ("b", range(10, 14))]:
        want = sorted(ids, key=lambda i: (_rank60(i, "take"), str(i)))[:4]
        assert sorted(got[stratum]) == sorted(want)


def test_stratified_take_stable_under_append(spark):
    # appending rows only displaces highest-ranked kept rows: the new
    # kept set is a subset of old_kept + new_rows (no resurrection)
    base = [(i, "s") for i in range(20)]
    df0 = spark.createDataFrame(base, "doc_id long, stratum string")
    kept0 = {r["doc_id"] for r in S.stratified_take(df0, 8, ["stratum"], "doc_id").collect()}
    df1 = spark.createDataFrame(base + [(i, "s") for i in range(20, 30)],
                                "doc_id long, stratum string")
    kept1 = {r["doc_id"] for r in S.stratified_take(df1, 8, ["stratum"], "doc_id").collect()}
    assert len(kept0) == len(kept1) == 8
    assert kept1 <= kept0 | set(range(20, 30))


def test_stratified_take_single_exchange(spark):
    df = spark.createDataFrame([(1, "x", "y")], "doc_id long, a string, b string")
    plan = S.stratified_take(df, 2, ["a", "b"], "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_stratified_take_null_stratum_is_its_own_group(spark):
    # a NULL stratum value forms one group with its own quota — it
    # must neither crash nor leak into a named stratum
    rows = [(i, None if i < 6 else "s") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = S.stratified_take(df, 3, ["stratum"], "doc_id").collect()
    by = {}
    for r in out:
        by.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert len(by[None]) == 3 and by[None] <= set(range(6))
    assert len(by["s"]) == 3 and by["s"] <= set(range(6, 12))
