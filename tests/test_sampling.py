"""Deterministic hash sampling: stability, disjointness, stratification."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hnormalise_spark.ops import sampling as S

SPAN = float(1 << 60)


def _unit(key) -> float:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) / SPAN


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
        assert s == ("train" if _unit(i) < 0.9 else "holdout")
    # the carved holdout is disjoint from ANY smaller hash_sample
    sample = {r["doc_id"] for r in S.hash_sample(df, 0.5, "doc_id").collect()}
    holdout = {i for i, s in splits.items() if s == "holdout"}
    assert sample.isdisjoint(holdout)


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
