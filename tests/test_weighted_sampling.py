"""Weighted (Efraimidis-Spirakis) sampling and temperature mixing:
exact agreement with a pure-Python replica, weight monotonicity,
partition invariance, and the rate formula's limit cases."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hnormalise_spark.ops import sampling as S

SPAN = float(1 << 60)


def _unit(key: str, salt: str = "") -> float:
    s = key + ("|" + salt if salt else "")
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) / SPAN


def _weights_df(spark, rows, slices=4):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), "k long, w double, g string"
    )


def _py_topk(rows, n, salt="wsample"):
    ranked = sorted(
        ((math.log(_unit(str(k), salt)) / w, k) for k, w, _ in rows if w > 0),
        key=lambda t: (-t[0], t[1]),
    )
    return {k for _, k in ranked[:n]}


def test_matches_python_replica_exactly(spark):
    rows = [(k, float(1 + (k % 7)), "a") for k in range(500)]
    got = {
        r["k"]
        for r in S.weighted_sample_topk(
            _weights_df(spark, rows), n=50, weight_col="w", key_col="k"
        ).collect()
    }
    assert got == _py_topk(rows, 50)


def test_partition_invariance(spark):
    rows = [(k, float(1 + (k % 5)), "a") for k in range(400)]
    pick = lambda slices: {
        r["k"]
        for r in S.weighted_sample_topk(
            _weights_df(spark, rows, slices), n=40, weight_col="w", key_col="k"
        ).collect()
    }
    assert pick(1) == pick(11)


def test_heavy_weights_dominate(spark):
    rows = [(k, 20.0, "heavy") for k in range(1000)] + [
        (k + 1000, 1.0, "light") for k in range(1000)
    ]
    out = S.weighted_sample_topk(
        _weights_df(spark, rows), n=200, weight_col="w", key_col="k"
    )
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts.get("heavy", 0) > 3 * counts.get("light", 0), counts


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 0.0, "a"), (2, -3.0, "a"), (3, 2.0, "a")]
    got = {r["k"] for r in S.weighted_sample_topk(
        _weights_df(spark, rows), n=10, weight_col="w", key_col="k").collect()}
    assert got == {3}


def test_per_group_topk(spark):
    rows = [(k, 1.0 + k, "g%d" % (k % 3)) for k in range(90)]
    out = S.weighted_sample_topk(
        _weights_df(spark, rows), n=5, weight_col="w", key_col="k",
        group_cols=["g"],
    )
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}


# --- temperature mixing ----------------------------------------------------


def test_rates_alpha_one_is_proportional():
    rates = S.temperature_mix_rates({"a": 900, "b": 100}, alpha=1.0, budget_frac=0.4)
    # share ~ count -> every group keeps the same fraction = budget
    assert abs(rates["a"] - 0.4) < 1e-9 and abs(rates["b"] - 0.4) < 1e-9


def test_rates_alpha_zero_is_equal_share():
    rates = S.temperature_mix_rates({"a": 900, "b": 100}, alpha=0.0, budget_frac=0.4)
    # equal targets: 200 rows each -> a keeps 200/900, b capped math: 200/100 -> 1.0
    assert abs(rates["a"] - 200 / 900) < 1e-6
    assert rates["b"] == 1.0


def test_rates_cap_at_one():
    rates = S.temperature_mix_rates({"a": 10_000, "b": 10}, alpha=0.3, budget_frac=0.9)
    assert all(r <= 1.0 for r in rates.values())


def test_mix_matches_python_replica(spark):
    rows = [(k, 1.0, ["en", "en", "en", "de", "fr"][k % 5]) for k in range(600)]
    df = _weights_df(spark, rows)
    got = {r["k"] for r in S.temperature_mix(
        df, group_col="g", key_col="k", alpha=0.5, budget_frac=0.5).collect()}
    counts = {}
    for k, _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    rates = S.temperature_mix_rates(counts, alpha=0.5, budget_frac=0.5)
    want = {k for k, _, g in rows if _unit(str(k), "tmix") < rates[g]}
    assert got == want


def test_mix_upsamples_low_resource(spark):
    rows = [(k, 1.0, "big" if k < 1800 else "small") for k in range(2000)]
    df = _weights_df(spark, rows)
    out = S.temperature_mix(df, group_col="g", key_col="k", alpha=0.5,
                            budget_frac=0.5)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # natural shares 90/10; alpha=0.5 shifts the mix toward 'small':
    # its kept FRACTION must exceed big's
    assert counts["small"] / 200 > counts["big"] / 1800, counts
