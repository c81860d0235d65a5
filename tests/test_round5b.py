"""SemDeDup keep/drop, CCNet perplexity thirds, and the
data-constrained epoch plan (round-5 late additions)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hnormalise_spark.ops.dedup import semdedup_keep
from hnormalise_spark.ops.sampling import epoch_plan
from hnormalise_spark.ops.tokenops import perplexity_buckets, token_lm_bigram


# ---------------------------------------------------------------------------
# semdedup_keep


def _vec(base, eps=0.0, dim=8):
    # unit-ish vectors along distinct directions; eps nudges a copy
    v = [0.0] * dim
    v[base % dim] = 1.0
    v[(base + 1) % dim] = 0.1 + eps
    return v


def test_semdedup_drops_higher_id_near_identical(spark):
    # centroid ids 0 and 4 (stride 4); 1,2 are near-copies of 0's
    # direction, 5 sits alone near centroid 4
    rows = [
        (0, _vec(0)),
        (1, _vec(0, eps=0.001)),
        (2, _vec(0, eps=0.002)),
        (4, _vec(4)),
        (5, _vec(4, eps=0.3)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, _vec(0)), (4, _vec(4))]
    out = {
        r["vec_id"]: (r["list_id"], r["keep"])
        for r in semdedup_keep(df, cents, threshold=0.99).collect()
    }
    assert out[0] == (0, True)  # lowest id in its cluster always kept
    assert out[1] == (0, False) and out[2] == (0, False)  # near-copies drop
    assert out[4] == (4, True)
    assert out[5][1] is True  # similar cluster, but cosine < 0.99


def test_semdedup_keep_rule_is_lower_id_not_transitive(spark):
    # a~b and b~c but NOT a~c: b drops (lower neighbor a), c drops
    # (lower neighbor b) — the paper's greedy per-cluster sweep
    a = [1.0, 0.0, 0.0]
    b = [math.cos(0.1), math.sin(0.1), 0.0]
    c = [math.cos(0.2), math.sin(0.2), 0.0]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    thr = math.cos(0.15)  # a~b yes (0.1), b~c yes (0.1), a~c no (0.2)
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup_keep(df, [(0, a)], threshold=thr).collect()
    }
    assert out == {0: True, 1: False, 2: False}


def test_semdedup_hot_cluster_star_guard(spark):
    # one cluster far over max_cluster: spokes similar to the min-id
    # hub drop; a spoke dissimilar to the hub SURVIVES even though it
    # is similar to another spoke — the documented star trade
    hub = [1.0, 0.0, 0.0]
    spoke_near = [math.cos(0.05), math.sin(0.05), 0.0]
    # two mutually-identical spokes, both far from the hub
    spoke_far = [math.cos(1.0), math.sin(1.0), 0.0]
    rows = [(0, hub)] + [(i, spoke_near) for i in range(1, 6)] + [
        (10, spoke_far),
        (11, spoke_far),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup_keep(
            df, [(0, hub)], threshold=math.cos(0.2), max_cluster=3
        ).collect()
    }
    assert out[0] is True
    assert all(out[i] is False for i in range(1, 6))  # hub-similar spokes drop
    # exact form would drop 11 (11~10); the star skips spoke-spoke pairs
    assert out[10] is True and out[11] is True


def test_semdedup_plan_no_cartesian(spark):
    rows = [(i, _vec(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = semdedup_keep(df, [(0, _vec(0)), (4, _vec(4))])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# perplexity_buckets


def _bucket_replica(scores, grain=1000):
    """Pure-Python histogram-thirds labeling over collected
    (doc_id, source, mean_nll_x1e6) rows."""
    from collections import Counter, defaultdict

    per_src = defaultdict(list)
    for d, s, m in scores:
        per_src[s].append((d, m))
    labels = {}
    for s, docs in per_src.items():
        hist = Counter(m // grain for _, m in docs)
        n = len(docs)
        cum, lab = 0, {}
        for cell in sorted(hist):
            cum += hist[cell]
            lab[cell] = (
                "head" if 3 * cum <= n else "middle" if 3 * cum <= 2 * n else "tail"
            )
        for d, m in docs:
            labels[d] = lab[m // grain]
    return labels


def test_ppl_buckets_match_python_replica(spark):
    rows = [
        (i, "a" if i % 2 == 0 else "b", [1 + (i * 7 + j * 3) % 11 for j in range(6 + i % 5)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    scores = [
        (r["doc_id"], r["source"], r["mean_nll_x1e6"])
        for r in token_lm_bigram(df)
        .join(df.select("doc_id", "source"), "doc_id")
        .collect()
    ]
    expected = _bucket_replica(scores)
    got = {
        r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(df).collect()
    }
    assert got == expected


def test_ppl_buckets_thirds_bounds(spark):
    # with all-distinct cells, head <= n/3 and head+middle <= 2n/3
    rows = [
        (i, "s", [1 + (i * 13 + j * 5) % 50 for j in range(4 + i % 7)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    out = perplexity_buckets(df).groupBy("ppl_bucket").count().collect()
    counts = {r["ppl_bucket"]: r["count"] for r in out}
    n = sum(counts.values())
    assert counts.get("head", 0) * 3 <= n
    assert (counts.get("head", 0) + counts.get("middle", 0)) * 3 <= 2 * n
    assert counts.get("tail", 0) > 0


def test_ppl_buckets_excludes_unscoreable(spark):
    rows = [(0, "s", [1, 2, 3]), (1, "s", []), (2, "s", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tokens array<int>")
    got = perplexity_buckets(df).collect()
    assert [r["doc_id"] for r in got] == [0]


# ---------------------------------------------------------------------------
# epoch_plan


def test_epoch_plan_golden(spark):
    rows = [
        ("web", 100),
        ("web", 100),  # avail 200
        ("wiki", 50),  # avail 50
        ("junk", 10),  # not in weights -> 0 budget
        ("empty", 0),  # avail 0 -> 0 epochs, full shortfall
    ]
    df = spark.createDataFrame(rows, "source string, n_tok long")
    out = {
        r["source"]: (
            r["n_tok_avail"],
            r["desired_tok"],
            r["epochs"],
            r["n_tok_planned"],
            r["shortfall"],
        )
        for r in epoch_plan(
            df, target_total=1000, weights={"web": 1, "wiki": 3, "empty": 1}, max_epochs=4
        ).collect()
    }
    # W = 5: web desired 200 (1 epoch exactly), wiki 600 -> ceil(12) cap 4
    assert out["web"] == (200, 200, 1, 200, 0)
    assert out["wiki"] == (50, 600, 4, 200, 400)
    assert out["junk"] == (10, 0, 0, 0, 0)
    assert out["empty"] == (0, 200, 0, 0, 200)


def test_epoch_plan_cap_not_binding(spark):
    df = spark.createDataFrame([("a", 300)], "source string, n_tok long")
    (r,) = epoch_plan(df, target_total=500, weights={"a": 1}, max_epochs=10).collect()
    # desired 500, avail 300 -> 2 epochs, planned = desired (500 <= 600)
    assert (r["epochs"], r["n_tok_planned"], r["shortfall"]) == (2, 500, 0)
