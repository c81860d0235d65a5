"""Persisted ANN index: partition pruning, multi-probe recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnormalise_spark.ops import similarity as S

DIM = 16
N = 400


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic synthetic embeddings
    df = spark.range(N).toDF("vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: ((F.col("vec_id") * 31 + d * 17) % 13 - 6).cast("float") / 6.0,
    )
    return df.withColumn("embedding", vec)


@pytest.fixture(scope="module")
def qvec():
    return [((i * 7) % 11 - 5) / 5.0 for i in range(DIM)]


def test_index_probe_is_partition_pruned(spark, emb, qvec, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ann") / "idx")
    S.build_ann_index(emb, idx, DIM, n_planes=6)

    probe = S.ann_index_topk(spark, idx, qvec, k=5, n_planes=6)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the bucket filter must reach the scan as a PartitionFilter
    assert "PartitionFilters: [" in plan
    assert "sketch" in plan.split("PartitionFilters:")[1][:200]

    # probe result equals brute-force restricted to the same bucket
    q_sketch = S.query_sketch(qvec, 6)
    brute = (
        S.cosine_scores(
            emb.withColumn("sketch", S.lsh_sketch(F.col("embedding"), DIM, 6)).filter(
                F.col("sketch") == q_sketch
            ),
            qvec,
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(5)
        .select("vec_id")
    )
    assert [r["vec_id"] for r in probe.select("vec_id").collect()] == [
        r["vec_id"] for r in brute.collect()
    ]


def test_multiprobe_recall_monotone(spark, emb, qvec, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ann2") / "idx")
    S.build_ann_index(emb, idx, DIM, n_planes=6)
    exact = {
        r["vec_id"]
        for r in S.cosine_topk(emb, qvec, k=10, id_col="vec_id").collect()
    }

    def recall(radius: int) -> float:
        got = {
            r["vec_id"]
            for r in S.ann_index_topk(
                spark, idx, qvec, k=10, n_planes=6, probe_radius=radius
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert r2 >= 0.8  # radius-2 ball over 6 planes covers 22/64 buckets

    # hamming_ball sizes: 1, 1+n, 1+n+C(n,2)
    assert len(S.hamming_ball(0, 6, 0)) == 1
    assert len(S.hamming_ball(0, 6, 1)) == 7
    assert len(S.hamming_ball(0, 6, 2)) == 22


def test_snapshot_index_incremental_and_pruned(spark, emb, qvec, tmp_path_factory):
    """Index builds through the snapshot table layer: committed builds
    are resume no-ops, a second snapshot extends the probe's corpus
    (incremental re-index), and the probe stays partition-pruned on
    BOTH levels (manifest prunes uncommitted snapshots, sketch prunes
    buckets)."""
    idx = str(tmp_path_factory.mktemp("ann3") / "idx")
    first = emb.filter(F.col("vec_id") < N // 2)
    second = emb.filter(F.col("vec_id") >= N // 2)

    # radius 2: the synthetic corpus occupies 11 of 64 buckets and the
    # query's radius-1 ball happens to miss all of them (a data
    # artifact, not a pruning bug) — radius 2 reaches buckets 8 and 11
    assert S.build_ann_index_snapshot(first, idx, "s1", DIM, n_planes=6) is True
    got1 = {r["vec_id"] for r in S.ann_snapshot_probe(spark, idx, qvec, 6, 2).collect()}
    assert got1  # non-vacuous: the probe must actually hit data

    # resume: committed build is a no-op
    assert S.build_ann_index_snapshot(first, idx, "s1", DIM, n_planes=6) is False

    # incremental: new corpus batch = new snapshot; probe sees the union
    assert S.build_ann_index_snapshot(second, idx, "s2", DIM, n_planes=6) is True
    got2 = {r["vec_id"] for r in S.ann_snapshot_probe(spark, idx, qvec, 6, 2).collect()}
    assert got1 < got2
    assert any(v >= N // 2 for v in got2)

    # equivalent to sketching the full corpus in one pass
    buckets = S.hamming_ball(S.query_sketch(qvec, 6), 6, 2)
    brute = {
        r["vec_id"]
        for r in emb.withColumn("sketch", S.lsh_sketch(F.col("embedding"), DIM, 6))
        .filter(F.col("sketch").isin(buckets))
        .collect()
    }
    assert got2 == brute

    # sketch filter reaches the scan as a partition filter
    probe = S.ann_snapshot_probe(spark, idx, qvec, 6, 2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "sketch" in plan.split("PartitionFilters:")[1][:300]


def test_recall_at_k_counts_intersection(spark):
    from hnormalise_spark.ops.similarity import recall_at_k

    exact = spark.createDataFrame([(i,) for i in range(1, 11)], "vec_id long")
    approx = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 99, 100, 5]], "vec_id long"
    )  # 5 hits, duplicate candidate counted once
    row = recall_at_k(exact, approx, k=10).collect()[0]
    assert (row["k"], row["n_hits"], row["recall_x1e6"]) == (10, 5, 500000)


def test_recall_at_k_empty_candidates(spark):
    from hnormalise_spark.ops.similarity import recall_at_k

    exact = spark.createDataFrame([(1,), (2,)], "vec_id long")
    approx = spark.createDataFrame([], "vec_id long")
    row = recall_at_k(exact, approx, k=2).collect()[0]
    assert row["n_hits"] == 0 and row["recall_x1e6"] == 0


def test_recall_at_k_exact_side_broadcast(spark):
    from hnormalise_spark.ops.similarity import recall_at_k

    exact = spark.createDataFrame([(1,), (2,)], "vec_id long")
    approx = spark.createDataFrame([(1,), (3,)], "vec_id long")
    plan = recall_at_k(exact, approx, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
