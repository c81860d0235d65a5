"""Length-bucketed batch assembly: quota/rank goldens, padding math,
hash-replica shard agreement, single-Exchange plan."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from hnormalise_spark.ops.packing import length_bucket_batches

SPAN = float(1 << 60)


def _shard(key, shards):
    u = int(hashlib.md5(f"{key}|lbb".encode()).hexdigest()[:15], 16) / SPAN
    return math.floor(u * shards)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_batches_match_python_replica(spark):
    # single shard so ranking is easy to replicate exactly
    rows = [(i, list(range(10 + (i % 5) * 30))) for i in range(40)]
    out = length_bucket_batches(
        _df(spark, rows), bucket_width=64, batch_size=4, shards=1
    ).collect()

    # replica: bucket by (len-1)//64, rank by doc_id, batch = rank//4
    docs = sorted((i, len(t)) for i, t in rows)
    by_bucket = {}
    for i, n in docs:
        by_bucket.setdefault((n - 1) // 64, []).append((i, n))
    want = {}
    for b, items in by_bucket.items():
        for rk, (i, n) in enumerate(sorted(items)):
            want[i] = (n, b, 0, rk // 4)
    got = {r["doc_id"]: (r["n_tok"], r["bucket"], r["shard"], r["batch_idx"])
           for r in out}
    assert got == want
    # padding: every row's pad = batch_max - n_tok, ppm of batch_max
    for r in out:
        assert r["pad_ppm"] == math.floor(
            (r["batch_max_len"] - r["n_tok"]) * 1e6 / r["batch_max_len"] + 0.5
        )
        assert r["batch_max_len"] >= r["n_tok"]


def test_shard_is_md5_replica_and_batches_bounded(spark):
    rows = [(i, [1] * 70) for i in range(60)]
    out = length_bucket_batches(
        _df(spark, rows), bucket_width=64, batch_size=8, shards=4
    ).collect()
    sizes = {}
    for r in out:
        assert r["shard"] == _shard(r["doc_id"], 4)
        assert r["bucket"] == 1
        sizes.setdefault((r["shard"], r["batch_idx"]), 0)
        sizes[(r["shard"], r["batch_idx"])] += 1
    # every batch holds <= batch_size rows, and only the last batch of
    # a shard may be ragged
    for (sh, bi), n in sizes.items():
        assert n <= 8
        if any(b2 > bi for (s2, b2) in sizes if s2 == sh):
            assert n == 8


def test_empty_sequences_excluded(spark):
    out = length_bucket_batches(
        _df(spark, [(1, []), (2, None), (3, [5])]), bucket_width=4,
        batch_size=2, shards=1,
    ).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_single_exchange(spark):
    df = length_bucket_batches(_df(spark, [(1, [1, 2])]), shards=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
