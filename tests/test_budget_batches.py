"""Token-budget batching mode of length_bucket_batches: budget bound,
per-bucket capacities, fixed-size mode regression."""

import pytest
from pyspark.sql import functions as F

from hnormalise_spark.ops.packing import length_bucket_batches


@pytest.fixture(scope="module")
def toked(spark):
    # lengths spread over several 32-wide buckets, incl. one
    # over-budget sequence (600 > 512)
    lens = [5, 7, 9, 11, 30, 31, 33, 60, 64, 65, 100, 130, 200, 600]
    rows = [(i, list(range(n))) for i, n in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_budget_bound_holds(spark, toked):
    out = length_bucket_batches(
        toked, bucket_width=32, shards=2, max_tokens=512
    ).collect()
    for r in out:
        # every multi-sequence batch fits the budget; only singleton
        # batches of over-budget sequences may exceed it
        assert r.batch_cost <= 512 or r.batch_n == 1, r
        assert r.batch_cost == r.batch_n * r.batch_max_len


def test_capacity_is_bucket_ceiling_division(spark, toked):
    out = length_bucket_batches(
        toked, bucket_width=32, shards=1, max_tokens=512
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    # bucket 0 (ceiling 32): capacity 16 → all six short docs, 1 batch
    assert {r.batch_idx for r in by_bucket[0]} == {0}
    # bucket 1 (ceiling 64): capacity 8
    assert all(r.batch_n <= 8 for r in by_bucket[1])
    # the 600-token doc: bucket 18, ceiling 608 > 512 → capacity 1
    big = [r for r in out if r.n_tok == 600]
    assert big[0].batch_n == 1 and big[0].batch_cost == 600


def test_fixed_mode_unchanged_and_reports_cost(spark, toked):
    out = length_bucket_batches(
        toked, bucket_width=64, batch_size=2, shards=1
    ).collect()
    assert all(r.batch_n <= 2 for r in out)
    assert all(r.batch_cost == r.batch_n * r.batch_max_len for r in out)
    # ranks within (bucket, shard) split into batches of 2 by id order
    b0 = sorted(
        (r.doc_id, r.batch_idx) for r in out if r.bucket == 0
    )
    ids = [d for d, _ in b0]
    for pos, (_, bidx) in enumerate(b0):
        assert bidx == pos // 2, (ids, b0)
