"""token_pack_blocks — materialized concat-then-chunk packing."""

import pytest
from pyspark.sql import functions as F

from hnormalise_spark.ops import tokenops as TK
from hnormalise_spark.ops.packing import pack_sequences  # noqa: F401 (shared id space)

pytestmark = pytest.mark.usefixtures("spark")


def _df(spark, rows, id_type="long"):
    return spark.createDataFrame(
        rows, f"doc_id {id_type}, tokens array<int>"
    )


def _blocks(df, **kw):
    return {
        r["block_id"]: (list(r["tokens"]), r["n_tok"], r["n_docs"])
        for r in TK.token_pack_blocks(df, **kw).collect()
    }


def test_single_shard_golden(spark):
    # one shard → deterministic doc order = doc_id asc; stream is
    # 1,2,3,EOD | 4,5,EOD,6 | EOD  with ctx=4
    df = _df(spark, [(1, [1, 2, 3]), (2, [4, 5]), (3, [6])])
    out = _blocks(df, ctx=4, eod=0, shards=1)
    assert out[0] == ([1, 2, 3, 0], 4, 1)
    assert out[1] == ([4, 5, 0, 6], 4, 2)
    assert out[2] == ([0], 1, 1)


def test_stream_equals_concat(spark):
    # flattening the blocks in block order must reproduce the
    # concatenated per-shard stream exactly — every token, once
    rows = [(i, list(range(i, i + (i % 7) + 1))) for i in range(1, 40)]
    df = _df(spark, rows)
    got = TK.token_pack_blocks(df, ctx=5, eod=99, shards=1).collect()
    stream = []
    for r in sorted(got, key=lambda r: r["block_id"]):
        stream.extend(r["tokens"])
    expect = []
    for i, toks in sorted(rows):
        expect.extend(toks + [99])
    assert stream == expect


def test_block_sizes_and_ids(spark):
    rows = [(i, [i] * (3 + i % 5)) for i in range(1, 30)]
    df = _df(spark, rows)
    got = TK.token_pack_blocks(df, ctx=8, shards=4).collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["block_id"] >> 32, []).append(r)
    total = sum(len(t) for _, t in rows)
    assert sum(r["n_tok"] for r in got) == total
    for shard, blks in by_shard.items():
        blks.sort(key=lambda r: r["block_id"])
        # contiguous block numbers from 0 within the shard
        assert [b["block_id"] & 0xFFFFFFFF for b in blks] == list(range(len(blks)))
        # every block full except possibly the last
        for b in blks[:-1]:
            assert b["n_tok"] == 8
        assert 1 <= blks[-1]["n_tok"] <= 8


def test_agrees_with_pack_sequences_shards(spark):
    # the salted shard hash matches pack_sequences' id space: a doc's
    # block_id prefix here equals pack_sequences' shard for the same key
    rows = [(i, [7] * 4) for i in range(1, 20)]
    df = _df(spark, rows)
    from hnormalise_spark.ops.sampling import key_hash_unit

    shards = (
        df.select(
            "doc_id",
            F.floor(key_hash_unit(F.col("doc_id"), "pack") * 4)
            .cast("int")
            .alias("shard"),
        )
        .distinct()
        .collect()
    )
    seen_shards = {r["shard"] for r in shards}
    got_shards = {
        r["block_id"] >> 32
        for r in TK.token_pack_blocks(df, ctx=16, shards=4).collect()
    }
    assert got_shards <= seen_shards


def test_empty_null_dropped_and_null_elements(spark):
    df = spark.createDataFrame(
        [(1, [1, None, 2]), (2, []), (3, None)],
        "doc_id long, tokens array<int>",
    )
    out = _blocks(df, ctx=4, shards=1)
    assert list(out.values()) == [([1, 2], 2, 1)]


def test_doc_spanning_many_blocks(spark):
    df = _df(spark, [(1, list(range(13)))])
    out = _blocks(df, ctx=4, shards=1)
    assert out[0] == ([0, 1, 2, 3], 4, 1)
    assert out[1] == ([4, 5, 6, 7], 4, 1)
    assert out[2] == ([8, 9, 10, 11], 4, 1)
    assert out[3] == ([12], 1, 1)


def test_n_docs_counts_contributors(spark):
    # ctx=6: doc1 (4 tok) + doc2 first 2 → block 0 has 2 docs
    df = _df(spark, [(1, [1, 1, 1, 1]), (2, [2, 2, 2, 2])])
    out = _blocks(df, ctx=6, shards=1)
    assert out[0][2] == 2
    assert out[1][2] == 1


def test_plan_two_shuffles_no_python(spark):
    df = _df(spark, [(1, [1, 2, 3])])
    plan = (
        TK.token_pack_blocks(df, ctx=4, shards=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ONE shuffle: the order-defining window hashes by shard, and the
    # (shard, block) aggregate's ClusteredDistribution is satisfied by
    # that same partitioning (shard is a prefix of the group key), so
    # block assembly rides the window's Exchange
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(_shard" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan  # no row-wise or arrow Python
