"""Determinism under parallelism: the order-sensitive operators must
produce IDENTICAL results regardless of how the input is partitioned —
the property that separates 'passes at sf0.01' from 'safe on a
1000-executor cluster', where input split boundaries are arbitrary.

Each op runs on the same data repartitioned 3 ways (1, 2, 17 slices —
deliberately not divisors of each other) and the full row multisets
must match exactly.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

PARTS = (1, 2, 17)


def _multiset(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _assert_partition_invariant(make_df, op):
    outs = [_multiset(op(make_df(p))) for p in PARTS]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def _docs_factory(spark, n=120):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))))
        for i in range(n)
    ]

    def make(p):
        return spark.createDataFrame(rows, "doc_id long, text string").repartition(p)

    return make


def test_pack_sequences_partition_invariant(spark):
    from hnormalise_spark.ops.packing import pack_sequences

    make = _docs_factory(spark)
    _assert_partition_invariant(
        make, lambda df: pack_sequences(df, ctx=64).drop("text")
    )


def test_reshard_partition_invariant(spark):
    from hnormalise_spark.ops.packing import reshard

    make = _docs_factory(spark)
    _assert_partition_invariant(make, lambda df: reshard(df.drop("text"), 5))


def test_budget_select_partition_invariant(spark):
    from hnormalise_spark.ops.sampling import budget_select

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 30) * 100, rng.randrange(0, 20)) for i in range(200)]

    def make(p):
        return spark.createDataFrame(
            rows, "doc_id long, quality_x1e4 long, n_tok long"
        ).repartition(p)

    _assert_partition_invariant(make, lambda df: budget_select(df, 371))


def test_sessionize_partition_invariant(spark):
    from hnormalise_spark.ops.timeseries import sessionize

    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 7, base + dt.timedelta(seconds=rng.randrange(0, 20000)))
        for i in range(300)
    ]

    def make(p):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        ).repartition(p)

    _assert_partition_invariant(
        make, lambda df: sessionize(df, gap_seconds=600, tiebreak_col="event_id")
    )


def test_minhash_lsh_partition_invariant(spark):
    from hnormalise_spark.ops.dedup import minhash_lsh_dedup

    rng = random.Random(17)
    vocab = [f"tok{i}" for i in range(8)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(12))) for i in range(60)
    ] + [(1000 + i, " ".join(f"tok{j % 8}" for j in range(12))) for i in range(4)]

    def make(p):
        return spark.createDataFrame(rows, "doc_id long, text string").repartition(p)

    _assert_partition_invariant(make, lambda df: minhash_lsh_dedup(df))


def test_lm_bigram_partition_invariant(spark):
    from hnormalise_spark.ops.textops import lm_bigram_score

    make = _docs_factory(spark, n=80)
    _assert_partition_invariant(make, lm_bigram_score)


def test_bpe_train_partition_invariant(spark):
    from hnormalise_spark.ops.textops import bpe_train

    make = _docs_factory(spark, n=60)
    _assert_partition_invariant(make, lambda df: bpe_train(df, n_merges=4))
