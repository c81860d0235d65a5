"""Shuffle-skew diagnosis: hot-key report + salt recommendation.

The operational companion of the pipeline's explicit skew handling
(``pipeline.counts_salted``, the salted route aggregate): BEFORE
choosing a salt factor, measure which keys are hot and how many salt
buckets each needs for a target parallelism. The report is what a
100 TB job's pre-flight check renders; the recommendation feeds the
``salt=`` dial the salted operators already expose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    tasks: int = 32,
) -> DataFrame:
    """Top-``top_k`` hottest values of ``key_col`` with, per key:
    row count, integer-ppm share of the table, and the recommended
    number of salt buckets so no bucket exceeds the ideal rows/task
    at ``tasks``-way parallelism —
    ``salt_buckets = ceil(n_rows · tasks / total)`` (exact integer
    arithmetic, 1 for keys already under one task's ideal share).
    NULL keys count as a key (they hash to one partition like any
    other hot value — the classic skew culprit).

    Rank order is total (n_rows DESC, key ASC as string) so the
    report is deterministic under ties.

    Scale shape: ONE map-side-combined count aggregate keyed by the
    diagnosed key (output is key-cardinality-bounded); the two scalar
    totals broadcast back; the top-k cut is TakeOrderedAndProject and
    the rank window runs on ≤ top_k rows. The diagnosis never
    shuffles more than the aggregate it is diagnosing would.
    """
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(int(top_k))
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "key",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.floor(
            F.col("n_rows").cast("double") / F.col("_total").cast("double")
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("share_ppm"),
        # `div` = exact integer division (the docstring's claim);
        # floor(double/double) would drift by one past 2^53
        F.expr(
            f"(n_rows * {int(tasks)}L + _total - 1L) div _total"
        )
        .cast("long")
        .alias("salt_buckets"),
        F.col("_n_keys").cast("long").alias("n_keys_total"),
    )
