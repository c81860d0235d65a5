"""Time-series analytics over event logs: tumbling rollups and
gap-based sessionization.

Both are pure DataFrame compositions — no UDFs anywhere:

* ``rollup`` — tumbling time buckets per key with count/sum/avg plus a
  trailing moving average over the bucket series. One shuffle on
  (key, bucket); the moving average is a window over the ALREADY
  aggregated frame (bucket cardinality, not row cardinality), so the
  second shuffle moves only rollup rows. At 100 TB the raw-row shuffle
  is the cost; (key, bucket) is high-cardinality and uniform, so AQE
  splits it fine, and pre-bucketed (partitioned-by-day) storage turns
  it map-side partial.

* ``sessionize`` — the classic gap rule: a new session starts when a
  user's inter-event gap exceeds ``gap``. lag + cumulative-sum over a
  per-user time-ordered window; one shuffle on the user key. Skewed
  power users are real at scale — the window is per-user sequential by
  definition (sessions are inherently serial per user), so the fix is
  capping/salting upstream, not a different plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
    trailing: int = 3,
) -> DataFrame:
    """Tumbling-window rollup per key: n events, value sum/avg per
    (key, bucket), plus a ``trailing``-bucket moving average of the
    per-bucket sum (current + trailing-1 preceding buckets)."""
    agg = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.window(F.col(ts_col), bucket)["start"].alias("bucket_start"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("value_sum"),
            F.avg(value_col).alias("value_avg"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_start")
        .rowsBetween(-(trailing - 1), 0)
    )
    return agg.withColumns(
        {
            "moving_avg_sum": F.avg("value_sum").over(w),
            "moving_sum": F.sum("value_sum").over(w),
        }
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign every event a session id: sessions break when the gap to
    the user's previous event exceeds ``gap_seconds``. session_seq is
    1-based per user; rows keep all original columns.

    Gap arithmetic runs on integer microseconds (``unix_micros``), not
    float epoch seconds — exact, and engine-portable for the oracle.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # unix_micros rejects TIMESTAMP_NTZ; the cast is a no-op for
    # TIMESTAMP and, with the session TZ pinned to UTC (session.py),
    # an identity instant mapping for NTZ — gaps are differences, so
    # any fixed offset would cancel anyway.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | (us - prev > F.lit(int(gap_seconds) * 1_000_000)),
        1,
    ).otherwise(0)
    # two projections: a window result cannot feed another window
    # function in the same select — both windows share the same
    # partitioning, so this is still ONE shuffle on the user key
    marked = df.withColumn("_brk", is_new)
    return marked.withColumn(
        "session_seq",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_brk")


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count, span seconds, first/last
    timestamps — the sessionized frame reduced one more level (same
    user-key partitioning carries through, so the second aggregate
    reuses the shuffle when AQE keeps the partitioning)."""
    s = sessionize(df, ts_col, user_col, gap_seconds)
    return s.groupBy(F.col(user_col), F.col("session_seq")).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_first"),
        F.max(ts_col).alias("t_last"),
        (
            F.unix_timestamp(F.max(ts_col).cast("timestamp"))
            - F.unix_timestamp(F.min(ts_col).cast("timestamp"))
        ).alias("span_seconds"),
    )
