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
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign every event a session id: sessions break when the gap to
    the user's previous event exceeds ``gap_seconds``. session_seq is
    1-based per user; rows keep all original columns.

    Gap arithmetic runs on integer microseconds (``unix_micros``), not
    float epoch seconds — exact, and engine-portable for the oracle.

    ``tiebreak_col`` (a unique row id, e.g. ``event_id``) pins the
    window order when two events of the same user share a timestamp:
    without it, the cumulative sum crosses tied rows in an engine- and
    run-dependent order, so a tie straddling a session boundary gets
    nondeterministic session_seq. The break PREDICATE is order-free at
    equal ts (gap 0 never exceeds a positive threshold), only the
    running sum's crossing order matters — a total order makes it
    deterministic.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
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


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    build_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
    build_tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: each probe row picks up the build row with the
    greatest build.ts <= probe.ts for the same key (inclusive, the
    DuckDB/kdb ASOF JOIN rule). Probe rows with no prior build row
    keep nulls.

    Spark has no native as-of join; the naive formulations are a
    non-equi range join (O(n*m) candidate explosion per key) or a
    per-key UDF (serial Python per group). This is the scale-correct
    composition instead: tag and UNION both sides, then ONE window
    over (key, ts) carrying the last non-null build value forward —
    a single shuffle on the key, linear work per partition, no
    candidate blowup regardless of how many build rows precede a
    probe row. Build rows sort BEFORE probe rows at equal ts
    (tag 0 < 1) which is exactly the inclusive <= semantics.

    ``build_cols`` are the build-side payload columns to attach; they
    are emitted as ``<name><suffix>`` plus ``<ts_col><suffix>`` for
    the matched build timestamp.

    ``build_tiebreak_col`` pins which build row wins when several
    build rows share (key, ts): the one with the GREATEST tiebreak
    value (it sorts last under the carry window, so its values are
    the ones carried). Without it the winner is engine- and
    run-dependent — same latent-tie class as ``sessionize``. Probe
    ordering among equal-ts probes never matters: every such probe
    sees the same set of preceding build rows (tag 0 sorts first).
    """
    if not build_cols:
        build_cols = tuple(
            c for c in build.columns if c not in (key_col, ts_col)
        )
    # a null-ts build row would sort FIRST under the window and be
    # carried into every probe row before the first real build row
    # (ASOF semantics: no match); null keys must not match null keys
    # either (SQL equality). Drop both from the build side.
    build = build.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    )
    if build_tiebreak_col is not None:
        tb_b = [F.col(build_tiebreak_col).alias("_tb")]
        tb_p = [
            F.lit(None).cast(dict(build.dtypes)[build_tiebreak_col]).alias("_tb")
        ]
        order = [F.col("_t").asc(), F.col("_tag").asc(), F.col("_tb").asc()]
    else:
        tb_b, tb_p = [], []
        order = [F.col("_t").asc(), F.col("_tag").asc()]
    b = build.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_tag"),
        *tb_b,
        F.col(ts_col).alias(f"_b_{ts_col}"),
        *[F.col(c).alias(f"_b_{c}") for c in build_cols],
        *[
            F.lit(None).cast(dict(probe.dtypes)[c]).alias(f"_p_{c}")
            for c in probe.columns
        ],
    )
    p = probe.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_tag"),
        *tb_p,
        F.lit(None).cast(dict(build.dtypes)[ts_col]).alias(f"_b_{ts_col}"),
        *[
            F.lit(None).cast(dict(build.dtypes)[c]).alias(f"_b_{c}")
            for c in build_cols
        ],
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = b.unionByName(p).select(
        "*",
        F.last(f"_b_{ts_col}", ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
        *[
            F.last(f"_b_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in build_cols
        ],
    )
    return carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c in probe.columns],
        F.col(f"{ts_col}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in build_cols],
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates: event count, span seconds, first/last
    timestamps — the sessionized frame reduced one more level (same
    user-key partitioning carries through, so the second aggregate
    reuses the shuffle when AQE keeps the partitioning)."""
    s = sessionize(df, ts_col, user_col, gap_seconds, tiebreak_col)
    return s.groupBy(F.col(user_col), F.col("session_seq")).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("t_first"),
        F.max(ts_col).alias("t_last"),
        (
            F.unix_timestamp(F.max(ts_col).cast("timestamp"))
            - F.unix_timestamp(F.min(ts_col).cast("timestamp"))
        ).alias("span_seconds"),
    )


def distinct_profile(
    events: DataFrame,
    key: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key cardinality profile: total events, EXACT distinct users,
    EXACT distinct active days.

    Spark plans multiple distinct aggregates in one pass: a single
    Expand (one replica per distinct clause) feeding a partial
    de-duplicating hash aggregate BEFORE the shuffle, so reducer input
    is bounded by per-partition cardinality, not row count — exact
    distinct that survives 100 TB without a shuffle cascade per
    DISTINCT. Where ±2% suffices, swap in ``approx_count_distinct``
    (HyperLogLog++, fixed KB-scale state per group); the error bound is
    pinned against this exact version in tests."""
    return events.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col(user_col)).alias("n_users"),
        F.count_distinct(F.to_date(ts_col)).alias("n_days"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i iff their FIRST
    occurrence of every step 0..i exists in strictly increasing time
    order (first view < first click < first purchase).

    Plan shape for 100 TB: ONE user-keyed shuffle computing the
    conditional-min pivot (len(steps) first-timestamps per user,
    map-side combined), then a single-row global aggregate over
    per-user booleans — no self-joins, no per-step passes (the naive
    formulation joins the events table len(steps) times).
    Returns (step, n_users), one row per step, funnel-ordered.
    """
    mins = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy(user_col).agg(*mins)
    reach = F.col("_t0").isNotNull()
    flags = [reach]
    for i in range(1, len(steps)):
        reach = (
            reach
            & F.col(f"_t{i}").isNotNull()
            & (F.col(f"_t{i}") > F.col(f"_t{i - 1}"))
        )
        flags.append(reach)
    totals = per_user.agg(
        *[F.sum(fl.cast("long")).alias(f"_n{i}") for i, fl in enumerate(flags)]
    )
    rows = F.array(
        *[
            F.struct(F.lit(s).alias("step"), F.col(f"_n{i}").alias("n_users"))
            for i, s in enumerate(steps)
        ]
    )
    return totals.select(F.inline(rows))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    origin: str = "2024-01-01",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: cohort = a user's first active period (period
    index = floor(days-since-origin / period_days)); a (cohort, week)
    row counts the cohort's users active in that period.

    Plan shape: ONE user-keyed shuffle builds (first period, set of
    active periods) per user — collect_set is bounded by the calendar
    (a few hundred periods max), not by event count — then the exploded
    (cohort, period) pairs feed a small aggregate. count(*) there IS
    the distinct-user count because the set already deduplicated
    per-user periods. No join back to the events table."""
    wk = F.floor(
        F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit(origin)))
        / period_days
    ).cast("long")
    per_user = (
        events.select(F.col(user_col).alias("_u"), wk.alias("_wk"))
        .groupBy("_u")
        .agg(F.min("_wk").alias("cohort"), F.collect_set("_wk").alias("_wks"))
    )
    return (
        per_user.select("cohort", F.explode("_wks").alias("period"))
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition counts (the Markov matrix of user
    behaviour): per user, order events by time and count each
    consecutive (prev_type → type) pair.

    One shuffle: the lag window partitions by user, and its output
    aggregates into a (|types|²)-row matrix with map-side combine.
    ``tiebreak_col`` makes equal-timestamp ordering deterministic
    (same policy as sessionize)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"), F.col(type_col).alias("next_type")
    ).filter(F.col("prev_type").isNotNull())
    return pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per-day DAU and rolling n-day distinct actives (WAU), the
    scalable way: dedupe (day, user) once, then EXPLODE each pair into
    the ``window_days`` window-end days it contributes to and count
    distinct users per end day. No per-day user sets ever materialize
    (collect_set per day would hold millions of users in one aggregation
    state at corpus scale), no self-join of days against the fact table
    — two distinct aggregates over (day,user)-sized streams, both with
    partial dedup before their shuffle.

    Only days observed in the data are returned (a window-end day with
    no events of its own still counts look-back actives)."""
    ud = events.select(
        F.to_date(F.col(ts_col)).alias("day"), F.col(user_col).alias("_u")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    covered = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", window_days - 1))
        ).alias("day"),
        "_u",
    )
    wau = covered.groupBy("day").agg(F.count_distinct("_u").alias("wau"))
    # inner join keeps observed days only; broadcast-size (calendar)
    return dau.join(wau, "day").select("day", "dau", "wau")
