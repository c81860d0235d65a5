"""Tumbling rollups and gap-based sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hnormalise_spark.ops import timeseries as T

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # rows: (event_id, user_id, offset_seconds, event_type, value)
    data = [
        (eid, uid, T0 + dt.timedelta(seconds=off), et, float(v))
        for eid, uid, off, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_rollup_buckets_and_moving_window(spark):
    ev = _events(
        spark,
        [
            (0, 1, 0, "click", 10.0),
            (1, 1, 600, "click", 20.0),     # same hour
            (2, 1, 3700, "click", 30.0),    # hour 1
            (3, 1, 7300, "click", 40.0),    # hour 2
            (4, 1, 100, "view", 5.0),
        ],
    )
    out = {
        (r["key"], r["bucket_start"].hour): r
        for r in T.rollup(ev, trailing=2).collect()
    }
    assert out[("click", 0)]["n_events"] == 2
    assert out[("click", 0)]["value_sum"] == 30.0
    assert out[("click", 1)]["moving_sum"] == 60.0   # hours 0+1
    assert out[("click", 2)]["moving_sum"] == 70.0   # hours 1+2 (trailing=2)
    assert out[("view", 0)]["value_avg"] == 5.0


def test_sessionize_breaks_on_gap(spark):
    ev = _events(
        spark,
        [
            (0, 7, 0, "a", 0),
            (1, 7, 100, "a", 0),        # same session (gap 100s)
            (2, 7, 100 + 1801, "a", 0), # breaks (> 1800s)
            (3, 7, 100 + 1801 + 5, "a", 0),
            (4, 8, 50, "a", 0),         # other user: own sequence
        ],
    )
    got = {r["event_id"]: r["session_seq"] for r in T.sessionize(ev).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 1}


def test_sessionize_gap_boundary_is_exclusive(spark):
    # exactly gap_seconds apart stays the SAME session (strict >)
    ev = _events(spark, [(0, 1, 0, "a", 0), (1, 1, 1800, "a", 0)])
    got = {r["event_id"]: r["session_seq"] for r in T.sessionize(ev).collect()}
    assert got == {0: 1, 1: 1}


def test_session_stats_span(spark):
    ev = _events(
        spark,
        [(0, 3, 0, "a", 0), (1, 3, 60, "a", 0), (2, 3, 5000, "a", 0)],
    )
    rows = {r["session_seq"]: r for r in T.session_stats(ev).collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["span_seconds"] == 60
    assert rows[2]["n_events"] == 1 and rows[2]["span_seconds"] == 0


def test_asof_join_inclusive_most_recent(spark):
    # probe: user 1 events at t=10,20,30; user 2 at t=5
    probe = _events(
        spark,
        [(1, 1, 10, "view", 0), (2, 1, 20, "view", 0), (3, 1, 30, "view", 0),
         (4, 2, 5, "view", 0)],
    )
    # build: user 1 purchases at t=10 (equal ts -> inclusive match),
    # t=25; user 2 has none
    build = _events(
        spark, [(100, 1, 10, "purchase", 9.5), (101, 1, 25, "purchase", 2.0)]
    ).select("user_id", "ts", "event_id", "value")
    got = {
        r["event_id"]: (r["event_id_asof"], r["value_asof"])
        for r in T.asof_join(
            probe, build, build_cols=("event_id", "value")
        ).collect()
    }
    assert got[1] == (100, 9.5)   # equal ts matches (inclusive <=)
    assert got[2] == (100, 9.5)   # most recent prior, not any prior
    assert got[3] == (101, 2.0)   # advances past newer build row
    assert got[4] == (None, None) # no build row for the key -> nulls


def test_asof_join_keeps_all_probe_rows_and_columns(spark):
    probe = _events(spark, [(1, 1, 10, "view", 3.0), (2, 3, 9, "err", 4.0)])
    build = _events(spark, [(50, 1, 1, "purchase", 1.0)]).select(
        "user_id", "ts", "event_id", "value"
    )
    out = T.asof_join(probe, build, build_cols=("event_id",))
    assert out.count() == 2
    r = {x["event_id"]: x for x in out.collect()}
    # original probe columns survive untouched
    assert r[1]["event_type"] == "view" and r[1]["value"] == 3.0
    assert r[1]["event_id_asof"] == 50 and r[2]["event_id_asof"] is None
    # matched build timestamp is exposed as ts_asof
    assert r[1]["ts_asof"] is not None and r[2]["ts_asof"] is None


def test_asof_join_ignores_null_ts_build_rows(spark):
    import datetime as dt

    probe = _events(spark, [(1, 1, 0, "view", 0), (2, 1, 7200, "view", 0)])
    build = spark.createDataFrame(
        [(9, 1, None, 5.0), (10, 1, T0 + dt.timedelta(hours=1), 7.0)],
        "event_id long, user_id long, ts timestamp, value double",
    ).select("user_id", "ts", "event_id", "value")
    got = {
        r["event_id"]: r["event_id_asof"]
        for r in T.asof_join(probe, build, build_cols=("event_id",)).collect()
    }
    # the null-ts build row must match NOTHING (ASOF semantics);
    # before the fix it was carried into every early probe row
    assert got == {1: None, 2: 10}


def test_sessionize_ties_straddling_gap_are_deterministic(spark):
    # two events share (user_id, ts) exactly at a session boundary:
    # without a tiebreaker the cumulative sum crosses them in an
    # engine-/run-dependent order. With tiebreak_col the lower
    # event_id is FIRST, so it carries the break and both land in the
    # same (new) session with identical seq on every run/partitioning.
    rows = [
        (0, 1, 0, "a", 0),
        (5, 1, 2000, "a", 0),   # > 1800s gap: new session; tied with #4
        (4, 1, 2000, "a", 0),   # same (user, ts)
        (6, 1, 2010, "a", 0),
    ]
    expected = {0: 1, 4: 2, 5: 2, 6: 2}
    for nparts in (1, 3, 7):
        ev = _events(spark, rows).repartition(nparts)
        got = {
            r["event_id"]: r["session_seq"]
            for r in T.sessionize(ev, tiebreak_col="event_id").collect()
        }
        assert got == expected


def test_asof_join_tied_build_rows_pick_greatest_tiebreak(spark):
    probe = _events(spark, [(1, 1, 20, "view", 0)])
    # two build rows share (user_id, ts=10): the greatest event_id wins
    build = _events(
        spark,
        [(100, 1, 10, "purchase", 1.0), (102, 1, 10, "purchase", 3.0),
         (101, 1, 10, "purchase", 2.0)],
    ).select("user_id", "ts", "event_id", "value")
    for nparts in (1, 4):
        got = T.asof_join(
            probe.repartition(nparts), build.repartition(nparts),
            build_cols=("event_id", "value"), build_tiebreak_col="event_id",
        ).collect()[0]
        assert got["event_id_asof"] == 102 and got["value_asof"] == 3.0


def test_sessionize_null_ts_rows_do_not_corrupt_real_chain(spark):
    ev = spark.createDataFrame(
        [(1, 1, T0, "a", 1.0), (2, 1, None, "a", 1.0),
         (3, 1, T0 + __import__("datetime").timedelta(hours=2), "a", 1.0)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["event_id"]: r["session_seq"] for r in T.sessionize(ev).collect()}
    # null-ts rows take their own session slot; the real events still
    # split on the 2h gap (> 30min) and stay ordered
    assert got[3] == got[1] + 1 and got[2] not in (got[1], got[3])


def test_distinct_profile_exact_and_approx_bound(spark):
    """distinct_profile is exact; approx_count_distinct (the 100-TB
    swap-in) lands within its documented rsd of the exact value, and
    the multi-distinct plan is the single-pass Expand shape."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hnormalise_spark.ops.timeseries import distinct_profile

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i * 7) % 20, i % 24), (i * 13) % 311,
         "a" if i % 3 else "b")
        for i in range(2000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    prof = distinct_profile(ev)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # one pass for both DISTINCTs, not two scans
    exact = {r["event_type"]: r for r in prof.collect()}
    assert exact["a"]["n_events"] + exact["b"]["n_events"] == 2000
    assert exact["a"]["n_users"] <= 311 and exact["a"]["n_days"] <= 20

    approx = {
        r["event_type"]: r["au"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("au"))
        .collect()
    }
    for t, r in exact.items():
        assert abs(approx[t] - r["n_users"]) <= max(3, 0.05 * r["n_users"]), (
            t, approx[t], r["n_users"],
        )


def test_funnel_strict_ordering_semantics(spark):
    """Reaching step i needs EVERY earlier step's first occurrence in
    strictly increasing order: same-timestamp and out-of-order firsts
    don't convert; later re-occurrences don't resurrect a dead funnel."""
    import datetime as dt

    from hnormalise_spark.ops.timeseries import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 converts fully: view@0 click@1 purchase@2
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: click BEFORE first view; later click exists but FIRST
        # click precedes first view -> stuck at view
        (2, t(1), "click"), (2, t(2), "view"), (2, t(3), "purchase"),
        # u3: view and click same timestamp -> not strictly after
        (3, t(0), "view"), (3, t(0), "click"),
        # u4: purchase without click
        (4, t(0), "view"), (4, t(5), "purchase"),
        # u5: never viewed
        (5, t(0), "click"), (5, t(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["step"]: r["n_users"] for r in funnel(ev).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_retention_cohorts_hand_golden(spark):
    import datetime as dt

    from hnormalise_spark.ops.timeseries import retention_cohorts

    d = lambda day: dt.datetime(2024, 1, day, 12)  # noqa: E731
    rows = [
        (1, d(1)), (1, d(2)),            # u1: cohort 0, active wk 0 only
        (2, d(3)), (2, d(10)), (2, d(17)),  # u2: cohort 0, wks 0,1,2
        (3, d(9)), (3, d(20)),           # u3: cohort 1, wks 1,2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort"], r["period"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 1): 1, (1, 2): 1}


def test_transition_matrix_hand_golden(spark):
    import datetime as dt

    from hnormalise_spark.ops.timeseries import transition_matrix

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, 1, t(0), "view"), (2, 1, t(1), "click"), (3, 1, t(2), "view"),
        (4, 2, t(0), "view"), (5, 2, t(1), "view"),
        (6, 3, t(0), "click"),  # single event: no transition
        # user 4: equal timestamps — event_id tiebreak pins the order
        (7, 4, t(0), "view"), (8, 4, t(0), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in transition_matrix(ev).collect()
    }
    assert got == {
        ("view", "click"): 2,
        ("click", "view"): 1,
        ("view", "view"): 1,
    }


def test_active_users_hand_golden(spark):
    """DAU/WAU: rolling 7-day distinct actives via the explode pattern,
    checked by hand — a user active on two days inside one window
    counts once; only observed days come back."""
    import datetime as dt

    from hnormalise_spark.ops.timeseries import active_users

    d = lambda day, u: (u, dt.datetime(2024, 1, day, 9))  # noqa: E731
    rows = [d(1, 1), d(1, 2), d(3, 1), d(9, 1), d(9, 3), d(20, 4)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        str(r["day"]): (r["dau"], r["wau"]) for r in active_users(ev).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),  # u1,u2
        "2024-01-03": (1, 2),  # window 12/28..1/3: u1,u2
        "2024-01-09": (2, 2),  # window 1/3..1/9: u1 (both days count once), u3
        "2024-01-20": (1, 1),
    }
