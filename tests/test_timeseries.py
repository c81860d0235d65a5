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
